"""Generic PNG/TIFF-pair segmentation loaders: ultrasound-nerve, bladder,
CamVid, plus the CHAOS DICOM loader (gated).

Reference counterparts: utils/datasets/ultrasound_nerve.py (Kaggle nerve,
*_mask.tif pairs), bladder.py, camvid.py, chaos.py. CHAOS reads DICOM CT
series; DICOM parsing is provided by senas_tpu.data.dicom (native minimal
reader) when the data is present.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from senas_tpu.data import augment as A
from senas_tpu.data.base import SegmentationDataset, SPECS, register_dataset


class _PairDataset(SegmentationDataset):
    """Shared crop/aug/normalize template (heart.py:63-92 pattern)."""

    def __init__(self, spec_name: str, mode: str,
                 pairs: List[Tuple[str, Optional[str]]],
                 translate=(0.2, 0.1), convert: str = "L", label_remap_255=True):
        self.spec = SPECS[spec_name]
        self.mode = mode
        self.data_info = pairs
        self.label_remap_255 = label_remap_255
        self.convert = convert
        h, w = self.spec.crop_size
        self.random_crop = A.RandomSizedCrop((w, h), presize=self.spec.presize)
        self.center_crop = A.CenterCrop((w, h), presize=self.spec.presize)
        self.joint_transform = A.Compose([
            A.RandomTranslate(offset=translate),
            A.RandomVerticallyFlip(),
            A.RandomHorizontallyFlip(),
            A.RandomElasticTransform(alpha=1.5, sigma=0.07),
        ])

    def __len__(self):
        return len(self.data_info)

    def __getitem__(self, index):
        img_path, mask_path = self.data_info[index]
        img = np.asarray(Image.open(img_path).convert(self.convert), np.float32)
        if mask_path is not None:
            lab = np.asarray(Image.open(mask_path).convert("L"), np.uint8)
        else:
            lab = np.zeros(img.shape[:2], np.uint8)
        if self.mode == "train":
            img, lab = self.random_crop(img, lab)
            img, lab = self.joint_transform(img, lab)
        else:
            img, lab = self.center_crop(img, lab)
        img = img / 255.0
        if self.spec.mean is not None:
            mean = np.asarray(self.spec.mean, np.float32)
            std = np.asarray(self.spec.std, np.float32)
            img = (img - mean) / std if img.ndim == 3 else (img - mean[0]) / std[0]
        lab = lab.astype(np.int32)
        if self.label_remap_255:
            lab[lab == 255] = 1
        if img.ndim == 2:
            img = img[..., None]
        return img.astype(np.float32), lab


class UltraNerve(_PairDataset):
    """Kaggle ultrasound-nerve: <i>.tif + <i>_mask.tif pairs under
    data_clean/ (train/val) or test/ (ultrasound_nerve.py:29-60)."""

    def __init__(self, root, split="train", mode="train"):
        base = os.path.join(os.path.expanduser(root), "ultrasound-nerve")
        sub = "data_clean" if mode in ("train", "val") else "test"
        folder = os.path.join(base, sub)
        pairs = []
        if os.path.isdir(folder):
            for f in sorted(os.listdir(folder)):
                if f.endswith(".tif") and "_mask" not in f:
                    mask = os.path.join(folder, f.replace(".tif", "_mask.tif"))
                    pairs.append((os.path.join(folder, f),
                                  mask if os.path.exists(mask) else None))
        if not pairs:
            raise RuntimeError(f"Found 0 images under {folder}")
        super().__init__("ultrasound_nerve", mode, pairs, translate=(0.2, 0.2))


class Bladder(_PairDataset):
    """bladder/{Images,Labels} PNG pairs (bladder.py:19-60); 3 classes with
    labels stored as 0/128/255 -> 0/1/2."""

    def __init__(self, root, split="train", mode="train"):
        base = os.path.join(os.path.expanduser(root), "bladder")
        img_dir = os.path.join(base, "Images")
        lab_dir = os.path.join(base, "Labels")
        pairs = []
        if os.path.isdir(img_dir):
            for f in sorted(os.listdir(img_dir)):
                pairs.append((os.path.join(img_dir, f), os.path.join(lab_dir, f)))
        if not pairs:
            raise RuntimeError(f"Found 0 images under {base}")
        super().__init__("bladder", mode, pairs, label_remap_255=False)

    def __getitem__(self, index):
        img, lab = super().__getitem__(index)
        lab = np.where(lab >= 255, 2, np.where(lab >= 128, 1, 0)).astype(np.int32)
        return img, lab


class CamVid(_PairDataset):
    """CamVid street scenes, 12 classes, RGB (camvid.py:68-120)."""

    def __init__(self, root, split="train", mode="train"):
        base = os.path.join(os.path.expanduser(root), "CamVid")
        sub = {"train": "train", "val": "val", "test": "test"}.get(mode, "train")
        img_dir = os.path.join(base, sub)
        lab_dir = os.path.join(base, sub + "annot")
        pairs = []
        if os.path.isdir(img_dir):
            for f in sorted(os.listdir(img_dir)):
                pairs.append((os.path.join(img_dir, f), os.path.join(lab_dir, f)))
        if not pairs:
            raise RuntimeError(f"Found 0 images under {base}")
        super().__init__("camvid", mode, pairs, convert="RGB", label_remap_255=False)


class CHAOS(_PairDataset):
    """CHAOS CT liver: DICOM slices + Ground/*.png masks (chaos.py:85-191).

    HU rescale (slope/intercept, clamp > 4000) then min-max to [0,1]; labels
    255 -> 1. Uses senas_tpu.data.dicom's minimal DICOM reader.
    """

    def __init__(self, root, split="train", mode="train"):
        from senas_tpu.data.dicom import read_dicom_pixels
        self._read_dicom = read_dicom_pixels
        base = os.path.join(os.path.expanduser(root), SPECS["chaos"].base_dir)
        pairs = []
        if os.path.isdir(base):
            for case in sorted(os.listdir(base)):
                dicom_dir = os.path.join(base, case, "DICOM_anon")
                ground_dir = os.path.join(base, case, "Ground")
                if not os.path.isdir(dicom_dir):
                    continue
                for f in sorted(os.listdir(dicom_dir)):
                    if not f.lower().endswith((".dcm", ".ima")):
                        continue
                    mask = os.path.join(
                        ground_dir, "liver_GT_" + f.split(",")[0].split(".")[0][-3:] + ".png")
                    pairs.append((os.path.join(dicom_dir, f),
                                  mask if os.path.exists(mask) else None))
        if not pairs:
            raise RuntimeError(f"Found 0 DICOM slices under {base}")
        super().__init__("chaos", mode, pairs)

    def __getitem__(self, index):
        img_path, mask_path = self.data_info[index]
        arr, slope, intercept = self._read_dicom(img_path)
        arr = arr.astype(np.float32) * slope + intercept
        arr[arr > 4000] = 4000
        lo, hi = arr.min(), arr.max()
        img = (arr - lo) / (hi - lo if hi > lo else 1.0) * 255.0
        if mask_path is not None:
            lab = np.asarray(Image.open(mask_path).convert("L"), np.uint8)
        else:
            lab = np.zeros(img.shape, np.uint8)
        if self.mode == "train":
            img, lab = self.random_crop(img, lab)
            img, lab = self.joint_transform(img, lab)
        else:
            img, lab = self.center_crop(img, lab)
        img = img / 255.0
        img = (img - self.spec.mean[0]) / self.spec.std[0]
        lab = lab.astype(np.int32)
        lab[lab == 255] = 1
        return img[..., None].astype(np.float32), lab


register_dataset("ultrasound_nerve")(lambda root, split="train", mode="train", **kw:
                                     UltraNerve(root, split, mode))
register_dataset("bladder")(lambda root, split="train", mode="train", **kw:
                            Bladder(root, split, mode))
register_dataset("camvid")(lambda root, split="train", mode="train", **kw:
                           CamVid(root, split, mode))
register_dataset("chaos")(lambda root, split="train", mode="train", **kw:
                          CHAOS(root, split, mode))
