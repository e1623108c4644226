"""PROMISE12 prostate MR dataset.

Pipeline parity with /root/reference/utils/datasets/promise12.py:
  * one-time preprocessing of TrainingData/*.mhd volumes into per-slice .npy
    caches at npy_image_<crop>: per-slice CLAHE (clip 0.05) + nearest resize
    to crop², fixed val cases [5,15,25,35,45], curvature-flow smoothing,
    global train-set mu/sigma normalization reused for val/test
    (promise12.py:250-319);
  * train-time joint augmentation: RandomTranslate(0.2,0.1) + VFlip + HFlip +
    Elastic(alpha=1.5, sigma=0.07) (promise12.py:361-366).

MHD volumes are read with the framework's own MetaImage reader (data/io.py)
— no SimpleITK dependency.
"""

from __future__ import annotations

import os
from typing import List

import cv2
import numpy as np

from senas_tpu.data import augment as A
from senas_tpu.data.base import SegmentationDataset, SPECS, register_dataset
from senas_tpu.data.io import read_mhd


def _img_resize(imgs: np.ndarray, rows: int, cols: int, equalize: bool) -> np.ndarray:
    out = np.zeros((len(imgs), rows, cols))
    for i, img in enumerate(imgs):
        if equalize:
            img = A.equalize_adapthist(img, clip_limit=0.05)
        out[i] = cv2.resize(img, (cols, rows), interpolation=cv2.INTER_NEAREST)
    return out


def build_cache(base_path: str, store_path: str, rows: int, cols: int):
    """Volume -> slice .npy cache (promise12.py data_to_array semantics)."""
    os.makedirs(store_path, exist_ok=True)
    train_dir = os.path.join(base_path, "TrainingData")
    file_list = sorted(x for x in os.listdir(train_dir) if x.endswith(".mhd"))

    val_list = [5, 15, 25, 35, 45]
    train_list = sorted(set(range(50)) - set(val_list))

    mu = sigma = None
    for count, case_list in enumerate([train_list, val_list]):
        images, masks = [], []
        wanted = [f for f in file_list
                  if any(str(c).zfill(2) in f for c in case_list)]
        for filename in wanted:
            vol = read_mhd(os.path.join(train_dir, filename)).array
            if "segm" in filename.lower():
                masks.append(_img_resize(vol, rows, cols, equalize=False))
            else:
                images.append(_img_resize(vol, rows, cols, equalize=True))
        images = np.concatenate(images, 0).reshape(-1, rows, cols)
        masks = np.concatenate(masks, 0).reshape(-1, rows, cols).astype(np.uint8)
        images = A.smooth_images(images).astype(np.float32)
        if count == 0:
            mu, sigma = float(np.mean(images)), float(np.std(images))
            images = (images - mu) / sigma
            np.save(os.path.join(store_path, "X_train.npy"), images)
            np.save(os.path.join(store_path, "y_train.npy"), masks)
        else:
            images = (images - mu) / sigma
            np.save(os.path.join(store_path, "X_val.npy"), images)
            np.save(os.path.join(store_path, "y_val.npy"), masks)

    test_dir = os.path.join(base_path, "TestData")
    if os.path.isdir(test_dir):
        file_list = sorted(x for x in os.listdir(test_dir) if x.endswith(".mhd"))
        images, n_imgs = [], []
        for filename in file_list:
            vol = read_mhd(os.path.join(test_dir, filename)).array
            imgs = _img_resize(vol, rows, cols, equalize=True)
            images.append(imgs)
            n_imgs.append(len(imgs))
        if images:
            images = np.concatenate(images, 0).reshape(-1, rows, cols)
            images = A.smooth_images(images).astype(np.float32)
            images = (images - mu) / sigma
            np.save(os.path.join(store_path, "X_test.npy"), images)
            np.save(os.path.join(store_path, "test_n_imgs.npy"), np.array(n_imgs))


class Promise12(SegmentationDataset):
    def __init__(self, root: str, split: str = "train", mode: str = "train"):
        self.spec = SPECS["promise12"]
        self.mode = mode
        rows, cols = self.spec.crop_size
        base = os.path.join(root, self.spec.base_dir)
        store = os.path.join(base, f"npy_image_{rows}")
        if not os.path.exists(store):
            build_cache(base, store, rows, cols)

        tag = {"train": "train", "val": "val", "test": "test"}[mode]
        self.X = np.load(os.path.join(store, f"X_{tag}.npy"))
        if mode != "test":
            self.y = np.load(os.path.join(store, f"y_{tag}.npy"))
        else:
            self.y = np.zeros_like(self.X, dtype=np.uint8)
            self.n_imgs = np.load(os.path.join(store, "test_n_imgs.npy"))
            test_dir = os.path.join(base, "TestData")
            self.test_file_list = sorted(
                os.path.join(test_dir, x) for x in os.listdir(test_dir)
                if x.endswith(".mhd"))

        self.joint_transform = A.Compose([
            A.RandomTranslate(offset=(0.2, 0.1)),
            A.RandomVerticallyFlip(),
            A.RandomHorizontallyFlip(),
            A.RandomElasticTransform(alpha=1.5, sigma=0.07),
        ]) if mode == "train" else None

    def __len__(self):
        return len(self.X)

    def __getitem__(self, index):
        img = self.X[index].astype(np.float32)
        lab = self.y[index].astype(np.int32)
        if self.joint_transform is not None:
            img, lab = self.joint_transform(img, lab.astype(np.uint8))
            lab = lab.astype(np.int32)
        return img[..., None], lab


@register_dataset("promise12")
def _make(root, split="train", mode="train", **kw):
    return Promise12(root=root, split=split, mode=mode)
