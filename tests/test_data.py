"""Data layer: augmentations, loaders, IO formats."""

import os

import numpy as np
import pytest

from senas_tpu.data import DataLoader, get_dataset
from senas_tpu.data import augment as A
from senas_tpu.data.io import MetaImage, read_mhd, read_nifti, write_mhd


class TestAugment:
    def _pair(self, h=32, w=32, seed=0):
        rs = np.random.RandomState(seed)
        img = rs.rand(h, w).astype(np.float32)
        mask = (rs.rand(h, w) > 0.7).astype(np.uint8)
        return img, mask

    def test_flips_preserve_shapes_and_stats(self):
        img, mask = self._pair()
        for aug in [A.RandomHorizontallyFlip(p=1.0), A.RandomVerticallyFlip(p=1.0)]:
            i2, m2 = aug(img, mask)
            assert i2.shape == img.shape and m2.shape == mask.shape
            assert i2.sum() == pytest.approx(img.sum())
            assert m2.sum() == mask.sum()

    def test_translate_shapes(self):
        img, mask = self._pair()
        for _ in range(10):
            i2, m2 = A.RandomTranslate((0.2, 0.1))(img, mask)
            assert i2.shape == img.shape and m2.shape == mask.shape

    def test_elastic_preserves_shape(self):
        img, mask = self._pair()
        i2, m2 = A.RandomElasticTransform(alpha=1.5, sigma=0.07, p=1.0)(img, mask)
        assert i2.shape == img.shape and m2.shape == mask.shape
        assert set(np.unique(m2)).issubset({0, 1})

    def test_random_sized_crop(self):
        img, mask = self._pair(48, 48)
        i2, m2 = A.RandomSizedCrop((32, 32))(img, mask)
        assert i2.shape == (32, 32) and m2.shape == (32, 32)

    def test_center_crop_presize(self):
        img, mask = self._pair(48, 64)
        i2, m2 = A.CenterCrop((32, 32), presize=True)(img, mask)
        assert i2.shape == (32, 32)

    def test_clahe_range(self):
        img, _ = self._pair()
        out = A.equalize_adapthist(img, clip_limit=0.05)
        assert out.min() >= 0 and out.max() <= 1
        assert out.shape == img.shape

    def test_curvature_flow_smooths(self):
        rs = np.random.RandomState(0)
        img = rs.rand(1, 32, 32)
        out = A.smooth_images(img.copy())
        # smoothing must reduce total variation
        def tv(x):
            return np.abs(np.diff(x, axis=-1)).sum() + np.abs(np.diff(x, axis=-2)).sum()
        assert tv(out) < tv(img)
        assert out.shape == img.shape

    def test_registry(self):
        comp = A.get_composed_augmentations({"hflip": 0.5, "gamma": 0.2})
        img, mask = self._pair()
        i2, m2 = comp(img, mask)
        assert i2.shape == img.shape


class TestLoader:
    def test_batching_drop_last(self):
        ds = get_dataset("synthetic", path="", mode="train", size=10, hw=16)
        dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0]["image"].shape == (4, 16, 16, 1)
        assert batches[0]["label"].dtype == np.int32

    def test_subset_indices(self):
        ds = get_dataset("synthetic", path="", mode="train", size=10, hw=16)
        dl = DataLoader(ds, batch_size=5, indices=list(range(5)))
        assert len(dl) == 1

    def test_trailing_partial_batch_kept_exact(self):
        # parity: the reference evaluates the true partial batch (no
        # padding) — see base.py NOTE on trailing batches
        ds = get_dataset("synthetic", path="", mode="train", size=6, hw=16)
        dl = DataLoader(ds, batch_size=4)
        batches = list(dl)
        assert batches[-1]["image"].shape[0] == 2


class TestIO:
    def test_mhd_roundtrip(self, tmp_path):
        arr = (np.random.RandomState(0).rand(4, 8, 6) * 100).astype(np.int16)
        img = MetaImage(array=arr, spacing=(1.5, 1.5, 3.0), origin=(1, 2, 3))
        path = os.path.join(tmp_path, "vol.mhd")
        write_mhd(path, img)
        back = read_mhd(path)
        np.testing.assert_array_equal(back.array, arr)
        assert back.spacing == (1.5, 1.5, 3.0)
        assert back.origin == (1.0, 2.0, 3.0)

    def test_nifti_reader(self, tmp_path):
        # hand-roll a minimal NIfTI-1 file
        import gzip
        import struct
        shape = (5, 4, 3)
        data = np.arange(np.prod(shape), dtype=np.float32).reshape(shape, order="F")
        hdr = bytearray(348)
        struct.pack_into("<i", hdr, 0, 348)
        dim = [3, *shape, 1, 1, 1, 1]
        struct.pack_into("<8h", hdr, 40, *dim)
        struct.pack_into("<h", hdr, 70, 16)  # float32
        struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
        path = os.path.join(tmp_path, "vol.nii.gz")
        with gzip.open(path, "wb") as fp:
            fp.write(bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F"))
        back = read_nifti(path)
        np.testing.assert_array_equal(back, data)


class TestSynthetic:
    def test_learnable_structure(self):
        ds = get_dataset("synthetic", path="", mode="train", size=4, hw=32)
        img, lab = ds[0]
        assert img.shape == (32, 32, 1) and lab.shape == (32, 32)
        # foreground intensity correlates with label
        assert img[lab == 1].mean() > img[lab == 0].mean()


class TestPrefetchLoader:
    def test_yields_same_batches(self):
        from senas_tpu.data import DataLoader, PrefetchLoader, get_dataset
        ds = get_dataset("synthetic", path="", mode="train", size=10, hw=16)
        dl = DataLoader(ds, batch_size=4, shuffle=False)
        direct = [b["image"].sum() for b in dl]
        prefetched = [b["image"].sum() for b in PrefetchLoader(dl)]
        assert direct == prefetched
        assert len(PrefetchLoader(dl)) == len(dl)

    def test_propagates_worker_errors(self):
        import pytest
        from senas_tpu.data import PrefetchLoader

        class Broken:
            def __len__(self):
                return 1

            def __iter__(self):
                raise RuntimeError("boom")
                yield  # pragma: no cover

        with pytest.raises(RuntimeError, match="boom"):
            list(PrefetchLoader(Broken()))
