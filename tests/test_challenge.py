"""Challenge subsystem: PROMISE12 volumetric metrics + submission stitching,
nerve RLE round-trips, incoherent-image filter."""

import os

import numpy as np
import pytest

from senas_tpu.challenge import (hard_dice, numpy_dice, predict_test,
                                 rel_abs_vol_diff, rle_encoding,
                                 surface_distances, volumetric_metrics,
                                 write_rle_submission)
from senas_tpu.challenge.nerve import filter_incoherent_images, rle_decoding
from senas_tpu.challenge.promise12 import resize_slices_nearest
from senas_tpu.data.io import MetaImage, write_mhd


def _sphere(shape, center, r):
    zz, yy, xx = np.ogrid[:shape[0], :shape[1], :shape[2]]
    return (((zz - center[0]) ** 2 + (yy - center[1]) ** 2
             + (xx - center[2]) ** 2) <= r * r).astype(np.int16)


def test_numpy_dice_identical_and_disjoint():
    a = np.zeros((4, 8, 8)); a[1:3, 2:6, 2:6] = 1
    assert numpy_dice(a, a) == pytest.approx(1.0, abs=1e-3)
    b = np.zeros_like(a); b[0, 0, 0] = 1
    assert numpy_dice(a, b) < 0.1


def test_ravd():
    a = np.ones((2, 4, 4))
    b = np.ones((2, 4, 4)); b[0] = 0
    assert rel_abs_vol_diff(a, b) == pytest.approx(50.0)


def test_surface_distance_identical_bounded_by_radius():
    # The reference's surf_b uses logical_or, not xor (metrics.py:160), so
    # "surface" distances for b include its whole foreground: for identical
    # spheres the max is ~the radius (interior voxel -> boundary), not 0.
    r = 5
    v = _sphere((16, 16, 16), (8, 8, 8), r)
    sd = surface_distances(v, v)
    assert 0 < sd.max() <= r
    # the true-boundary direction (distances from a's surface to b) is 0
    assert sd.min() == 0.0


def test_surface_distance_grows_with_offset():
    a = _sphere((24, 24, 24), (12, 12, 12), 5)
    b = _sphere((24, 24, 24), (12, 12, 16), 5)
    sd_near = surface_distances(a, a)
    sd_far = surface_distances(a, b)
    # max() is dominated by the interior term of the reference's asymmetric
    # surf_b (see promise12.py docstring); the MEAN distance must grow
    assert sd_far.mean() > sd_near.mean()


def test_volumetric_metrics_on_written_cases(tmp_path):
    folder = str(tmp_path)
    rng = np.random.RandomState(0)
    all_slices = []
    for case in range(2):
        vol = _sphere((6, 32, 32), (3, 16, 16), 6 + case)
        write_mhd(os.path.join(folder, f"Case{case:02d}_segmentation.mhd"),
                  MetaImage(array=vol.astype(np.uint8), spacing=(1.0, 1.0, 2.0)))
        # predictions: the truth with a little noise, at half resolution
        for sl in vol:
            noisy = sl[::2, ::2].copy()
            flips = rng.rand(*noisy.shape) < 0.02
            noisy[flips] = 1 - noisy[flips]
            all_slices.append(noisy)
    stats = volumetric_metrics(all_slices, folder)
    assert stats["n_cases"] == 2
    assert stats["mean_volumetric_dsc"] > 0.7
    assert stats["mean_rel_abs_vol_diff"] < 50
    assert np.isfinite(stats["mean_hausdorff"])


def test_predict_test_stitches_volumes(tmp_path):
    src = tmp_path / "cases"; dst = tmp_path / "pred"
    src.mkdir()
    vol = _sphere((5, 20, 20), (2, 10, 10), 4)
    case_path = str(src / "Case00.mhd")
    write_mhd(case_path, MetaImage(array=vol.astype(np.int16),
                                   spacing=(0.5, 0.5, 3.0), origin=(1, 2, 3)))
    written = predict_test([s for s in vol.astype(np.uint8)], [case_path],
                           dest=str(dst))
    assert len(written) == 1
    from senas_tpu.data.io import read_mhd
    out = read_mhd(written[0])
    assert out.array.shape == vol.shape
    assert out.spacing == (0.5, 0.5, 3.0)
    assert out.origin == (1.0, 2.0, 3.0)
    np.testing.assert_array_equal(out.array > 0, vol > 0)


def test_resize_slices_nearest_roundtrip():
    masks = np.zeros((3, 8, 8), int); masks[:, 2:6, 2:6] = 1
    up = resize_slices_nearest(masks, (3, 16, 16))
    assert up.shape == (3, 16, 16)
    back = resize_slices_nearest(up, (3, 8, 8))
    np.testing.assert_array_equal(back, masks)


# ---------------------------------------------------------------------------
# nerve RLE
# ---------------------------------------------------------------------------

def test_rle_roundtrip():
    rs = np.random.RandomState(0)
    mask = (rs.rand(16, 12) > 0.6).astype(np.uint8)
    rle = rle_encoding(mask)
    np.testing.assert_array_equal(rle_decoding(rle, mask.shape), mask)


def test_rle_small_masks_empty():
    m = np.zeros((10, 10), np.uint8)
    m[0, :4] = 1  # 4 pixels < 5 -> empty by the challenge convention
    assert rle_encoding(m) == ""


def test_rle_column_major_indexing():
    m = np.zeros((3, 3), np.uint8)
    m[0, 0] = 1  # first pixel in column-major order -> "1 1"
    m[2, 2] = 1  # last pixel -> "9 1"
    assert rle_encoding(m, min_pixels=1) == "1 1 9 1"


def test_write_rle_submission(tmp_path):
    rs = np.random.RandomState(1)
    masks = [(rs.rand(8, 8) > 0.5).astype(np.uint8) for _ in range(3)]
    path = write_rle_submission(masks, str(tmp_path / "submission.csv"))
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "img,pixels"
    assert len(lines) == 4


def test_hard_dice_empty_rule():
    z = np.zeros((4, 4), int)
    assert hard_dice(z, z) == 1.0
    o = np.ones((4, 4), int)
    assert hard_dice(o, o) == 1.0
    assert hard_dice(o, z) == 0.0


def test_filter_incoherent_images():
    rs = np.random.RandomState(2)
    base = rs.rand(64, 64).astype(np.float32)
    imgs = [base, base + 1e-4, rs.rand(64, 64).astype(np.float32)]
    m_pos = np.zeros((64, 64), np.uint8); m_pos[10:20, 10:20] = 1
    m_empty = np.zeros((64, 64), np.uint8)
    keep, pairs = filter_incoherent_images(imgs, [m_pos, m_empty, m_pos])
    assert (0, 1) in pairs          # near-duplicates with contradictory masks
    assert 1 not in keep            # the empty-mask twin is dropped
    assert 0 in keep and 2 in keep
