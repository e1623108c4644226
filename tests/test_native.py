"""Native C++ data-pipeline kernels == numpy reference paths."""

import numpy as np
import pytest

from senas_tpu.data import native as native_mod
from senas_tpu.data.augment import _curvature_flow


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_mod.available():
        try:
            from senas_tpu.data.native.build import build
            build(verbose=False)
            native_mod._tried = False  # re-probe after building
        except Exception:
            pytest.skip("native extension unavailable (no g++?)")
    if not native_mod.available():
        pytest.skip("native extension failed to load")


def test_curvature_flow_matches_numpy():
    rs = np.random.RandomState(0)
    img = rs.rand(48, 48)
    ref = _curvature_flow(img, 0.125, 5)
    out = native_mod.curvature_flow(img, 0.125, 5)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-12)


def test_curvature_flow_does_not_mutate_input():
    rs = np.random.RandomState(1)
    img = rs.rand(16, 16)
    before = img.copy()
    native_mod.curvature_flow(img, 0.125, 3)
    np.testing.assert_array_equal(img, before)


def test_elastic_remap_identity():
    rs = np.random.RandomState(2)
    img = rs.rand(24, 24).astype(np.float32)
    mask = (rs.rand(24, 24) > 0.5).astype(np.uint8)
    zero = np.zeros((24, 24), np.float32)
    img2, mask2 = native_mod.elastic_remap(img, mask, zero, zero)
    np.testing.assert_allclose(img2, img, atol=1e-6)
    np.testing.assert_array_equal(mask2, mask)


def test_elastic_remap_shift():
    """Integer displacement == numpy roll with zero border."""
    rs = np.random.RandomState(3)
    img = rs.rand(16, 16).astype(np.float32)
    mask = (rs.rand(16, 16) > 0.5).astype(np.uint8)
    dy = np.full((16, 16), 2.0, np.float32)   # sample from y+2
    dx = np.zeros((16, 16), np.float32)
    img2, mask2 = native_mod.elastic_remap(img, mask, dy, dx)
    np.testing.assert_allclose(img2[:-2], img[2:], atol=1e-6)
    assert (img2[-2:] == 0).all()
    np.testing.assert_array_equal(mask2[:-2], mask[2:])
