"""Legacy block library (utils/legacy_blocks.py, port of the reference's
utils/functional.py): shape contracts + the SegNet argmax pool/unpool
round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.utils import legacy_blocks as lb


def _init_apply(mod, *args):
    variables = mod.init({"params": jax.random.PRNGKey(0)}, *args, False)
    return mod.apply(variables, *args, False)


def test_unet_conv2_shrinks_by_4():
    # two UNPADDED 3x3 convs: 32 -> 28 (reference functional.py:177-203)
    out = _init_apply(lb.UnetConv2(8), jnp.ones((1, 32, 32, 3)))
    assert out.shape == (1, 28, 28, 8)


def test_unet_up_concat_and_pad():
    skip = jnp.ones((1, 28, 28, 8))
    low = jnp.ones((1, 14, 14, 8))
    out = _init_apply(lb.UnetUp(8), skip, low)
    assert out.shape == (1, 24, 24, 8)  # 28 up-pads skip, then -4 unpadded


def test_maxpool_argmax_unpool_roundtrip():
    rs = np.random.RandomState(0)
    # strictly positive values so the scatter zeros are never the window max
    x = jnp.asarray(1.0 + np.abs(rs.randn(2, 8, 8, 3)), jnp.float32)
    pooled, idx = lb.max_pool_argmax_2x2(x)
    assert pooled.shape == (2, 4, 4, 3) and idx.shape == (2, 4, 4, 3)
    full = lb.max_unpool_2x2(pooled, idx, (8, 8))
    # unpooled map keeps exactly the max of each window at its argmax slot
    np.testing.assert_allclose(
        np.asarray(lb.max_pool_argmax_2x2(full)[0]), np.asarray(pooled))
    assert float(jnp.sum(full != 0)) == pooled.size


def test_segnet_down_up_roundtrip_shapes():
    x = jnp.ones((1, 16, 16, 3))
    down = lb.SegnetDown(8, n_convs=2)
    v = down.init({"params": jax.random.PRNGKey(0)}, x, False)
    pooled, idx, hw = down.apply(v, x, False)
    assert pooled.shape == (1, 8, 8, 8) and hw == (16, 16)
    up = lb.SegnetUp(3, n_convs=2)
    vu = up.init({"params": jax.random.PRNGKey(1)}, pooled, idx, hw, False)
    out = up.apply(vu, pooled, idx, hw, False)
    assert out.shape == (1, 16, 16, 3)


@pytest.mark.parametrize("cls,kw,in_c,expect_c", [
    (lb.ResidualBlock, dict(filters=8, stride=2), 4, 8),
    (lb.ResidualBottleneck, dict(filters=4, stride=2), 4, 16),
    (lb.LinknetUp, dict(filters=8), 16, 8),
    (lb.RU, dict(filters=4), 4, 4),
])
def test_block_channel_contracts(cls, kw, in_c, expect_c):
    out = _init_apply(cls(**kw), jnp.ones((1, 16, 16, in_c)))
    assert out.shape[-1] == expect_c


def test_frru_two_streams():
    y = jnp.ones((1, 8, 8, 16))   # pooled stream (scale 2)
    z = jnp.ones((1, 16, 16, 32))  # full-res residual stream
    mod = lb.FRRU(filters=16, scale=2)
    v = mod.init({"params": jax.random.PRNGKey(0)}, y, z, False)
    y2, z2 = mod.apply(v, y, z, False)
    assert y2.shape == (1, 8, 8, 16) and z2.shape == z.shape


def test_psp_blocks():
    x = jnp.ones((1, 16, 16, 8))
    out = _init_apply(lb.ResidualBlockPSP(n_blocks=2, mid=4, filters=16,
                                          stride=2), x)
    assert out.shape == (1, 8, 8, 16)
    out = _init_apply(lb.ResidualBlockPSP(n_blocks=2, mid=4, filters=16,
                                          dilation=2), x)
    assert out.shape == (1, 16, 16, 16)


def test_cascade_feature_fusion():
    low = jnp.ones((1, 8, 8, 16))
    high = jnp.ones((1, 16, 16, 12))
    mod = lb.CascadeFeatureFusion(n_classes=3, filters=8)
    v = mod.init({"params": jax.random.PRNGKey(0)}, low, high, False)
    fused, cls = mod.apply(v, low, high, False)
    assert fused.shape == (1, 16, 16, 8) and cls.shape == (1, 16, 16, 3)


def test_interp_helpers():
    x = jnp.ones((1, 33, 33, 2))
    assert lb.get_interp_size(x, z_factor=2) == (65, 65)
    assert lb.interp(x, (65, 65)).shape == (1, 65, 65, 2)
    w = lb.get_upsampling_weight(2, 2, 4)
    assert w.shape == (4, 4, 2, 2)
    # bilinear filter sums to kernel_size^2/4 per diagonal channel
    np.testing.assert_allclose(float(jnp.sum(w[:, :, 0, 0])), 4.0, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(w[:, :, 0, 1])), 0.0, atol=1e-7)
