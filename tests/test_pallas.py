"""Pallas fused NORM-conv kernel == the XLA conv baseline (interpret mode
on CPU; the same kernel compiles on TPU for bench.py --with-pallas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.ops.pallas_kernels import fused_norm_convs, xla_norm_convs


@pytest.mark.parametrize("b,h,w,c,n", [(2, 16, 16, 8, 8), (1, 24, 16, 4, 12)])
def test_fused_norm_convs_matches_xla(b, h, w, c, n):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    k3 = jnp.asarray(rs.randn(3, 3, c, n).astype(np.float32)) * 0.1
    k52 = jnp.asarray(rs.randn(5, 5, c, n).astype(np.float32)) * 0.1
    k53 = jnp.asarray(rs.randn(5, 5, c, n).astype(np.float32)) * 0.1

    ref = xla_norm_convs(x, k3, k52, k53)
    out = fused_norm_convs(x, k3, k52, k53, tile_h=8, interpret=True)
    assert out.shape == (b, h, w, 3 * n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
