"""Primitive ops: shape and numerics checks (cross-checked vs torch CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from senas_tpu.core.genotype import DownOps, NormOps, UpOps
from senas_tpu.ops import primitives as P


def _init_apply(mod, x, train=False, rngs=None):
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    variables = mod.init(rngs, x, train)
    out = mod.apply(variables, x, train,
                    mutable=["batch_stats"] if "batch_stats" in variables else False)
    if isinstance(out, tuple):
        out = out[0]
    return out, variables


class TestFunctionalPrimitives:
    def test_avg_pool_count_include_pad_false(self):
        import torch
        import torch.nn.functional as F
        x = np.random.RandomState(0).rand(2, 9, 9, 3).astype(np.float32)
        ours = np.asarray(P.avg_pool_3x3(jnp.asarray(x), stride=2))
        theirs = F.avg_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 3, stride=2,
                              padding=1, count_include_pad=False)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_max_pool(self):
        import torch
        import torch.nn.functional as F
        x = np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32)
        ours = np.asarray(P.max_pool_3x3(jnp.asarray(x), stride=2))
        theirs = F.max_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 3, stride=2, padding=1)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_upsample_bilinear_matches_torch(self):
        import torch
        import torch.nn.functional as F
        x = np.random.RandomState(2).rand(1, 6, 6, 2).astype(np.float32)
        ours = np.asarray(P.upsample2x(jnp.asarray(x)))
        theirs = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2,
                               mode="bilinear", align_corners=False)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("k,d", [(3, 1), (5, 2), (5, 3)])
    def test_conv_shapes_stride1_and_2(self, k, d):
        x = jnp.zeros((2, 16, 16, 4))
        w = jnp.zeros((k, k, 4, 8))
        assert P.conv2d(x, w, stride=1, dilation=d).shape == (2, 16, 16, 8)
        assert P.conv2d(x, w, stride=2, dilation=d).shape == (2, 8, 8, 8)

    @pytest.mark.parametrize("k,d", [(3, 1), (5, 2), (5, 3)])
    def test_conv_transpose_doubles(self, k, d):
        """UP ops must exactly double spatial dims (torch output_padding=1)."""
        x = jnp.zeros((2, 8, 8, 4))
        w = jnp.zeros((k, k, 4, 8))
        out = P.conv_transpose2d(x, w, stride=2, dilation=d, output_padding=1)
        assert out.shape == (2, 16, 16, 8)

    def test_conv_matches_torch_numerics(self):
        import torch
        import torch.nn.functional as F
        rs = np.random.RandomState(3)
        x = rs.rand(2, 10, 10, 3).astype(np.float32)
        w = rs.rand(5, 5, 3, 7).astype(np.float32)
        ours = np.asarray(P.conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, dilation=2))
        tw = torch.tensor(w).permute(3, 2, 0, 1)  # HWIO -> OIHW
        theirs = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2), tw, stride=2,
                          padding=4, dilation=2)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        # fp32 accumulation order differs between XLA and torch; 5e-3 rel
        np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=1e-3)

    def test_channel_shuffle(self):
        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
        out = P.channel_shuffle(x, 2)
        np.testing.assert_array_equal(
            np.asarray(out).ravel(), [0, 4, 1, 5, 2, 6, 3, 7])


class TestCandidateOps:
    """Every candidate op in the three op sets: correct output shape."""

    @pytest.mark.parametrize("name", DownOps)
    def test_down_ops_halve(self, name):
        x = jnp.ones((2, 16, 16, 6))
        mod = P.make_op(name, 6, 4, P.OpType.DOWN)
        out, _ = _init_apply(mod, x, train=False)
        assert out.shape == (2, 8, 8, 4), name

    @pytest.mark.parametrize("name", UpOps)
    def test_up_ops_double(self, name):
        x = jnp.ones((2, 8, 8, 6))
        mod = P.make_op(name, 6, 4, P.OpType.UP)
        out, _ = _init_apply(mod, x, train=False)
        assert out.shape == (2, 16, 16, 4), name

    @pytest.mark.parametrize("name", NormOps)
    def test_norm_ops_keep(self, name):
        x = jnp.ones((2, 8, 8, 6))
        mod = P.make_op(name, 6, 4, P.OpType.NORM)
        out, _ = _init_apply(mod, x, train=False)
        assert out.shape == (2, 8, 8, 4), name

    def test_none_op_is_zero_pre_norm(self):
        """'none' zeroes the signal; after BN (eval, zero-init stats) stays 0."""
        x = jnp.ones((2, 8, 8, 4))
        mod = P.make_op("none", 4, 4, P.OpType.NORM)
        out, _ = _init_apply(mod, x, train=False)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_identity_op_passthrough_shape(self):
        x = jnp.ones((2, 8, 8, 4))
        mod = P.make_op("identity", 4, 4, P.OpType.NORM)
        out, _ = _init_apply(mod, x, train=False)
        assert out.shape == x.shape


class TestBlocks:
    def test_basic_block_residual(self):
        x = jnp.ones((2, 8, 8, 16))
        mod = P.BasicBlock(planes=16)
        out, _ = _init_apply(mod, x)
        assert out.shape == x.shape

    def test_se_block(self):
        x = jnp.ones((2, 8, 8, 32))
        mod = P.SEBlock()
        variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
        out = mod.apply(variables, x)
        assert out.shape == x.shape
        # mid features = 32//16 = 2
        assert variables["params"]["Dense_0"]["kernel"].shape == (32, 2)

    def test_rectify_resample_paths(self):
        # conv-free paths (c_in == c_out)
        for ct, hw in [("down", 8), ("up", 32)]:
            mod = P.RectifyResample(16, ct)
            out, _ = _init_apply(mod, jnp.ones((2, 16, 16, 16)))
            assert out.shape == (2, hw, hw, 16), ct
        # conv paths (c_in != c_out)
        for ct, hw in [("down", 8), ("up", 32)]:
            mod = P.RectifyResample(24, ct)
            out, variables = _init_apply(mod, jnp.ones((2, 16, 16, 16)))
            assert out.shape == (2, hw, hw, 24), ct
            assert "kernel" in variables["params"]


class TestTorchTransposeParity:
    def test_conv_transpose_matches_torch(self):
        """ConvTranspose2d parity: torch computes the true transpose
        (correlation with the spatially-flipped kernel, in/out swapped), so
        w_ours[h, w, i, o] = w_torch[i, o, kH-1-h, kW-1-w]."""
        import torch
        import torch.nn.functional as F
        rs = np.random.RandomState(0)
        for k, d in [(3, 1), (5, 2)]:
            x = rs.randn(2, 6, 6, 3).astype(np.float32)
            wt = rs.randn(3, 4, k, k).astype(np.float32)  # (in, out, kH, kW)
            pad = (k // 2) * d
            theirs = F.conv_transpose2d(
                torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(wt),
                stride=2, padding=pad, output_padding=1, dilation=d
            ).permute(0, 2, 3, 1).numpy()
            w_ours = np.flip(wt, axis=(2, 3)).transpose(2, 3, 0, 1)
            ours = P.conv_transpose2d(jnp.asarray(x),
                                      jnp.asarray(w_ours.copy()),
                                      stride=2, dilation=d, output_padding=1)
            np.testing.assert_allclose(np.asarray(ours), theirs,
                                       rtol=1e-4, atol=1e-4)


class TestBatchNormTorchParity:
    def test_running_stats_match_torch_unbiased(self):
        """Our BatchNorm follows torch exactly: biased batch stats for
        normalization, UNBIASED variance for the running update (flax's
        stock BatchNorm uses the biased estimate there)."""
        import torch
        rs = np.random.RandomState(0)
        x = rs.randn(4, 8, 8, 3).astype(np.float32) * 2 + 1
        tbn = torch.nn.BatchNorm2d(3, momentum=0.1, eps=1e-5)
        tbn.train()
        with torch.no_grad():
            for _ in range(3):
                ty = tbn(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        ty = np.transpose(ty.numpy(), (0, 2, 3, 1))

        bn = P.build_norm()
        v = bn.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                    use_running_average=False)
        for _ in range(3):
            fy, mut = bn.apply(v, jnp.asarray(x), use_running_average=False,
                               mutable=["batch_stats"])
            v = {"params": v["params"], "batch_stats": mut["batch_stats"]}
        np.testing.assert_allclose(np.asarray(fy), ty, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v["batch_stats"]["var"]),
                                   tbn.running_var.numpy(), rtol=1e-6)
        tbn.eval()
        with torch.no_grad():
            te = np.transpose(
                tbn(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy(),
                (0, 2, 3, 1))
        fe = bn.apply(v, jnp.asarray(x), use_running_average=True)
        np.testing.assert_allclose(np.asarray(fe), te, atol=2e-5)


class TestDenseDepthwise:
    """The block-diagonal dense rewrite of full-depthwise convs
    (primitives.DENSE_DEPTHWISE_MAX_CHANNELS) must be numerically identical
    to the grouped formulation — the off-block weights are exact zeros."""

    def _grouped(self, fn, x, w, groups, **kw):
        from senas_tpu.ops import primitives
        old = primitives.DENSE_DEPTHWISE_MAX_CHANNELS
        primitives.DENSE_DEPTHWISE_MAX_CHANNELS = 0  # force grouped path
        try:
            return fn(x, w, groups=groups, **kw)
        finally:
            primitives.DENSE_DEPTHWISE_MAX_CHANNELS = old

    @pytest.mark.parametrize("mult", [1, 3])
    @pytest.mark.parametrize("stride", [1, 2])
    def test_conv2d_depthwise_dense_equals_grouped(self, mult, stride):
        from senas_tpu.ops.primitives import conv2d
        rs = np.random.RandomState(0)
        c = 8
        x = jnp.asarray(rs.randn(2, 16, 16, c), jnp.float32)
        w = jnp.asarray(0.1 * rs.randn(3, 3, 1, c * mult), jnp.float32)
        dense = conv2d(x, w, stride=stride, groups=c)
        grouped = self._grouped(conv2d, x, w, c, stride=stride)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(grouped),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("mult", [1, 2])
    def test_conv_transpose2d_depthwise_dense_equals_grouped(self, mult):
        from senas_tpu.ops.primitives import conv_transpose2d
        rs = np.random.RandomState(1)
        c = 8
        x = jnp.asarray(rs.randn(2, 8, 8, c), jnp.float32)
        w = jnp.asarray(0.1 * rs.randn(3, 3, 1, c * mult), jnp.float32)
        dense = conv_transpose2d(x, w, stride=2, output_padding=1, groups=c)
        grouped = self._grouped(conv_transpose2d, x, w, c, stride=2,
                                output_padding=1)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(grouped),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_match(self):
        import jax
        from senas_tpu.ops import primitives
        from senas_tpu.ops.primitives import conv2d
        rs = np.random.RandomState(2)
        c, mult = 8, 3
        x = jnp.asarray(rs.randn(2, 12, 12, c), jnp.float32)
        w = jnp.asarray(0.1 * rs.randn(5, 5, 1, c * mult), jnp.float32)

        def loss_dense(w):
            return jnp.sum(conv2d(x, w, groups=c) ** 2)

        def loss_grouped(w):
            return jnp.sum(self._grouped(conv2d, x, w, c) ** 2)

        gd = jax.grad(loss_dense)(w)
        gg = jax.grad(loss_grouped)(w)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gg),
                                   rtol=1e-4, atol=1e-5)

    def test_large_channel_count_stays_grouped(self):
        # mobilenet-style 1152-channel depthwise must NOT densify (the
        # FLOP inflation would be ~1000x); just check it still runs.
        from senas_tpu.ops.primitives import conv2d
        rs = np.random.RandomState(3)
        c = 128  # > DENSE_DEPTHWISE_MAX_CHANNELS default of 64
        x = jnp.asarray(rs.randn(1, 4, 4, c), jnp.float32)
        w = jnp.asarray(rs.randn(3, 3, 1, c), jnp.float32)
        assert conv2d(x, w, groups=c).shape == (1, 4, 4, c)
