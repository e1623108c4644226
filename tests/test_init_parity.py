"""Differential init parity vs the reference's weights_init.

The reference applies utils/utils.py:240-251 to every model it trains
(experiments/train_model.py:131-133, search/senas_search.py:126-127):

  * nn.Conv2d / nn.ConvTranspose2d -> kaiming_normal_(fan_out, relu)
  * nn.Linear                      -> xavier_normal_, bias 0
  * nn.BatchNorm2d                 -> weight 1, bias 0

Conv biases are NOT re-inited, so they keep torch's default
U(+-1/sqrt(fan_in)).  These tests draw torch's actual initializers on the
matching torch weight layouts and compare standard deviations (and bounds,
for the uniform bias) against our flax params — catching both mode mixups
(fan_in vs fan_out) and the fused-layout fan traps ([E, ...] stacks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from senas_tpu.ops import primitives as P
from senas_tpu.ops.primitives import OpType


def torch_std(make_weight, init, n=6):
    """Empirical per-element std of a torch init over n draws."""
    vals = []
    for s in range(n):
        torch.manual_seed(s)
        w = make_weight()
        init(w)
        vals.append(w.detach().numpy().ravel())
    return float(np.concatenate(vals).std())


def kaiming_out(w):
    torch.nn.init.kaiming_normal_(w, mode="fan_out", nonlinearity="relu")


def assert_std_matches(param, expected_std, rel=0.12, msg=""):
    got = float(jnp.std(param))
    assert got == pytest.approx(expected_std, rel=rel), (
        f"{msg}: std {got:.5f} != torch {expected_std:.5f}")


class TestPrimitiveInits:
    def test_conv_weight_matches_torch_conv2d(self):
        # torch Conv2d(24, 40, 3): weight [40, 24, 3, 3], fan_out = 40*9
        ref = torch_std(lambda: torch.empty(40, 24, 3, 3), kaiming_out)
        m = P._ConvWeight(c_out=40, kernel_size=3)
        w = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 24)))[
            "params"]["kernel"]
        assert w.shape == (3, 3, 24, 40)
        assert_std_matches(w, ref, msg="conv kernel")

    def test_conv_weight_transpose_matches_torch(self):
        # torch ConvTranspose2d(24, 40, 3): weight [24, 40, 3, 3],
        # fan_out = size(0)*9 = 24*9  (the layout quirk under test)
        ref = torch_std(lambda: torch.empty(24, 40, 3, 3), kaiming_out)
        m = P._ConvWeight(c_out=40, kernel_size=3, transpose=True,
                          stride=2, output_padding=1)
        w = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 24)))[
            "params"]["kernel"]
        assert_std_matches(w, ref, msg="transpose conv kernel")

    def test_depthwise_conv_matches_torch(self):
        # torch Conv2d(48, 48, 3, groups=48): weight [48, 1, 3, 3],
        # fan_out = 48*9
        ref = torch_std(lambda: torch.empty(48, 1, 3, 3), kaiming_out)
        m = P._ConvWeight(c_out=48, kernel_size=3, groups=48)
        w = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 48)))[
            "params"]["kernel"]
        assert w.shape == (3, 3, 1, 48)
        assert_std_matches(w, ref, msg="depthwise kernel")

    def test_se_block_matches_torch_linear_xavier_normal(self):
        ref1 = torch_std(lambda: torch.empty(4, 64),
                         torch.nn.init.xavier_normal_)
        ref2 = torch_std(lambda: torch.empty(64, 4),
                         torch.nn.init.xavier_normal_)
        m = P.SEBlock()
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 64)))[
            "params"]
        assert_std_matches(params["Dense_0"]["kernel"], ref1, msg="SE fc1")
        assert_std_matches(params["Dense_1"]["kernel"], ref2, msg="SE fc2")

    def test_torch_conv_bias_bounds(self):
        fan_in = 24 * 9
        b = P.torch_conv_bias(fan_in)(jax.random.PRNGKey(0), (4096,))
        bound = 1.0 / np.sqrt(fan_in)
        assert float(jnp.max(jnp.abs(b))) <= bound
        # uniform std = bound/sqrt(3)
        assert float(jnp.std(b)) == pytest.approx(bound / np.sqrt(3), rel=0.1)


class TestFusedCellInits:
    """Grouped layouts must reproduce the PER-EDGE torch fans."""

    def _grouped_params(self, op_type, C=16, Pp=8, E=3):
        from senas_tpu.search.fused_cell import GroupedMixedOp
        m = GroupedMixedOp(c_in=C, c_part=Pp, num_edges=E, op_type=op_type)
        alphas = jnp.full((E, len(op_type.value["ops"])), 0.1)
        return m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, C)),
                      alphas)["params"]

    def test_group_conv_kernel_per_edge_fan(self):
        C, Pp = 16, 8
        params = self._grouped_params(OpType.DOWN, C=C, Pp=Pp)
        # se_conv_3: per-edge torch Conv2d(16, 8, 3) -> fan_out 8*9
        ref = torch_std(lambda: torch.empty(Pp, C, 3, 3), kaiming_out)
        assert_std_matches(params["se_conv_3_kernel"], ref,
                           msg="grouped se_conv_3")
        # dil_3_conv_5: per-edge Conv2d(16, 8, 5) -> fan_out 8*25
        ref5 = torch_std(lambda: torch.empty(Pp, C, 5, 5), kaiming_out)
        assert_std_matches(params["dil_3_conv_5_kernel"], ref5,
                           msg="grouped dil conv_5")

    def test_group_conv_kernel_transpose_fan(self):
        C, Pp = 16, 8
        params = self._grouped_params(OpType.UP, C=C, Pp=Pp)
        # UP cells: per-edge ConvTranspose2d(16, 8, 3) -> fan_out 16*9
        ref = torch_std(lambda: torch.empty(C, Pp, 3, 3), kaiming_out)
        assert_std_matches(params["se_conv_3_kernel"], ref,
                           msg="grouped transpose se_conv_3")

    def test_group_pointwise_and_se_fans(self):
        C, Pp = 16, 32  # Pp > 16 so the SE mid isn't degenerate
        params = self._grouped_params(OpType.DOWN, C=C, Pp=Pp)
        # dep-sep pointwise: per-edge Conv2d(16, 32, 1) -> fan_out 32
        ref_p = torch_std(lambda: torch.empty(Pp, C, 1, 1), kaiming_out)
        assert_std_matches(params["dep_sep_conv_3_pkernel"], ref_p,
                           msg="grouped pointwise")
        # SE: per-edge Linear xavier_normal_
        mid = Pp // 16
        ref_se = torch_std(lambda: torch.empty(mid, Pp),
                           torch.nn.init.xavier_normal_)
        assert_std_matches(params["se_conv_3_se1"], ref_se, msg="grouped SE1")

    def test_group_depthwise_fan(self):
        C, Pp = 16, 8
        params = self._grouped_params(OpType.NORM, C=C, Pp=Pp)
        # per-edge depthwise Conv2d(16,16,5,groups=16): weight [16,1,5,5],
        # fan_out = 16*25
        ref = torch_std(lambda: torch.empty(C, 1, 5, 5), kaiming_out)
        assert_std_matches(params["dep_sep_conv_5_dkernel"], ref,
                           msg="grouped depthwise")


class TestModelLevelInits:
    def test_senas_model_bn_and_conv_stats(self):
        """Whole fixed model: every BN starts (1, 0); conv stds match the
        analytic kaiming fan_out value for their own shape/role."""
        from senas_tpu.models import geno_searched
        from senas_tpu.models.factory import get_segmentation_model
        model = get_segmentation_model(
            "senas", dataset="promise12", c=8, depth=4,
            genotype=geno_searched.senas)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)))
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        n_bn = 0
        for path, leaf in flat:
            name = jax.tree_util.keystr(path)
            if name.endswith("['scale']"):
                assert jnp.all(leaf == 1.0), name
                n_bn += 1
            elif name.endswith("['bias']") and "Dense" not in name:
                # BN biases are zero (conv blocks in the senas model carry
                # no conv bias)
                assert jnp.all(leaf == 0.0), name
        assert n_bn > 10

    def test_nasunet_dense_xavier_normal(self):
        from senas_tpu.models.nasunet import CWeightOp
        m = CWeightOp(c_out=32)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 32)))[
            "params"]
        ref = torch_std(lambda: torch.empty(2, 32),
                        torch.nn.init.xavier_normal_)
        assert_std_matches(params["Dense_0"]["kernel"], ref,
                           msg="nasunet SE fc1")
