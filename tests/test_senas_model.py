"""Fixed SENAS model: construction, forward shapes, grads, genotype variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.models.geno_searched import senas_node_2, senas_node_3, senas_node_4
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.train.loss import build_loss


def _build(genotype, depth=3, c=8, nclass=2, in_ch=1, hw=16, supervision=False,
           double_down=False):
    model = SenasModel(nclass=nclass, in_channels=in_ch, c=c, depth=depth,
                       supervision=supervision, genotype=genotype,
                       double_down_channel=double_down)
    x = jnp.ones((2, hw, hw, in_ch))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    return model, variables, x


class TestSenasModel:
    @pytest.mark.parametrize("genotype", [senas_node_2, senas_node_3, senas_node_4])
    def test_forward_shapes(self, genotype):
        model, variables, x = _build(genotype)
        outs = model.apply(variables, x, False)
        assert isinstance(outs, list) and len(outs) == 1
        assert outs[0].shape == (2, 16, 16, 2)

    def test_depth5(self):
        model, variables, x = _build(senas_node_4, depth=5, hw=64)
        outs = model.apply(variables, x, False)
        assert outs[0].shape == (2, 64, 64, 2)

    def test_double_down_channel(self):
        model, variables, x = _build(senas_node_4, double_down=True)
        outs = model.apply(variables, x, False)
        assert outs[0].shape == (2, 16, 16, 2)

    def test_supervision_heads(self):
        model, variables, x = _build(senas_node_4, supervision=True)
        outs = model.apply(variables, x, False)
        assert len(outs) >= 1
        for o in outs:
            assert o.shape == (2, 16, 16, 2)

    def test_gamma_pruning_changes_paramcount(self):
        from senas_tpu.core.genotype import Genotype
        g_all = Genotype(down=senas_node_4.down, down_concat=senas_node_4.down_concat,
                         up=senas_node_4.up, up_concat=senas_node_4.up_concat,
                         gamma=[1, 1, 1, 1, 1, 1])
        g_none = Genotype(down=senas_node_4.down, down_concat=senas_node_4.down_concat,
                          up=senas_node_4.up, up_concat=senas_node_4.up_concat,
                          gamma=[0, 0, 0, 0, 0, 0])
        _, v_all, _ = _build(g_all)
        _, v_none, _ = _build(g_none)
        n_all = sum(x.size for x in jax.tree.leaves(v_all["params"]))
        n_none = sum(x.size for x in jax.tree.leaves(v_none["params"]))
        assert n_all > n_none

    def test_train_mode_updates_batch_stats(self):
        model, variables, x = _build(senas_node_4)
        outs, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
        old = jax.tree.leaves(variables["batch_stats"])
        new = jax.tree.leaves(mutated["batch_stats"])
        changed = any(not np.allclose(a, b) for a, b in zip(old, new))
        assert changed

    def test_grad_flows(self):
        model, variables, x = _build(senas_node_4, depth=3, hw=16)
        loss_fn = build_loss("dice_ce")
        target = jnp.zeros((2, 16, 16), jnp.int32)

        def loss(params):
            outs, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                                  x, True, mutable=["batch_stats"])
            return loss_fn(outs, target)

        g = jax.grad(loss)(variables["params"])
        gnorm = sum(jnp.sum(t ** 2) for t in jax.tree.leaves(g)) ** 0.5
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0
