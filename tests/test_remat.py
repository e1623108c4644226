"""Remat (jax.checkpoint) knob: identical math, identical param tree.

The `remat` field on SenasModel / SenasSearch (config keys training.remat /
searching.remat) wraps every cell in flax's lifted remat so the backward
pass recomputes cell activations instead of keeping them live — the memory
knob for large configs (512^2 inputs, hippo batch 256). These tests pin that
the transform is semantically invisible: same variable tree, same logits,
same loss, same gradients, with BN batch_stats updates flowing through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.models.geno_searched import senas_node_4
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.search.supernet import SenasSearch, init_arch_params, normalize_arch
from senas_tpu.train.loss import build_loss


def _tree_allclose(a, b, rtol=1e-6, atol=1e-6):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


class TestFixedModelRemat:
    def _build(self, remat):
        model = SenasModel(nclass=2, in_channels=1, c=8, depth=3,
                           genotype=senas_node_4, remat=remat)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
        return model, variables, x

    def test_param_tree_identical(self):
        _, v0, _ = self._build(False)
        _, v1, _ = self._build(True)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
        _tree_allclose(v0["params"], v1["params"])

    def test_logits_and_grads_identical(self):
        m0, v, x = self._build(False)
        m1, _, _ = self._build(True)
        y = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 16), 0, 2)
        loss_fn = build_loss("dice_ce")

        def loss(model, params, bs):
            outs, upd = model.apply({"params": params, "batch_stats": bs},
                                    x, True, mutable=["batch_stats"])
            return loss_fn(outs, y), (outs[0], upd["batch_stats"])

        (l0, (o0, bs0)), g0 = jax.value_and_grad(
            lambda p: loss(m0, p, v["batch_stats"]), has_aux=True)(v["params"])
        (l1, (o1, bs1)), g1 = jax.value_and_grad(
            lambda p: loss(m1, p, v["batch_stats"]), has_aux=True)(v["params"])

        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), rtol=1e-5, atol=1e-5)
        _tree_allclose(g0, g1, rtol=1e-5, atol=1e-6)
        _tree_allclose(bs0, bs1)


class TestSupernetRemat:
    def _build(self, remat):
        model = SenasSearch(in_channels=1, c=8, nclass=2, depth=3,
                            meta_node_num=2, remat=remat)
        arch = init_arch_params(jax.random.PRNGKey(1), 2, 3, use_sharing=False)
        aw = normalize_arch(arch, 2)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, aw, False)
        return model, variables, aw, x

    def test_param_tree_identical(self):
        _, v0, _, _ = self._build(False)
        _, v1, _, _ = self._build(True)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
        _tree_allclose(v0["params"], v1["params"])

    def test_loss_and_grads_identical(self):
        m0, v, aw, x = self._build(False)
        m1, _, _, _ = self._build(True)
        y = jax.random.randint(jax.random.PRNGKey(2), (2, 16, 16), 0, 2)
        loss_fn = build_loss("dice_ce")

        def loss(model, params):
            outs, _ = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                                  x, aw, True, mutable=["batch_stats"])
            return loss_fn(outs, y)

        l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        _tree_allclose(g0, g1, rtol=1e-5, atol=1e-6)
