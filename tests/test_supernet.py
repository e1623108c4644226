"""Supernet: arch params, normalization, forward, discretization, bilevel step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from senas_tpu.core.genotype import Genotype
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.search.supernet import (
    SenasSearch,
    derive_genotype,
    init_arch_params,
    normalize_arch,
)
from senas_tpu.train.loss import build_loss
from senas_tpu.train.optim import build_optimizer
from senas_tpu.train.trainer import SearchTrainState, make_search_step

# Arch-param tests (pure numpy) use the real search scale; the compiled
# supernet fixture uses the smallest structurally-complete config — XLA:CPU
# compile time on this 1-core host is the budget, and the tests check
# structure, not scale.
DEPTH, META = 4, 3
SDEPTH, SMETA, C, HW = 3, 2, 8, 16


@pytest.fixture(scope="module")
def supernet():
    model = SenasSearch(in_channels=1, c=C, nclass=2, depth=SDEPTH,
                        meta_node_num=SMETA, double_down_channel=False)
    arch = init_arch_params(jax.random.PRNGKey(1), SMETA, SDEPTH, use_sharing=False)
    x = jnp.ones((2, HW, HW, 1))
    aw = normalize_arch(arch, SMETA)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, aw, False)
    return model, variables, arch, x


class TestArchParams:
    def test_shapes(self):
        arch = init_arch_params(jax.random.PRNGKey(0), META, DEPTH, use_sharing=False)
        k = 9  # 2+3+4
        assert arch["alphas_dn"].shape == (k, 6)
        assert arch["alphas_up"].shape == (k, 6)
        assert arch["alphas_dn_nm"].shape == (k, 6)
        assert arch["alphas_up_nm"].shape == (k, 6)
        assert arch["betas_dn"].shape == (k,)
        assert arch["gamma"].shape == (sum(range(DEPTH - 1)), 2)

    def test_sharing_drops_up_nm(self):
        arch = init_arch_params(jax.random.PRNGKey(0), META, DEPTH, use_sharing=True)
        assert "alphas_up_nm" not in arch
        aw = normalize_arch(arch, META)
        np.testing.assert_array_equal(aw["alphas_up_nm"], aw["alphas_dn_nm"])

    def test_normalization(self):
        arch = init_arch_params(jax.random.PRNGKey(0), META, DEPTH, use_sharing=False)
        aw = normalize_arch(arch, META)
        np.testing.assert_allclose(np.asarray(aw["alphas_dn"]).sum(-1), 1.0, rtol=1e-5)
        # betas: per-group softmax sums to 1 per group
        b = np.asarray(aw["betas_dn"])
        assert abs(b[0:2].sum() - 1) < 1e-5
        assert abs(b[2:5].sum() - 1) < 1e-5
        assert abs(b[5:9].sum() - 1) < 1e-5
        np.testing.assert_allclose(np.asarray(aw["gamma"]).sum(-1), 1.0, rtol=1e-5)


class TestSupernetForward:
    def test_forward_shape(self, supernet):
        model, variables, arch, x = supernet
        aw = normalize_arch(arch, SMETA)
        outs = model.apply(variables, x, aw, False)
        assert len(outs) == 1 and outs[0].shape == (2, HW, HW, 2)

    def test_arch_grads_nonzero(self, supernet):
        model, variables, arch, x = supernet
        target = jnp.zeros((2, HW, HW), jnp.int32)
        loss_fn = build_loss("dice_ce")

        def loss(a):
            aw = normalize_arch(a, SMETA)
            outs, _ = model.apply(variables, x, aw, True, mutable=["batch_stats"])
            return loss_fn(outs, target)

        g = jax.grad(loss)(arch)
        for name, t in g.items():
            assert np.isfinite(np.asarray(t)).all(), name
        # alphas must receive signal
        assert float(jnp.abs(g["alphas_dn"]).sum()) > 0
        assert float(jnp.abs(g["gamma"]).sum()) > 0


class TestDiscretization:
    def test_derive_genotype_valid(self, supernet):
        _, _, arch, _ = supernet
        g = derive_genotype(arch, SMETA, SDEPTH)
        assert isinstance(g, Genotype)
        assert len(g.down) == 2 * SMETA and len(g.up) == 2 * SMETA
        assert list(g.down_concat) == [2, 3]
        assert len(g.gamma) == sum(range(SDEPTH - 1))
        # gamma path-contiguity: within each row once 1 appears, rest are 1
        rows = [g.gamma[sum(range(i)): sum(range(i)) + i] for i in range(1, SDEPTH - 1)]
        for row in rows:
            if 1 in row:
                first = row.index(1)
                assert all(v == 1 for v in row[first:])

    def test_derived_genotype_builds_model(self, supernet):
        _, _, arch, _ = supernet
        g = derive_genotype(arch, SMETA, SDEPTH)
        model = SenasModel(nclass=2, in_channels=1, c=C, depth=SDEPTH, genotype=g)
        x = jnp.ones((1, HW, HW, 1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
        outs = model.apply(variables, x, False)
        assert outs[0].shape == (1, HW, HW, 2)

    def test_genotype_stable_under_tiny_perturbation(self, supernet):
        _, _, arch, _ = supernet
        g1 = derive_genotype(arch, SMETA, SDEPTH)
        arch2 = {k: v + 1e-9 for k, v in arch.items()}
        g2 = derive_genotype(arch2, SMETA, SDEPTH)
        assert g1.down == g2.down and g1.up == g2.up and g1.gamma == g2.gamma


class TestBilevelStep:
    def test_search_step_updates_both(self, supernet):
        model, variables, arch, x = supernet
        loss_fn = build_loss("dice_ce")
        w_tx = build_optimizer({"name": "sgd", "lr": 1e-2, "momentum": 0.9,
                                "weight_decay": 3e-4})
        a_tx = build_optimizer({"name": "adam", "lr": 1e-3, "weight_decay": 1e-3,
                                "betas": (0.5, 0.999)})
        normalize = lambda a: normalize_arch(a, SMETA)
        step = make_search_step(model.apply, normalize, loss_fn, w_tx, a_tx,
                                grad_clip=5.0, donate=False)
        state = SearchTrainState.create(variables, arch, w_tx, a_tx)
        batch = {"image": x, "label": jnp.zeros((2, HW, HW), jnp.int32)}

        new_state, metrics = step(state, batch, batch, True)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["arch_loss"]))
        # both weights and arch changed
        dw = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.params, new_state.params)
        assert max(jax.tree.leaves(dw)) > 0
        da = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.arch, new_state.arch)
        assert max(jax.tree.leaves(da)) > 0

        # without the Adam arch step (epoch < alpha_begin), arch params STILL
        # move in the default reference mode: the weight SGD spans
        # model.parameters() incl. the arch tables (search_arc.py:135)
        state2, m2 = step(new_state, batch, batch, False)
        da2 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           new_state.arch, state2.arch)
        assert max(jax.tree.leaves(da2)) > 0
        assert float(m2["arch_loss"]) == 0

        # pure-DARTS mode (arch_in_weight_step=False): arch frozen when the
        # Adam step is off
        step_pure = make_search_step(model.apply, normalize, loss_fn, w_tx,
                                     a_tx, grad_clip=5.0, donate=False,
                                     arch_in_weight_step=False)
        state_p = SearchTrainState.create(variables, arch, w_tx, a_tx,
                                          arch_in_weight_step=False)
        state_p2, _ = step_pure(state_p, batch, batch, False)
        da3 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state_p.arch, state_p2.arch)
        assert max(jax.tree.leaves(da3)) == 0
