"""Pallas-gated paths under the GSPMD mesh: the sharded step with
SENAS_PALLAS_BN=1 / SENAS_PALLAS_EPILOGUE=1 must equal the single-device
gated step AND the ungated sharded step — otherwise the gates can never be
turned on for multi-chip runs. Runs on the 8 virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from senas_tpu.models.geno_searched import senas_node_4
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.parallel.mesh import MeshSpec, make_mesh, place_state, shard_batch
from senas_tpu.train.loss import build_loss
from senas_tpu.train.optim import build_optimizer
from senas_tpu.train.trainer import FixedTrainState, make_train_step


def test_sharded_fixed_step_with_pallas_bn(monkeypatch):
    assert len(jax.devices()) >= 8
    monkeypatch.setenv("SENAS_PALLAS_BN", "1")
    model = SenasModel(nclass=2, in_channels=1, c=8, depth=3,
                       genotype=senas_node_4)
    hw, batch = 32, 8
    x0 = jnp.zeros((batch, hw, hw, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, False)
    tx = build_optimizer({"name": "sgd", "lr": 1e-2, "momentum": 0.9})
    step = make_train_step(model.apply, build_loss("dice_ce"), tx,
                           grad_clip=5.0, donate=False)
    rs = np.random.RandomState(0)
    batch_np = {
        "image": rs.randn(batch, hw, hw, 1).astype(np.float32),
        "label": rs.randint(0, 2, (batch, hw, hw)).astype(np.int32),
    }
    ref_state, ref_metrics = step(
        FixedTrainState.create(variables, tx),
        {k: jnp.asarray(v) for k, v in batch_np.items()})

    mesh = make_mesh(jax.devices()[:8], MeshSpec(data=8, spatial=1))
    state = place_state(mesh, FixedTrainState.create(variables, tx))
    sharded = shard_batch(mesh, batch_np, spatial=False)
    new_state, metrics = step(state, sharded)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    for key in ("tp", "fp", "fn"):
        np.testing.assert_array_equal(np.asarray(metrics[key]),
                                      np.asarray(ref_metrics[key]))
    # loose param tolerance: BN grad cancellation near init (see
    # test_mesh.py note)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3)


def test_sharded_search_step_with_pallas_epilogue(monkeypatch):
    """Bilevel supernet step, data-parallel, with the fused group epilogue
    AND the pallas BN gate on: loss matches the gated single-device step."""
    from senas_tpu.search.supernet import (SenasSearch, init_arch_params,
                                           normalize_arch)
    from senas_tpu.train.trainer import SearchTrainState, make_search_step

    assert len(jax.devices()) >= 8
    monkeypatch.setenv("SENAS_PALLAS_EPILOGUE", "1")
    monkeypatch.setenv("SENAS_PALLAS_BN", "1")
    meta, depth, hw, batch = 2, 2, 16, 8
    net = SenasSearch(in_channels=1, c=4, nclass=2, depth=depth,
                      meta_node_num=meta)
    rng = jax.random.PRNGKey(0)
    arch = init_arch_params(jax.random.split(rng)[1], meta, depth)
    x0 = jnp.zeros((batch, hw, hw, 1), jnp.float32)
    aw = normalize_arch(arch, meta)
    variables = net.init({"params": rng}, x0, aw, False)

    loss_fn = build_loss("dice_ce")
    w_tx = build_optimizer({"name": "sgd", "lr": 5e-3, "momentum": 0.9})
    a_tx = build_optimizer({"name": "adam", "lr": 1e-4})
    step = make_search_step(net.apply, lambda a: normalize_arch(a, meta),
                            loss_fn, w_tx, a_tx, grad_clip=5.0, donate=False)

    rs = np.random.RandomState(0)
    def mk():
        return {
            "image": rs.randn(batch, hw, hw, 1).astype(np.float32),
            "label": rs.randint(0, 2, (batch, hw, hw)).astype(np.int32),
        }
    tb_np, vb_np = mk(), mk()
    as_dev = lambda d: {k: jnp.asarray(v) for k, v in d.items()}

    ref_state, ref_metrics = step(
        SearchTrainState.create(variables, arch, w_tx, a_tx),
        as_dev(tb_np), as_dev(vb_np), True)

    mesh = make_mesh(jax.devices()[:8], MeshSpec(data=8, spatial=1))
    state = place_state(mesh, SearchTrainState.create(variables, arch,
                                                      w_tx, a_tx))
    new_state, metrics = step(state, shard_batch(mesh, tb_np, spatial=False),
                              shard_batch(mesh, vb_np, spatial=False), True)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
