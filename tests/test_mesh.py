"""Distributed backend: the sharded train step must equal the
single-device step, and params must stay replicated.

Generalizes the reference's nn.DataParallel semantics
(experiments/train_model.py:135-137) to the mesh layer
(senas_tpu/parallel/mesh.py): batch over "data", optional image rows over
"spatial" (GSPMD inserts the gradient psums / conv halo exchanges).
Runs on the 8 virtual CPU devices provisioned by conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.models.geno_searched import senas_node_4
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.parallel.mesh import (MeshSpec, batch_sharding, label_sharding,
                                     make_mesh, place_state, replicate,
                                     shard_batch)
from senas_tpu.train.loss import build_loss
from senas_tpu.train.optim import build_optimizer
from senas_tpu.train.trainer import FixedTrainState, make_train_step


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provision 8 virtual devices"
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
    # single-device ground truth
    ref_state, ref_metrics = step(
        FixedTrainState.create(variables, tx),
        {k: jnp.asarray(v) for k, v in batch_np.items()})
    return model, variables, tx, step, batch_np, ref_state, ref_metrics


@pytest.mark.parametrize("spec", [MeshSpec(data=8, spatial=1),
                                  MeshSpec(data=4, spatial=2)])
def test_sharded_step_matches_single_device(setup, spec):
    model, variables, tx, step, batch_np, ref_state, ref_metrics = setup
    mesh = make_mesh(jax.devices()[:8], spec)
    state = place_state(mesh, FixedTrainState.create(variables, tx))
    sharded = shard_batch(mesh, batch_np, spatial=spec.spatial > 1)
    new_state, metrics = step(state, sharded)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    ref_leaves = jax.tree.leaves(ref_state.params)
    new_leaves = jax.tree.leaves(new_state.params)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_params_stay_replicated(setup):
    model, variables, tx, step, batch_np, *_ = setup
    mesh = make_mesh(jax.devices()[:8], MeshSpec(data=8, spatial=1))
    state = place_state(mesh, FixedTrainState.create(variables, tx))
    sharded = shard_batch(mesh, batch_np, spatial=False)
    new_state, _ = step(state, sharded)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated, leaf.sharding


def test_batch_shardings():
    mesh = make_mesh(jax.devices()[:8], MeshSpec(data=4, spatial=2))
    img = jax.device_put(np.zeros((8, 16, 16, 1), np.float32),
                         batch_sharding(mesh, spatial=True))
    lab = jax.device_put(np.zeros((8, 16, 16), np.int32),
                         label_sharding(mesh, spatial=True))
    # batch split over data(4), rows over spatial(2)
    assert img.addressable_shards[0].data.shape == (2, 8, 16, 1)
    assert lab.addressable_shards[0].data.shape == (2, 8, 16)
    rep = jax.device_put(np.zeros((3, 3), np.float32), replicate(mesh))
    assert rep.sharding.is_fully_replicated
