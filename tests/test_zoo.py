"""Baseline zoo: every model family builds, forwards, shapes correctly, and
completes one optimizer train step (catches missing-rng dropout crashes,
e.g. DeepLabV3+'s ASPP dropout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from senas_tpu.models.factory import get_segmentation_model
from senas_tpu.train.loss import build_loss
from senas_tpu.train.optim import build_optimizer
from senas_tpu.train.trainer import FixedTrainState, make_train_step

# (name, depth, input hw, expected output hw). pspnet keeps smp's fixed
# upsampling=8 against a stride-2^depth encoder — at depth 5 it emits
# outputs 4x smaller than the input, faithful to the reference factory
# wiring (models/__init__.py:75-80). pan dilates its last encoder stage
# (stride 16, pan/model.py:49), its GAU chain decodes back to stride 4 and
# the x4 head restores full resolution; the FPA pyramid needs >= 128 input.
ZOO = [
    ("unet", 4, 64, 64),
    ("unet_plus_plus", 4, 32, 32),
    ("manet", 4, 32, 32),
    ("linknet", 4, 32, 32),
    ("fpn", 5, 64, 64),
    ("pspnet", 5, 64, 16),
    ("pan", 5, 128, 128),
    ("deeplab_v3_plus", 5, 64, 64),
    ("nasunet", 4, 32, 32),
]


@pytest.mark.parametrize("name,depth,hw,out_hw", ZOO)
def test_zoo_forward(name, depth, hw, out_hw):
    model = get_segmentation_model(name, dataset="promise12", depth=depth)
    x = jnp.ones((1, hw, hw, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    outs = model.apply(variables, x, False)
    assert isinstance(outs, list)
    assert outs[0].shape == (1, out_hw, out_hw, 2), f"{name}: {outs[0].shape}"


@pytest.mark.parametrize("name,depth,hw,out_hw", ZOO)
def test_zoo_one_train_step(name, depth, hw, out_hw):
    """Every factory model must survive a full jitted train step
    (reference parity: all baselines train via train_model.py:264-305)."""
    model = get_segmentation_model(name, dataset="promise12", depth=depth)
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.randn(2, hw, hw, 1).astype(np.float32)),
        "label": jnp.asarray(rs.randint(0, 2, (2, out_hw, out_hw)).astype(np.int32)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch["image"], False)
    tx = build_optimizer({"name": "sgd", "lr": 1e-2, "momentum": 0.9})
    step = make_train_step(model.apply, build_loss("dice_ce"), tx,
                           grad_clip=5.0, donate=False)
    state = FixedTrainState.create(variables, tx)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"])), name
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.params, new_state.params)
    assert max(jax.tree.leaves(deltas)) > 0, f"{name}: no parameter update"


def test_factory_senas():
    from senas_tpu.models.geno_searched import senas_node_4
    model = get_segmentation_model("senas", dataset="promise12", c=8, depth=3,
                                   genotype=senas_node_4)
    x = jnp.ones((1, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    outs = model.apply(variables, x, False)
    assert outs[0].shape == (1, 32, 32, 2)
