"""Non-square inputs (heart crop is 256x320, hippo 32x48) and the
deep-supervision paths of both the fixed model and the supernet."""

import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np

from senas_tpu.models.geno_searched import senas_node_2
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.search.supernet import (SenasSearch, init_arch_params,
                                       normalize_arch)
from senas_tpu.train.loss import build_loss
from senas_tpu.train.optim import build_optimizer
from senas_tpu.train.trainer import FixedTrainState, make_train_step


def test_fixed_model_non_square():
    model = SenasModel(nclass=2, in_channels=1, c=8, depth=3,
                       genotype=senas_node_2)
    x = jnp.ones((1, 16, 24, 1))  # H != W (heart/hippo crop pattern)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    outs = model.apply(v, x, False)
    assert outs[0].shape == (1, 16, 24, 2)


def test_fixed_model_deep_supervision_trains():
    model = SenasModel(nclass=2, in_channels=1, c=8, depth=3,
                       genotype=senas_node_2, supervision=True)
    rs = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rs.randn(2, 16, 16, 1).astype(np.float32)),
             "label": jnp.asarray(rs.randint(0, 2, (2, 16, 16)).astype(np.int32))}
    v = model.init({"params": jax.random.PRNGKey(0)}, batch["image"], False)
    outs = model.apply(v, batch["image"], False)
    assert len(outs) > 1  # one head per surviving decoder output + final
    tx = build_optimizer({"name": "sgd", "lr": 1e-2})
    step = make_train_step(model.apply,
                           build_loss("dice_ce", supervision=True), tx,
                           donate=False)
    state = FixedTrainState.create(v, tx)
    _, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_supernet_deep_supervision_forward():
    net = SenasSearch(in_channels=1, c=8, nclass=2, depth=3, meta_node_num=2,
                      supervision=True)
    arch = init_arch_params(jax.random.PRNGKey(1), 2, 3)
    aw = normalize_arch(arch, 2)
    x = jnp.ones((1, 16, 16, 1))
    v = net.init({"params": jax.random.PRNGKey(0)}, x, aw, False)
    outs = net.apply(v, x, aw, False)
    assert len(outs) > 1
    for o in outs:
        assert o.shape == (1, 16, 16, 2)
