"""Baseline zoo: every model family builds, forwards, and shapes correctly."""

import jax
import jax.numpy as jnp
import pytest

from senas_tpu.models.factory import get_segmentation_model

ALL_MODELS = ["unet", "unet_plus_plus", "manet", "linknet", "fpn", "pspnet",
              "pan", "deeplab_v3_plus", "nasunet"]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_zoo_forward(name):
    depth = 5 if name in ("fpn", "pan", "pspnet", "deeplab_v3_plus", "nasunet") else 4
    hw = 64
    model = get_segmentation_model(name, dataset="promise12", depth=depth)
    x = jnp.ones((1, hw, hw, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    outs = model.apply(variables, x, False)
    assert isinstance(outs, list)
    assert outs[0].shape == (1, hw, hw, 2), f"{name}: {outs[0].shape}"


def test_zoo_train_mode_runs():
    model = get_segmentation_model("unet", dataset="promise12", depth=4)
    x = jnp.ones((2, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    outs, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
    assert outs[0].shape == (2, 32, 32, 2)
    assert "batch_stats" in mutated


def test_factory_senas():
    from senas_tpu.models.geno_searched import senas_node_4
    model = get_segmentation_model("senas", dataset="promise12", c=8, depth=3,
                                   genotype=senas_node_4)
    x = jnp.ones((1, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    outs = model.apply(variables, x, False)
    assert outs[0].shape == (1, 32, 32, 2)
