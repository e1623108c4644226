"""Encoder families: feature-pyramid contract (depth+1 maps at strides
1,2,4,...,2^depth with the smp per-stage channel plan)."""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from senas_tpu.models.encoders import get_encoder

# smp channel contracts (encoders/{resnet,vgg,densenet,mobilenet}.py)
CONTRACTS = {
    "resnet10": (3, 64, 64, 128, 256, 512),
    "resnet18": (3, 64, 64, 128, 256, 512),
    "vgg11": (64, 128, 256, 512, 512, 512),
    "vgg16_bn": (64, 128, 256, 512, 512, 512),
    "densenet121": (3, 64, 256, 512, 1024, 1024),
    "mobilenet_v2": (3, 16, 24, 32, 96, 1280),
    "efficientnet-b0": (3, 32, 24, 40, 112, 320),
    "efficientnet-b2": (3, 32, 24, 48, 120, 352),
    # encoders_families.py natives (smp senet/xception/inception*/dpn.py)
    "se_resnet50": (3, 64, 256, 512, 1024, 2048),
    "se_resnext50_32x4d": (3, 64, 256, 512, 1024, 2048),
    "senet154": (3, 128, 256, 512, 1024, 2048),
    "xception": (3, 64, 128, 256, 728, 2048),
    "inceptionv4": (3, 64, 192, 384, 1024, 1536),
    "inceptionresnetv2": (3, 64, 192, 320, 1088, 1536),
    "dpn68": (3, 10, 144, 320, 704, 832),
    "dpn68b": (3, 10, 144, 320, 704, 832),
    "dpn92": (3, 64, 336, 704, 1552, 2688),
}


@pytest.mark.parametrize("name", sorted(CONTRACTS))
def test_encoder_pyramid(name):
    depth = 5
    hw = 32
    enc = get_encoder(name, depth=depth)
    x = jnp.ones((1, hw, hw, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, False)
    feats = enc.apply(variables, x, False)
    assert len(feats) == depth + 1
    expected_c = CONTRACTS[name]
    for level, f in enumerate(feats):
        assert f.shape[1] == hw // (2 ** level), (name, level, f.shape)
        assert f.shape[-1] == expected_c[level], (name, level, f.shape)


def test_unet_runs_on_extra_encoder():
    from senas_tpu.models.zoo import Unet
    model = Unet(classes=2, in_channels=1, encoder_name="mobilenet_v2",
                 encoder_depth=4, decoder_channels=(64, 32, 16, 8))
    x = jnp.ones((1, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    outs = model.apply(variables, x, False)
    assert outs[0].shape == (1, 32, 32, 2)


def test_gated_families_raise():
    with pytest.raises(KeyError, match="timm"):
        get_encoder("timm-regnetx_002")


def test_family_encoder_trains_through_unet():
    """One clipped SGD train step through a zoo decoder on a
    families-module encoder (the grouped/SE bottleneck path)."""
    import numpy as np
    from senas_tpu.models.zoo import Unet
    from senas_tpu.train.loss import build_loss
    from senas_tpu.train.optim import build_optimizer
    from senas_tpu.train.trainer import FixedTrainState, make_train_step

    model = Unet(classes=2, in_channels=1, encoder_name="se_resnext50_32x4d",
                 encoder_depth=4, decoder_channels=(64, 32, 16, 8))
    x = jnp.ones((2, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    tx = build_optimizer({"name": "sgd", "lr": 1e-2, "momentum": 0.9})
    step = make_train_step(model.apply, build_loss("dice_ce"), tx,
                           grad_clip=5.0)
    state = FixedTrainState.create(variables, tx)
    batch = {"image": jnp.asarray(
                 np.random.RandomState(0).randn(2, 32, 32, 1), jnp.float32),
             "label": jnp.zeros((2, 32, 32), jnp.int32)}
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
