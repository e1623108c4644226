"""smp head-surface parity: Activation dispatch, head `activation` kwarg,
and the `aux_params` ClassificationHead path on every zoo architecture
(reference base/modules.py:76-105, base/heads.py:5-25, base/model.py:13-24,
and each model's `aux_params` ctor arg, e.g. unet/model.py:60-92)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.models.base import (ClassificationHead, SegmentationHead,
                                   smp_activation)
from senas_tpu.models import zoo

pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def test_activation_dispatch_matches_torch():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 6, 6).astype(np.float32)  # NCHW for torch
    xs = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NHWC for us
    xt = torch.from_numpy(x)

    cases = {
        "sigmoid": torch.sigmoid(xt).numpy(),
        "tanh": torch.tanh(xt).numpy(),
        "softmax2d": torch.softmax(xt, dim=1).numpy(),
        # torch's implicit-softmax-dim rule picks dim=1 for 4D input
        "softmax": torch.softmax(xt, dim=1).numpy(),
        "logsoftmax": torch.log_softmax(xt, dim=1).numpy(),
    }
    for name, ref in cases.items():
        got = np.transpose(np.asarray(smp_activation(name)(xs)), (0, 3, 1, 2))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=name)
    # identity / None
    np.testing.assert_array_equal(np.asarray(smp_activation(None)(xs)),
                                  np.asarray(xs))
    # argmax2d: channel argmax; argmax: fully-flattened argmax
    ref = torch.argmax(xt, dim=1).numpy()
    got = np.asarray(smp_activation("argmax2d")(xs))
    np.testing.assert_array_equal(got, ref)
    assert int(smp_activation("argmax")(xs)) == int(
        np.argmax(np.transpose(x, (0, 2, 3, 1))))
    with pytest.raises(ValueError, match="Activation should be"):
        smp_activation("bogus")


def test_head_activation_wraps_logits():
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 16), jnp.float32)
    plain = SegmentationHead(3)
    variables = plain.init({"params": KEY}, x)
    logits = plain.apply(variables, x)
    probs = SegmentationHead(3, activation="sigmoid").apply(variables, x)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(jax.nn.sigmoid(logits)), rtol=1e-6)


def test_classification_head_matches_vendored_smp():
    """Translated weights through the reference's own heads.py code."""
    torch = pytest.importorskip("torch")
    import importlib.util
    import sys
    import types

    REF = "/root/reference/segmentation_models_pytorch"
    pkg = types.ModuleType("smpref_heads_pkg")
    pkg.__path__ = [REF + "/base"]
    sys.modules["smpref_heads_pkg"] = pkg
    for mod_name, path in (("smpref_heads_pkg.modules", REF + "/base/modules.py"),
                           ("smpref_heads_pkg.heads", REF + "/base/heads.py")):
        spec = importlib.util.spec_from_file_location(mod_name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, mod_name.rsplit(".", 1)[1], mod)
    heads = sys.modules["smpref_heads_pkg.heads"]

    rs = np.random.RandomState(0)
    x = rs.randn(3, 32, 4, 4).astype(np.float32)
    for pooling in ("avg", "max"):
        ref_head = heads.ClassificationHead(in_channels=32, classes=5,
                                            pooling=pooling, dropout=0.2,
                                            activation="softmax")
        ref_head.eval()
        with torch.no_grad():
            ref = ref_head(torch.from_numpy(x)).numpy()

        ours = ClassificationHead(classes=5, pooling=pooling, dropout=0.2,
                                  activation="softmax")
        xs = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        variables = ours.init({"params": KEY}, xs, False)
        import flax
        params = flax.core.unfreeze(variables["params"])
        sd = ref_head.state_dict()
        params["Dense_0"]["kernel"] = jnp.asarray(sd["3.weight"].numpy().T)
        params["Dense_0"]["bias"] = jnp.asarray(sd["3.bias"].numpy())
        got = np.asarray(ours.apply({"params": params}, xs, False))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=pooling)
    with pytest.raises(ValueError, match="Pooling should be one of"):
        ClassificationHead(classes=2, pooling="sum").init(
            {"params": KEY}, jnp.zeros((1, 4, 4, 8)), False)


ZOO_MODELS = {
    "Unet": zoo.Unet,
    "UnetPlusPlus": zoo.UnetPlusPlus,
    "MAnet": zoo.MAnet,
    "Linknet": zoo.Linknet,
    "FPN": zoo.FPN,
    "PSPNet": zoo.PSPNet,
    "DeepLabV3Plus": zoo.DeepLabV3Plus,
    "PAN": zoo.PAN,
}


@pytest.mark.parametrize("name", sorted(ZOO_MODELS))
def test_zoo_aux_params_path(name):
    """With aux_params set, every architecture returns ([masks], labels)
    with labels from the deepest encoder feature; without it, the plain
    deep-supervision list (base/model.py:20-24)."""
    cls = ZOO_MODELS[name]
    hw = 256 if name == "PAN" else 64
    x = jnp.zeros((2, hw, hw, 3), jnp.float32)
    # smp PSPNet defaults to encoder_depth=3 (pspnet/model.py:80) so its
    # x8 head restores full resolution
    kw = dict(encoder_depth=3) if name == "PSPNet" else {}
    model = cls(classes=2, aux_params=dict(classes=4, dropout=0.5,
                                           activation="softmax"), **kw)
    out, _ = model.init_with_output({"params": KEY}, x, False)
    assert isinstance(out, tuple) and len(out) == 2
    masks, labels = out
    assert masks[-1].shape == (2, hw, hw, 2)
    assert labels.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(labels.sum(-1)), 1.0, rtol=1e-5)

    plain = cls(classes=2, **kw)
    out, _ = plain.init_with_output({"params": KEY}, x, False)
    assert isinstance(out, list) and out[-1].shape == (2, hw, hw, 2)


def test_aux_head_trains_with_dropout_rng():
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    model = zoo.Unet(classes=2, aux_params=dict(classes=3))
    variables = model.init({"params": KEY, "dropout": jax.random.PRNGKey(1)},
                           x, True)
    (masks, labels), _ = model.apply(
        variables, x, True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert labels.shape == (2, 3)
