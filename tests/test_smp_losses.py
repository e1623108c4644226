"""smp loss family: jnp implementations vs the reference torch originals."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from senas_tpu.train import smp_losses as L

pytestmark = pytest.mark.parity

_REF = "/root/reference/segmentation_models_pytorch/losses"


@pytest.fixture(scope="module")
def ref():
    """Load the reference losses as an isolated package."""
    pkg = types.ModuleType("ref_losses")
    pkg.__path__ = [_REF]
    sys.modules["ref_losses"] = pkg
    mods = {}
    for name in ["constants", "_functional", "dice", "jaccard", "tversky",
                 "focal", "lovasz", "soft_bce", "soft_ce"]:
        spec = importlib.util.spec_from_file_location(
            f"ref_losses.{name}", f"{_REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_losses.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _rand(seed, b=2, c=3, hw=8):
    rs = np.random.RandomState(seed)
    logits = rs.randn(b, hw, hw, c).astype(np.float32)  # NHWC (ours)
    labels = rs.randint(0, c, (b, hw, hw)).astype(np.int64)
    binary_logits = rs.randn(b, hw, hw).astype(np.float32)
    binary_labels = rs.randint(0, 2, (b, hw, hw)).astype(np.int64)
    return logits, labels, binary_logits, binary_labels


def _nchw(x):
    return torch.tensor(np.moveaxis(x, -1, 1))


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("log_loss", [False, True])
def test_dice_multiclass(ref, seed, log_loss):
    logits, labels, _, _ = _rand(seed)
    ours = L.DiceLoss(mode="multiclass", log_loss=log_loss)(logits, labels)
    theirs = ref["dice"].DiceLoss("multiclass", log_loss=log_loss)(
        _nchw(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_dice_binary(ref, seed):
    _, _, blog, blab = _rand(seed)
    ours = L.DiceLoss(mode="binary")(blog, blab)
    theirs = ref["dice"].DiceLoss("binary")(
        torch.tensor(blog), torch.tensor(blab))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_jaccard_multiclass(ref):
    logits, labels, _, _ = _rand(2)
    ours = L.JaccardLoss(mode="multiclass")(logits, labels)
    theirs = ref["jaccard"].JaccardLoss("multiclass")(
        _nchw(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


@pytest.mark.parametrize("alpha,beta", [(0.5, 0.5), (0.3, 0.7)])
def test_tversky(ref, alpha, beta):
    logits, labels, _, _ = _rand(3)
    ours = L.TverskyLoss(mode="multiclass", alpha=alpha, beta=beta)(logits, labels)
    theirs = ref["tversky"].TverskyLoss("multiclass", alpha=alpha, beta=beta)(
        _nchw(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


@pytest.mark.parametrize("mode", ["binary", "multiclass"])
def test_focal(ref, mode):
    logits, labels, blog, blab = _rand(4)
    if mode == "binary":
        ours = L.FocalLoss(mode="binary", alpha=0.25)(blog, blab)
        theirs = ref["focal"].FocalLoss("binary", alpha=0.25)(
            torch.tensor(blog), torch.tensor(blab))
    else:
        ours = L.FocalLoss(mode="multiclass", alpha=0.25)(logits, labels)
        theirs = ref["focal"].FocalLoss("multiclass", alpha=0.25)(
            _nchw(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)


def test_soft_bce(ref):
    _, _, blog, blab = _rand(5)
    ours = L.SoftBCEWithLogitsLoss(smooth_factor=0.1, ignore_index=None)(blog, blab)
    theirs = ref["soft_bce"].SoftBCEWithLogitsLoss(smooth_factor=0.1,
                                                   ignore_index=None)(
        torch.tensor(blog), torch.tensor(blab, dtype=torch.float32))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_soft_ce(ref):
    logits, labels, _, _ = _rand(6)
    ours = L.SoftCrossEntropyLoss(smooth_factor=0.1)(logits, labels)
    theirs = ref["soft_ce"].SoftCrossEntropyLoss(smooth_factor=0.1)(
        _nchw(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


@pytest.mark.parametrize("mode", ["binary", "multiclass"])
@pytest.mark.parametrize("per_image", [False, True])
def test_lovasz(ref, mode, per_image):
    logits, labels, blog, blab = _rand(7)
    if mode == "binary":
        ours = L.LovaszLoss(mode="binary", per_image=per_image)(blog, blab)
        theirs = ref["lovasz"].LovaszLoss("binary", per_image=per_image)(
            torch.tensor(blog), torch.tensor(blab))
    else:
        ours = L.LovaszLoss(mode="multiclass", per_image=per_image)(logits, labels)
        theirs = ref["lovasz"].LovaszLoss("multiclass", per_image=per_image)(
            _nchw(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4, atol=1e-6)


def test_losses_are_jittable_and_differentiable():
    import jax
    import jax.numpy as jnp
    logits, labels, blog, blab = _rand(8)
    for loss in [L.DiceLoss(mode="multiclass"),
                 L.JaccardLoss(mode="multiclass"),
                 L.TverskyLoss(mode="multiclass", alpha=0.3, beta=0.7),
                 L.FocalLoss(mode="multiclass", alpha=0.25),
                 L.SoftCrossEntropyLoss(smooth_factor=0.1),
                 L.LovaszLoss(mode="multiclass")]:
        g = jax.jit(jax.grad(lambda p: loss(p, jnp.asarray(labels))))(
            jnp.asarray(logits))
        assert np.isfinite(np.asarray(g)).all(), type(loss).__name__
