"""smp utils: score functions vs the reference formulas, meters, epoch
runners; plus the legacy customize modules."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.train import smp_utils as U


def _rand(seed, b=2, hw=8, c=3):
    rs = np.random.RandomState(seed)
    pr = rs.rand(b, hw, hw, c).astype(np.float32)
    gt = (rs.rand(b, hw, hw, c) > 0.5).astype(np.float32)
    return jnp.asarray(pr), jnp.asarray(gt)


@pytest.fixture(scope="module")
def ref_functional():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_smp_functional",
        "/root/reference/segmentation_models_pytorch/utils/functional.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parity
@pytest.mark.parametrize("name", ["iou", "f_score", "accuracy",
                                  "precision", "recall"])
def test_scores_match_reference(ref_functional, name):
    import torch
    pr, gt = _rand(0)
    ours = getattr(U, name)(pr, gt, threshold=0.5)
    # reference works on NCHW but the formulas are layout-free reductions
    theirs = getattr(ref_functional, name)(
        torch.tensor(np.asarray(pr)), torch.tensor(np.asarray(gt)),
        threshold=0.5)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)


def test_ignore_channels():
    pr, gt = _rand(1, c=4)
    full = U.iou(pr, gt, threshold=0.5)
    sub = U.iou(pr, gt, threshold=0.5, ignore_channels=[0, 2])
    assert float(full) != float(sub)


def test_metric_objects_have_names():
    assert U.IoU().name == "iou_score"
    assert U.Fscore().name == "fscore"
    pr, gt = _rand(2)
    assert 0 <= float(U.IoU()(pr, gt)) <= 1


def test_average_value_meter():
    m = U.AverageValueMeter()
    for v in [1.0, 2.0, 3.0]:
        m.add(v)
    assert m.mean == pytest.approx(2.0)
    assert m.std == pytest.approx(1.0)


def test_epoch_runners_train_and_valid():
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = self.param("w", nn.initializers.normal(0.1),
                           (1, 1, x.shape[-1], 2), jnp.float32)
            from senas_tpu.ops.primitives import conv2d
            return jax.nn.sigmoid(conv2d(x, w))

    model = Tiny()
    rs = np.random.RandomState(0)
    xs = rs.rand(4, 8, 8, 1).astype(np.float32)
    ys = (rs.rand(4, 8, 8, 2) > 0.5).astype(np.float32)
    loader = [(xs[i:i + 2], ys[i:i + 2]) for i in range(0, 4, 2)]
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(xs))

    def bce(pred, y):
        p = jnp.clip(pred, 1e-6, 1 - 1e-6)
        return -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p)).mean()

    import optax
    trainer = U.TrainEpoch(lambda v, x: model.apply(v, x), variables, bce,
                           [U.IoU(), U.Fscore()], optax.sgd(0.5))
    logs0 = trainer.run(loader)
    for _ in range(10):
        logs1 = trainer.run(loader)
    assert logs1["loss"] < logs0["loss"]
    assert set(logs1) == {"loss", "iou_score", "fscore"}

    valid = U.ValidEpoch(lambda v, x: model.apply(v, x), trainer.params, bce,
                         [U.IoU()])
    vlogs = valid.run(loader)
    assert set(vlogs) == {"loss", "iou_score"}


# ---------------------------------------------------------------------------
# customize.py legacy modules
# ---------------------------------------------------------------------------

def test_gram_matrix():
    from senas_tpu.utils.customize import gram_matrix
    rs = np.random.RandomState(0)
    y = jnp.asarray(rs.rand(2, 4, 4, 3).astype(np.float32))
    g = gram_matrix(y)
    assert g.shape == (2, 3, 3)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g[0]).T, rtol=1e-6)


def test_normalize():
    from senas_tpu.utils.customize import normalize
    x = jnp.asarray([[3.0, 4.0]])
    out = normalize(x, p=2.0, axis=-1)
    np.testing.assert_allclose(np.asarray(out), [[0.6, 0.8]], rtol=1e-6)


def test_pyramid_pooling_shapes():
    from senas_tpu.utils.customize import PyramidPooling
    mod = PyramidPooling(in_channels=8)
    x = jnp.ones((1, 12, 12, 8))
    v = mod.init({"params": jax.random.PRNGKey(0)}, x, False)
    out = mod.apply(v, x, False)
    assert out.shape == (1, 12, 12, 8 + 4 * 2)  # input + 4 branches of C/4
