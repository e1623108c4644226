"""smp-parity training utilities: score functions, metric objects, meters,
and Train/Valid epoch runners.

Parity targets: segmentation_models_pytorch/utils/{functional,metrics,
meter,epoch}.py — same formulas (global soft scores with eps smoothing,
optional binarization threshold, channel exclusion) and the same epoch
contract (runner(dataloader) -> {"<loss name>": v, "<metric name>": v}),
re-designed on jitted step functions instead of a per-batch autograd loop.
NHWC: y_pred/y_true are [B, H, W, C] probability/one-hot tensors.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import optax


def _threshold(x, threshold: Optional[float]):
    if threshold is None:
        return x
    return (x > threshold).astype(x.dtype)


def _take_channels(*xs, ignore_channels: Optional[Sequence[int]] = None):
    if ignore_channels is None:
        return xs
    keep = [c for c in range(xs[0].shape[-1]) if c not in ignore_channels]
    idx = jnp.asarray(keep)
    return tuple(jnp.take(x, idx, axis=-1) for x in xs)


def iou(pr, gt, eps=1e-7, threshold=None, ignore_channels=None):
    pr = _threshold(pr, threshold)
    pr, gt = _take_channels(pr, gt, ignore_channels=ignore_channels)
    intersection = jnp.sum(gt * pr)
    union = jnp.sum(gt) + jnp.sum(pr) - intersection + eps
    return (intersection + eps) / union


jaccard = iou


def f_score(pr, gt, beta=1.0, eps=1e-7, threshold=None, ignore_channels=None):
    pr = _threshold(pr, threshold)
    pr, gt = _take_channels(pr, gt, ignore_channels=ignore_channels)
    tp = jnp.sum(gt * pr)
    fp = jnp.sum(pr) - tp
    fn = jnp.sum(gt) - tp
    return (((1 + beta ** 2) * tp + eps)
            / ((1 + beta ** 2) * tp + beta ** 2 * fn + fp + eps))


def accuracy(pr, gt, threshold=0.5, ignore_channels=None):
    pr = _threshold(pr, threshold)
    pr, gt = _take_channels(pr, gt, ignore_channels=ignore_channels)
    tp = jnp.sum((gt == pr).astype(pr.dtype))
    return tp / gt.size


def precision(pr, gt, eps=1e-7, threshold=None, ignore_channels=None):
    pr = _threshold(pr, threshold)
    pr, gt = _take_channels(pr, gt, ignore_channels=ignore_channels)
    tp = jnp.sum(gt * pr)
    fp = jnp.sum(pr) - tp
    return (tp + eps) / (tp + fp + eps)


def recall(pr, gt, eps=1e-7, threshold=None, ignore_channels=None):
    pr = _threshold(pr, threshold)
    pr, gt = _take_channels(pr, gt, ignore_channels=ignore_channels)
    tp = jnp.sum(gt * pr)
    fn = jnp.sum(gt) - tp
    return (tp + eps) / (tp + fn + eps)


@dataclasses.dataclass(frozen=True)
class Metric:
    """Named metric callable; `name` keys the epoch logs."""

    fn: Callable
    name: str
    kwargs: Tuple[Tuple[str, object], ...] = ()

    def __call__(self, y_pr, y_gt):
        return self.fn(y_pr, y_gt, **dict(self.kwargs))


def IoU(eps=1e-7, threshold=0.5, ignore_channels=None):
    return Metric(iou, "iou_score",
                  (("eps", eps), ("threshold", threshold),
                   ("ignore_channels", ignore_channels)))


def Fscore(beta=1.0, eps=1e-7, threshold=0.5, ignore_channels=None):
    return Metric(f_score, "fscore",
                  (("beta", beta), ("eps", eps), ("threshold", threshold),
                   ("ignore_channels", ignore_channels)))


def Accuracy(threshold=0.5, ignore_channels=None):
    return Metric(accuracy, "accuracy",
                  (("threshold", threshold),
                   ("ignore_channels", ignore_channels)))


def Precision(eps=1e-7, threshold=0.5, ignore_channels=None):
    return Metric(precision, "precision",
                  (("eps", eps), ("threshold", threshold),
                   ("ignore_channels", ignore_channels)))


def Recall(eps=1e-7, threshold=0.5, ignore_channels=None):
    return Metric(recall, "recall",
                  (("eps", eps), ("threshold", threshold),
                   ("ignore_channels", ignore_channels)))


class AverageValueMeter:
    """meter.py parity: running mean/std of scalar updates."""

    def __init__(self):
        self.reset()

    def add(self, value, n: int = 1):
        self.n += n
        self.sum += value * n
        self.sum_sq += (value ** 2) * n

    @property
    def mean(self):
        return self.sum / max(self.n, 1)

    @property
    def std(self):
        if self.n < 2:
            return float("nan")
        var = (self.sum_sq - self.n * self.mean ** 2) / (self.n - 1)
        return float(np.sqrt(max(var, 0.0)))

    def reset(self):
        self.n = 0
        self.sum = 0.0
        self.sum_sq = 0.0


class _Epoch:
    """Shared epoch contract (epoch.py:69-120): iterate a loader of
    (x [B,H,W,C] float, y [B,H,W,C] float one-hot) numpy pairs, return
    {"loss": mean, metric.name: mean, ...}."""

    def __init__(self, loss, metrics: Sequence[Metric], verbose: bool = True):
        self.loss = loss
        self.metrics = list(metrics)
        self.verbose = verbose

    def _batch(self, x, y):
        raise NotImplementedError

    def run(self, dataloader) -> Dict[str, float]:
        loss_meter = AverageValueMeter()
        metric_meters = {m.name: AverageValueMeter() for m in self.metrics}
        for x, y in dataloader:
            loss_v, y_pred = self._batch(jnp.asarray(x), jnp.asarray(y))
            loss_meter.add(float(loss_v))
            for m in self.metrics:
                metric_meters[m.name].add(float(m(y_pred, jnp.asarray(y))))
        logs = {"loss": loss_meter.mean}
        logs.update({k: v.mean for k, v in metric_meters.items()})
        return logs


class ValidEpoch(_Epoch):
    """No-grad forward per batch (epoch.py:94-120)."""

    def __init__(self, apply_fn, variables, loss, metrics, verbose=True):
        super().__init__(loss, metrics, verbose)
        self._step = jax.jit(
            lambda x, y: ((lambda p: (self.loss(p, y), p))(
                apply_fn(variables, x))))

    def _batch(self, x, y):
        loss_v, pred = self._step(x, y)
        return loss_v, pred


class TrainEpoch(_Epoch):
    """Forward + backward + optax update per batch (epoch.py:69-91)."""

    def __init__(self, apply_fn, variables, loss, metrics,
                 tx: optax.GradientTransformation, verbose=True):
        super().__init__(loss, metrics, verbose)
        self.apply_fn = apply_fn
        self.params = variables
        self.tx = tx
        self.opt_state = tx.init(variables)

        def step(params, opt_state, x, y):
            def loss_fn(p):
                pred = apply_fn(p, x)
                return self.loss(pred, y), pred

            (loss_v, pred), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss_v, pred

        self._step = jax.jit(step)

    def _batch(self, x, y):
        self.params, self.opt_state, loss_v, pred = self._step(
            self.params, self.opt_state, x, y)
        return loss_v, pred
