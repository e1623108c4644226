"""Segmentation metrics: pixAcc / mIoU / Dice (percent, background excluded).

Numerics match the reference (/root/reference/utils/metrics.py):
  * per-batch confusion counts (tp, fp, fn) per foreground class from the
    softmax-argmax prediction (metrics.py:145-162);
  * `mean_pix_accuracy` reproduces the reference's bitwise-AND formulation
    (metrics.py:127-142), including its semantics for multi-class labels;
  * the accumulator sums counts across batches and reports
    (2tp+eps)/(2tp+fp+fn+eps) style percentages (metrics.py:48-64).

The device-side part (`confusion_counts`, `mean_pix_accuracy`) is pure jnp —
call it inside a jitted eval step; the host-side `SegmentationMetric`
accumulates numpy scalars.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SMOOTH = float(np.spacing(1))


def confusion_counts(logits: jax.Array, label: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-foreground-class (tp, fp, fn), summed over batch+spatial.

    logits: [B,H,W,C]; label: [B,H,W] int. Returns three [C-1] arrays.
    """
    nclass = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    classes = jnp.arange(1, nclass)[:, None, None, None]  # [C-1,1,1,1]
    pred_is = pred[None] == classes
    label_is = label[None] == classes
    tp = jnp.sum(pred_is & label_is, axis=(1, 2, 3)).astype(jnp.float32)
    fp = jnp.sum(pred_is & ~label_is, axis=(1, 2, 3)).astype(jnp.float32)
    fn = jnp.sum(~pred_is & label_is, axis=(1, 2, 3)).astype(jnp.float32)
    return tp, fp, fn


def mean_pix_accuracy(logits: jax.Array, label: jax.Array) -> jax.Array:
    """Reference mean_pix_accuracy (metrics.py:127-142): per-image
    (bitwise_and(pred, label>0).sum + eps) / ((label>0).sum + eps), averaged."""
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    labeled = (label > 0).astype(jnp.int32)
    correct = jnp.bitwise_and(pred, labeled).astype(jnp.float32).sum(axis=(1, 2))
    total = labeled.astype(jnp.float32).sum(axis=(1, 2))
    return jnp.mean((correct + SMOOTH) / (total + SMOOTH))


def percentage(value, dec: int = 3) -> float:
    value = np.mean(np.asarray(value, dtype=np.float64))
    return round(100.0 * float(value), dec)


class AverageMeter:
    """Running average (utils/metrics.py:74-96)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

    def mloss(self):
        return self.avg

    def mperc(self):
        return percentage(self.avg)


class SegmentationMetric:
    """Accumulates pixAcc / mIoU / Dice across batches (metrics.py:11-71)."""

    def __init__(self, nclass: int):
        self.nclass = nclass
        self.reset()

    def reset(self):
        self.acc = AverageMeter()
        self.tp_total = np.zeros(self.nclass - 1, dtype=np.float64)
        self.fp_total = np.zeros(self.nclass - 1, dtype=np.float64)
        self.fn_total = np.zeros(self.nclass - 1, dtype=np.float64)

    def update(self, label, logits):
        """label: [B,H,W] int; logits: [B,H,W,C] (device or host arrays)."""
        tp, fp, fn = confusion_counts(jnp.asarray(logits), jnp.asarray(label))
        self.update_counts(np.asarray(tp), np.asarray(fp), np.asarray(fn),
                           float(mean_pix_accuracy(jnp.asarray(logits), jnp.asarray(label))))

    def update_counts(self, tp: np.ndarray, fp: np.ndarray, fn: np.ndarray, acc: float):
        """Fast path for jitted eval loops that already computed the counts."""
        self.tp_total += tp
        self.fp_total += fp
        self.fn_total += fn
        self.acc.update(acc)

    def miou(self):
        return (self.tp_total + SMOOTH) / (self.tp_total + self.fp_total + self.fn_total + SMOOTH)

    def dice(self):
        return (2 * self.tp_total + SMOOTH) / (
            2 * self.tp_total + self.fp_total + self.fn_total + SMOOTH)

    def get(self):
        return self.acc.mperc(), percentage(self.miou()), percentage(self.dice())


class RunScore:
    """Confusion-matrix scorer (utils/utils.py:43-90): accumulates an
    n_classes^2 histogram over (true, pred) label maps and reports overall
    accuracy, per-class mean accuracy, mean IoU, frequency-weighted
    accuracy, and the per-class IoU table."""

    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.reset()

    def _hist(self, label_true: np.ndarray, label_pred: np.ndarray) -> np.ndarray:
        n = self.n_classes
        valid = (label_true >= 0) & (label_true < n)
        return np.bincount(
            n * label_true[valid].astype(int) + label_pred[valid],
            minlength=n * n).reshape(n, n)

    def update(self, label_trues, label_preds):
        for lt, lp in zip(label_trues, label_preds):
            self.confusion_matrix += self._hist(np.asarray(lt).ravel(),
                                                np.asarray(lp).ravel())

    def get_scores(self):
        hist = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(hist).sum() / hist.sum()
            per_class_acc = np.diag(hist) / hist.sum(axis=1)
            iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0)
                                  - np.diag(hist))
            freq = hist.sum(axis=1) / hist.sum()
        summary = {
            "Overall Acc": acc,
            "Mean Acc": np.nanmean(per_class_acc),
            "FreqW Acc": (freq[freq > 0] * iu[freq > 0]).sum(),
            "Mean IoU ": np.nanmean(iu),
        }
        return summary, dict(enumerate(iu))

    def reset(self):
        self.confusion_matrix = np.zeros((self.n_classes, self.n_classes))
