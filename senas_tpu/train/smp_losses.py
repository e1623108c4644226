"""smp-parity segmentation loss family, re-designed as pure jnp functions.

Parity targets: /root/reference/segmentation_models_pytorch/losses/
(dice.py, jaccard.py, tversky.py, focal.py, lovasz.py, soft_bce.py,
soft_ce.py and the _functional.py score helpers). Same math, same default
hyperparameters, same non-empty-class masking rules — but NHWC-first
(y_pred [B, H, W, C]) and branch-free where the reference filters with
boolean indexing (ignore_index handling is expressed with masks so every
loss stays jit-compatible with static shapes).

Modes follow the smp constants: "binary" (y_pred [B,H,W] or [B,H,W,1]),
"multiclass" (y_pred [B,H,W,C], y_true int [B,H,W]), "multilabel"
(y_pred/y_true [B,H,W,C]).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

BINARY_MODE = "binary"
MULTICLASS_MODE = "multiclass"
MULTILABEL_MODE = "multilabel"
_MODES = (BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE)


# ---------------------------------------------------------------------------
# Score helpers (_functional.py:153-194)
# ---------------------------------------------------------------------------

def soft_dice_score(output, target, smooth=0.0, eps=1e-7, axis=None):
    intersection = jnp.sum(output * target, axis=axis)
    cardinality = jnp.sum(output + target, axis=axis)
    return (2.0 * intersection + smooth) / jnp.clip(cardinality + smooth, eps)


def soft_jaccard_score(output, target, smooth=0.0, eps=1e-7, axis=None):
    intersection = jnp.sum(output * target, axis=axis)
    cardinality = jnp.sum(output + target, axis=axis)
    union = cardinality - intersection
    return (intersection + smooth) / jnp.clip(union + smooth, eps)


def soft_tversky_score(output, target, alpha, beta, smooth=0.0, eps=1e-7,
                       axis=None):
    tp = jnp.sum(output * target, axis=axis)
    fp = jnp.sum(output * (1.0 - target), axis=axis)
    fn = jnp.sum((1.0 - output) * target, axis=axis)
    return (tp + smooth) / jnp.clip(tp + alpha * fp + beta * fn + smooth, eps)


# ---------------------------------------------------------------------------
# Layout: bring (y_pred, y_true) to [B, C, P] / [B, C, P] like the reference
# flattening (dice.py:73-105), from NHWC inputs.
# ---------------------------------------------------------------------------

def _flatten(mode: str, y_pred, y_true, from_logits: bool,
             ignore_index: Optional[int]):
    if mode == BINARY_MODE:
        if y_pred.ndim == 4 and y_pred.shape[-1] == 1:
            y_pred = y_pred[..., 0]
        if y_true.ndim == 4 and y_true.shape[-1] == 1:
            y_true = y_true[..., 0]
        if from_logits:
            y_pred = jnp.exp(jax.nn.log_sigmoid(y_pred))
        b = y_pred.shape[0]
        y_pred = y_pred.reshape(b, 1, -1)
        y_true = y_true.reshape(b, 1, -1).astype(y_pred.dtype)
        if ignore_index is not None:
            mask = (y_true != ignore_index).astype(y_pred.dtype)
            y_pred = y_pred * mask
            y_true = y_true * mask
        return y_pred, y_true

    if mode == MULTICLASS_MODE:
        if from_logits:
            y_pred = jnp.exp(jax.nn.log_softmax(y_pred, axis=-1))
        b, c = y_pred.shape[0], y_pred.shape[-1]
        y_pred = jnp.moveaxis(y_pred.reshape(b, -1, c), -1, 1)  # [B, C, P]
        y_true = y_true.reshape(b, -1)
        if ignore_index is not None:
            mask = (y_true != ignore_index)
            y_pred = y_pred * mask[:, None].astype(y_pred.dtype)
            oh = jax.nn.one_hot(jnp.where(mask, y_true, 0), c,
                                dtype=y_pred.dtype)
            y_true = jnp.moveaxis(oh, -1, 1) * mask[:, None].astype(y_pred.dtype)
        else:
            y_true = jnp.moveaxis(
                jax.nn.one_hot(y_true, c, dtype=y_pred.dtype), -1, 1)
        return y_pred, y_true

    if mode == MULTILABEL_MODE:
        if from_logits:
            y_pred = jnp.exp(jax.nn.log_sigmoid(y_pred))
        b, c = y_pred.shape[0], y_pred.shape[-1]
        y_pred = jnp.moveaxis(y_pred.reshape(b, -1, c), -1, 1)
        y_true = jnp.moveaxis(y_true.reshape(b, -1, c), -1, 1).astype(y_pred.dtype)
        if ignore_index is not None:
            mask = (y_true != ignore_index).astype(y_pred.dtype)
            y_pred = y_pred * mask
            y_true = y_true * mask
        return y_pred, y_true

    raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")


# ---------------------------------------------------------------------------
# Dice / Jaccard / Tversky (dice.py:12-131, jaccard.py, tversky.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiceLoss:
    mode: str = MULTICLASS_MODE
    classes: Optional[Tuple[int, ...]] = None
    log_loss: bool = False
    from_logits: bool = True
    smooth: float = 0.0
    ignore_index: Optional[int] = None
    eps: float = 1e-7

    def _score(self, y_pred, y_true, axis):
        return soft_dice_score(y_pred, y_true, self.smooth, self.eps, axis)

    def _aggregate(self, loss):
        return loss.mean()

    def __call__(self, y_pred, y_true):
        y_pred, y_true = _flatten(self.mode, y_pred, y_true, self.from_logits,
                                  self.ignore_index)
        axis = (0, 2)
        scores = self._score(y_pred, y_true, axis)
        if self.log_loss:
            loss = -jnp.log(jnp.clip(scores, self.eps))
        else:
            loss = 1.0 - scores
        # zero channels without any true pixels (dice.py:117-121)
        present = (y_true.sum(axis=axis) > 0).astype(loss.dtype)
        loss = loss * present
        if self.classes is not None:
            loss = loss[jnp.asarray(self.classes)]
        return self._aggregate(loss)


@dataclasses.dataclass(frozen=True)
class JaccardLoss(DiceLoss):
    def _score(self, y_pred, y_true, axis):
        return soft_jaccard_score(y_pred, y_true, self.smooth, self.eps, axis)


@dataclasses.dataclass(frozen=True)
class TverskyLoss(DiceLoss):
    alpha: float = 0.5
    beta: float = 0.5
    gamma: float = 1.0

    def _score(self, y_pred, y_true, axis):
        return soft_tversky_score(y_pred, y_true, self.alpha, self.beta,
                                  self.smooth, self.eps, axis)

    def _aggregate(self, loss):
        return loss.mean() ** self.gamma


# ---------------------------------------------------------------------------
# Focal (focal.py, _functional.py:36-97)
# ---------------------------------------------------------------------------

def focal_loss_with_logits(output, target, gamma=2.0, alpha=0.25,
                           reduction="mean", normalized=False,
                           reduced_threshold=None, eps=1e-6, valid=None):
    """Binary focal loss; `valid` is the jit-friendly stand-in for the
    reference's boolean-index filtering of ignore_index pixels."""
    target = target.astype(output.dtype)
    # BCE-with-logits, elementwise
    logpt = jnp.maximum(output, 0) - output * target + jnp.log1p(
        jnp.exp(-jnp.abs(output)))
    pt = jnp.exp(-logpt)
    if reduced_threshold is None:
        focal_term = (1.0 - pt) ** gamma
    else:
        focal_term = jnp.where(pt < reduced_threshold, 1.0,
                               ((1.0 - pt) / reduced_threshold) ** gamma)
    loss = focal_term * logpt
    if alpha is not None:
        loss = loss * (alpha * target + (1 - alpha) * (1 - target))
    if valid is not None:
        loss = loss * valid
        focal_term = focal_term * valid
    if normalized:
        loss = loss / jnp.clip(focal_term.sum(), eps)
    if reduction == "mean":
        if valid is not None:
            return loss.sum() / jnp.clip(valid.sum(), 1.0)
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "batchwise_mean":
        return loss.sum(0)
    return loss


@dataclasses.dataclass(frozen=True)
class FocalLoss:
    mode: str = MULTICLASS_MODE
    alpha: Optional[float] = None
    gamma: float = 2.0
    ignore_index: Optional[int] = None
    reduction: str = "mean"
    normalized: bool = False
    reduced_threshold: Optional[float] = None

    def __call__(self, y_pred, y_true):
        kw = dict(gamma=self.gamma, alpha=self.alpha, reduction=self.reduction,
                  normalized=self.normalized,
                  reduced_threshold=self.reduced_threshold)
        if self.mode in (BINARY_MODE, MULTILABEL_MODE):
            yp = y_pred.reshape(-1)
            yt = y_true.reshape(-1)
            valid = None
            if self.ignore_index is not None:
                valid = (yt != self.ignore_index).astype(yp.dtype)
                yt = jnp.where(yt == self.ignore_index, 0, yt)
            return focal_loss_with_logits(yp, yt, valid=valid, **kw)
        # multiclass: per-class binary focal, summed (focal.py:72-89)
        c = y_pred.shape[-1]
        valid = None
        if self.ignore_index is not None:
            valid = (y_true != self.ignore_index).astype(y_pred.dtype).reshape(-1)
        total = 0.0
        for cls in range(c):
            cls_true = (y_true == cls).astype(y_pred.dtype).reshape(-1)
            cls_pred = y_pred[..., cls].reshape(-1)
            total = total + focal_loss_with_logits(cls_pred, cls_true,
                                                   valid=valid, **kw)
        return total


# ---------------------------------------------------------------------------
# SoftBCE / SoftCE (soft_bce.py, soft_ce.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SoftBCEWithLogitsLoss:
    ignore_index: Optional[int] = -100
    reduction: str = "mean"
    smooth_factor: Optional[float] = None
    pos_weight: Optional[float] = None

    def __call__(self, y_pred, y_true):
        y_true = y_true.astype(y_pred.dtype)
        if self.smooth_factor is not None:
            soft = (1 - y_true) * self.smooth_factor + y_true * (1 - self.smooth_factor)
        else:
            soft = y_true
        logpt = jnp.maximum(y_pred, 0) - y_pred * soft + jnp.log1p(
            jnp.exp(-jnp.abs(y_pred)))
        if self.pos_weight is not None:
            # BCEWithLogits pos_weight: weight on the positive term
            log_sig = jax.nn.log_sigmoid(y_pred)
            log_one_minus = jax.nn.log_sigmoid(-y_pred)
            logpt = -(self.pos_weight * soft * log_sig + (1 - soft) * log_one_minus)
        if self.ignore_index is not None:
            logpt = logpt * (y_true != self.ignore_index).astype(logpt.dtype)
        if self.reduction == "mean":
            return logpt.mean()
        if self.reduction == "sum":
            return logpt.sum()
        return logpt


@dataclasses.dataclass(frozen=True)
class SoftCrossEntropyLoss:
    reduction: str = "mean"
    smooth_factor: Optional[float] = None
    ignore_index: Optional[int] = -100

    def __call__(self, y_pred, y_true):
        """y_pred [B,H,W,C] logits; y_true [B,H,W] int."""
        lprobs = jax.nn.log_softmax(y_pred, axis=-1)
        if self.ignore_index is not None:
            pad = y_true == self.ignore_index
            tgt = jnp.where(pad, 0, y_true)
        else:
            pad = None
            tgt = y_true
        nll = -jnp.take_along_axis(lprobs, tgt[..., None], axis=-1)[..., 0]
        smooth = -lprobs.sum(axis=-1)
        if pad is not None:
            nll = jnp.where(pad, 0.0, nll)
            smooth = jnp.where(pad, 0.0, smooth)
        if self.reduction == "mean":
            nll, smooth = nll.mean(), smooth.mean()
        elif self.reduction == "sum":
            nll, smooth = nll.sum(), smooth.sum()
        eps = self.smooth_factor or 0.0
        eps_i = eps / y_pred.shape[-1]
        return (1.0 - eps) * nll + eps_i * smooth


# ---------------------------------------------------------------------------
# Lovasz (lovasz.py:22-139)
# ---------------------------------------------------------------------------

def _lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors (Alg. 1)."""
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted, 0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, 0)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def _lovasz_hinge_flat(logits, labels, valid=None):
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    if valid is not None:
        # ignored pixels sort last and contribute zero
        errors = jnp.where(valid > 0, errors, -jnp.inf)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = labels[order]
    if valid is not None:
        v_sorted = valid[order]
        gts = (gt_sorted * v_sorted).sum()
        intersection = gts - jnp.cumsum(gt_sorted * v_sorted, 0)
        union = gts + jnp.cumsum((1.0 - gt_sorted) * v_sorted, 0)
        jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        return jnp.dot(jax.nn.relu(errors_sorted) * v_sorted, grad)
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


def _lovasz_softmax_flat(probas, labels, valid=None):
    """probas [P, C], labels [P] int. 'present' class averaging."""
    c = probas.shape[1]
    losses, present = [], []
    for cls in range(c):
        fg = (labels == cls).astype(probas.dtype)
        if valid is not None:
            fg = fg * valid
        errors = jnp.abs(fg - probas[:, cls])
        if valid is not None:
            errors = jnp.where(valid > 0, errors, -jnp.inf)
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        if valid is not None:
            v_sorted = valid[order]
            gts = fg_sorted.sum()
            inter = gts - jnp.cumsum(fg_sorted, 0)
            union = gts + jnp.cumsum((1.0 - fg_sorted) * v_sorted, 0)
            jac = 1.0 - inter / jnp.maximum(union, 1e-12)
            grad = jnp.concatenate([jac[:1], jac[1:] - jac[:-1]])
            losses.append(jnp.dot(jnp.where(v_sorted > 0, errors_sorted, 0.0),
                                  grad))
        else:
            losses.append(jnp.dot(errors_sorted, _lovasz_grad(fg_sorted)))
        present.append((fg.sum() > 0).astype(probas.dtype))
    losses = jnp.stack(losses)
    present = jnp.stack(present)
    return (losses * present).sum() / jnp.maximum(present.sum(), 1.0)


@dataclasses.dataclass(frozen=True)
class LovaszLoss:
    mode: str = MULTICLASS_MODE
    per_image: bool = False
    ignore_index: Optional[int] = None
    from_logits: bool = True

    def __call__(self, y_pred, y_true):
        if self.mode in (BINARY_MODE, MULTILABEL_MODE):
            if y_pred.ndim == 4 and y_pred.shape[-1] == 1:
                y_pred = y_pred[..., 0]
            labels = y_true.reshape(y_true.shape[0], -1).astype(y_pred.dtype)
            logits = y_pred.reshape(y_pred.shape[0], -1)
            valid = None
            if self.ignore_index is not None:
                valid = (labels != self.ignore_index).astype(y_pred.dtype)
                labels = jnp.where(valid > 0, labels, 0.0)
            if self.per_image:
                fn = lambda lg, lb, v: _lovasz_hinge_flat(lg, lb, v)
                if valid is None:
                    per = jax.vmap(lambda lg, lb: _lovasz_hinge_flat(lg, lb))(
                        logits, labels)
                else:
                    per = jax.vmap(fn)(logits, labels, valid)
                return per.mean()
            return _lovasz_hinge_flat(
                logits.reshape(-1), labels.reshape(-1),
                valid.reshape(-1) if valid is not None else None)

        # multiclass
        probas = jax.nn.softmax(y_pred, axis=-1) if self.from_logits else y_pred
        b, c = probas.shape[0], probas.shape[-1]
        flat_p = probas.reshape(b, -1, c)
        flat_l = y_true.reshape(b, -1)
        valid = None
        if self.ignore_index is not None:
            valid = (flat_l != self.ignore_index).astype(probas.dtype)
            flat_l = jnp.where(valid > 0, flat_l, 0)
        if self.per_image:
            if valid is None:
                per = jax.vmap(lambda p, l: _lovasz_softmax_flat(p, l))(
                    flat_p, flat_l)
            else:
                per = jax.vmap(_lovasz_softmax_flat)(flat_p, flat_l, valid)
            return per.mean()
        return _lovasz_softmax_flat(
            flat_p.reshape(-1, c), flat_l.reshape(-1),
            valid.reshape(-1) if valid is not None else None)


__all__ = [
    "BINARY_MODE", "MULTICLASS_MODE", "MULTILABEL_MODE",
    "soft_dice_score", "soft_jaccard_score", "soft_tversky_score",
    "DiceLoss", "JaccardLoss", "TverskyLoss", "FocalLoss", "LovaszLoss",
    "SoftBCEWithLogitsLoss", "SoftCrossEntropyLoss",
    "focal_loss_with_logits",
]
