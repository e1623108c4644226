"""Segmentation losses as pure jnp functions (NHWC logits).

Numerics match the reference (/root/reference/utils/loss/loss.py):
  * soft dice: softmax over classes, tp/fp/fn reduced over batch+spatial
    (batch dice), background excluded (do_bg=False), smooth 1e-5, extra 1e-8
    in the denominator (loss.py:45-70).
  * squared-denominator variant (loss.py:73-121).
  * cross-entropy: mean over all pixels (torch nn.CrossEntropyLoss default).
  * dice_ce = ce + dice (loss.py:124-159); deep-supervision mean over heads
    (loss.py:30-42).

Loss name dispatch parity: cross_entropy / dice_ce / dice_sq_ce / dice_loss /
dice_square (loss.py:7-27). All functions take `logits` [B,H,W,C] (or a list
of such for deep supervision) and integer `target` [B,H,W].
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Union

import jax
import jax.numpy as jnp

Logits = Union[jax.Array, Sequence[jax.Array]]


def cross_entropy(logits: jax.Array, target: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def _one_hot(target: jax.Array, nclass: int, dtype) -> jax.Array:
    return jax.nn.one_hot(target, nclass, dtype=dtype)


def soft_dice_loss(logits: jax.Array, target: jax.Array,
                   do_bg: bool = False, smooth: float = 1e-5) -> jax.Array:
    nclass = logits.shape[-1]
    x = jax.nn.softmax(logits, axis=-1)
    y = _one_hot(target, nclass, x.dtype)
    axes = (0, 1, 2)  # batch + spatial => per-class counts
    tp = jnp.sum(x * y, axis=axes)
    fp = jnp.sum(x * (1 - y), axis=axes)
    fn = jnp.sum((1 - x) * y, axis=axes)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth + 1e-8)
    if not do_bg:
        dc = dc[1:]
    return 1 - jnp.mean(dc)


def soft_dice_loss_squared(logits: jax.Array, target: jax.Array,
                           do_bg: bool = False, smooth: float = 1e-5) -> jax.Array:
    nclass = logits.shape[-1]
    x = jax.nn.softmax(logits, axis=-1)
    y = jax.lax.stop_gradient(_one_hot(target, nclass, x.dtype))
    axes = (0, 1, 2)
    intersect = jnp.sum(x * y, axis=axes) + smooth
    denominator = jnp.sum(x ** 2 + y ** 2, axis=axes) + smooth
    dc = 2 * intersect / denominator
    if not do_bg:
        dc = dc[1:]
    return 1 - jnp.mean(dc)


def dice_ce_loss(logits: jax.Array, target: jax.Array, square_dice: bool = False) -> jax.Array:
    dice = soft_dice_loss_squared(logits, target) if square_dice else soft_dice_loss(logits, target)
    return cross_entropy(logits, target) + dice


def _smp(cls_name: str, with_mode: bool = True, **kw):
    """Lazy adapters for the smp loss family (train/smp_losses.py) — the
    reference exposes those classes under segmentation_models_pytorch.losses;
    here they are reachable through the same loss-name config surface.
    All operate on multiclass NHWC logits + int label maps."""
    def make(logits, target):
        from senas_tpu.train import smp_losses
        cls = getattr(smp_losses, cls_name)
        loss = cls(mode="multiclass", **kw) if with_mode else cls(**kw)
        return loss(logits, target)
    return make


_LOSSES = {
    "cross_entropy": cross_entropy,
    "dice_ce": lambda lg, tg: dice_ce_loss(lg, tg, square_dice=False),
    "dice_sq_ce": lambda lg, tg: dice_ce_loss(lg, tg, square_dice=True),
    "dice_loss": soft_dice_loss,
    "dice_square": soft_dice_loss_squared,
    # smp family (segmentation_models_pytorch/losses)
    "smp_dice": _smp("DiceLoss"),
    "smp_jaccard": _smp("JaccardLoss"),
    "smp_tversky": _smp("TverskyLoss", alpha=0.3, beta=0.7),
    "smp_focal": _smp("FocalLoss", alpha=0.25),
    "smp_lovasz": _smp("LovaszLoss"),
    "smp_soft_ce": _smp("SoftCrossEntropyLoss", with_mode=False, smooth_factor=0.1),
}


def segmentation_loss(name: str, outputs: Logits, target: jax.Array) -> jax.Array:
    """SegmentationLosses: applies the loss to the LAST head (loss.py:26-27)."""
    fn = _LOSSES[name]
    if isinstance(outputs, (list, tuple)):
        outputs = outputs[-1]
    return fn(outputs, target)


def multi_segmentation_loss(name: str, outputs: Sequence[jax.Array], target: jax.Array,
                            weight_factors: Sequence[float] = None) -> jax.Array:
    """Deep-supervision mean over heads (loss.py:30-42)."""
    fn = _LOSSES[name]
    if weight_factors is None:
        weight_factors = [1.0] * len(outputs)
    total = sum(w * fn(ot, target) for w, ot in zip(weight_factors, outputs))
    return total / len(outputs)


def build_loss(name: str, supervision: bool = False,
               depth: int = None) -> Callable[[Logits, jax.Array], jax.Array]:
    """Loss factory mirroring the CLI wiring (search_arc.py:100-107)."""
    if name not in _LOSSES:
        raise NotImplementedError(f"loss {name!r}")
    if supervision:
        return lambda outputs, target: multi_segmentation_loss(name, outputs, target)
    return lambda outputs, target: segmentation_loss(name, outputs, target)
