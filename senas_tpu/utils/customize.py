"""Legacy NN helper modules inherited from the NasUnet skeleton.

Parity target: /root/reference/utils/customize.py (GramMatrix, View, Sum,
Mean, Normalize, ConcurrentModule, PyramidPooling). Nothing in the
framework imports these at runtime — same as the reference — but they are
part of its utils surface. jnp/NHWC throughout; PyramidPooling is the PSP
block (Zhao et al.) with adaptive pools at 1/2/3/6.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.ops.primitives import build_norm, conv2d, kaiming_normal, relu


def gram_matrix(y: jnp.ndarray) -> jnp.ndarray:
    """Gram matrix of NHWC feature maps: [B, C, C] / (C*H*W)."""
    b, h, w, c = y.shape
    feats = y.reshape(b, h * w, c)
    return jnp.einsum("bpc,bpd->bcd", feats, feats) / (c * h * w)


def view(x: jnp.ndarray, *shape) -> jnp.ndarray:
    return x.reshape(shape)


def reduce_sum(x: jnp.ndarray, axis, keepdims: bool = False) -> jnp.ndarray:
    return x.sum(axis=axis, keepdims=keepdims)


def reduce_mean(x: jnp.ndarray, axis, keepdims: bool = False) -> jnp.ndarray:
    return x.mean(axis=axis, keepdims=keepdims)


def normalize(x: jnp.ndarray, p: float = 2.0, axis: int = -1,
              eps: float = 1e-8) -> jnp.ndarray:
    """F.normalize: x / max(||x||_p, eps) along `axis`."""
    norm = jnp.sum(jnp.abs(x) ** p, axis=axis, keepdims=True) ** (1.0 / p)
    return x / jnp.maximum(norm, eps)


class ConcurrentModule(nn.Module):
    """Feed x to every branch, concatenate outputs on the channel axis."""

    branches: Sequence[Callable]

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        outs = [branch(x, *args, **kwargs) for branch in self.branches]
        return jnp.concatenate(outs, axis=-1)


def adaptive_avg_pool(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d((size, size)) on NHWC via equal-region means when
    divisible, bilinear-resize fallback otherwise."""
    b, h, w, c = x.shape
    if h % size == 0 and w % size == 0:
        return x.reshape(b, size, h // size, size, w // size, c).mean(axis=(2, 4))
    return jax.image.resize(x, (b, size, size, c), method="linear")


class PyramidPooling(nn.Module):
    """PSPNet pyramid pooling: pools at 1/2/3/6 + 1x1 conv-bn-relu each,
    bilinear-upsampled and concatenated with the input (customize.py:115+)."""

    in_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        out_c = self.in_channels // 4
        feats = [x]
        for i, size in enumerate((1, 2, 3, 6)):
            y = adaptive_avg_pool(x, size)
            kern = self.param(f"conv{i + 1}", kaiming_normal,
                              (1, 1, c, out_c), jnp.float32)
            y = conv2d(y, kern.astype(y.dtype))
            y = build_norm(self.dtype, name=f"bn{i + 1}")(
                y, use_running_average=not train)
            y = relu(y)
            feats.append(jax.image.resize(y, (b, h, w, out_c),
                                          method="bilinear"))
        return jnp.concatenate(feats, axis=-1)
