"""Baseline-zoo shared blocks (encoder-decoder segmentation models).

Flax/NHWC re-designs of the composition blocks used by the vendored smp
baselines (reference segmentation_models_pytorch/base/): Conv2dReLU
(modules.py:10), SCSE attention (modules.py:50), SegmentationHead
(heads.py:5), ClassificationHead (heads.py:14), and the
encoder->decoder->head composition (base/model.py:13-24).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.ops.primitives import (build_norm, conv2d, kaiming_normal, relu,
                                      torch_conv_bias, upsample2x,
                                      xavier_normal)


class Conv2dReLU(nn.Module):
    """conv -> [BN] -> ReLU."""

    c_out: int
    kernel_size: int = 3
    stride: int = 1
    use_batchnorm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        w = self.param("kernel", kaiming_normal, (k, k, x.shape[-1], self.c_out),
                       jnp.float32)
        x = conv2d(x, w.astype(x.dtype), stride=self.stride)
        if self.use_batchnorm:
            x = build_norm(self.dtype)(x, use_running_average=not train)
        else:
            # torch Conv2d(bias=True) default bias init survives weights_init
            b = self.param("bias", torch_conv_bias(x.shape[-1] * k * k),
                           (self.c_out,), jnp.float32)
            x = x + b.astype(x.dtype)
        return relu(x)


class SCSEModule(nn.Module):
    """Concurrent spatial & channel SE (modules.py:50-73)."""

    reduction: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = max(1, c // self.reduction)
        # channel SE: smp uses 1x1 Conv2d (bias=True) here, so after the
        # reference's weights_init the kernels are kaiming fan_out and the
        # biases keep torch's conv default U(+-1/sqrt(fan_in))
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(mid, kernel_init=kaiming_normal,
                     bias_init=torch_conv_bias(c), dtype=self.dtype)(y)
        y = relu(y)
        y = nn.Dense(c, kernel_init=kaiming_normal,
                     bias_init=torch_conv_bias(mid), dtype=self.dtype)(y)
        cse = x * nn.sigmoid(y)[:, None, None, :]
        # spatial SE (1x1 Conv2d with bias in smp)
        w = self.param("s_kernel", kaiming_normal, (1, 1, c, 1), jnp.float32)
        sb = self.param("s_bias", torch_conv_bias(c), (1,), jnp.float32)
        sse = x * nn.sigmoid(conv2d(x, w.astype(x.dtype)) + sb.astype(x.dtype))
        return cse + sse


class Attention(nn.Module):
    """None | 'scse' dispatch (modules.py:107-119)."""

    attention_type: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        if self.attention_type is None:
            return x
        if self.attention_type == "scse":
            return SCSEModule(dtype=self.dtype)(x)
        raise ValueError(f"unknown attention {self.attention_type!r}")


def upsample_nearest2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def upsample_bilinear(x, factor: int):
    """Bilinear upsample with torch align_corners=True semantics.

    smp's SegmentationHead uses nn.UpsamplingBilinear2d (heads.py:8), which
    is interpolate(mode="bilinear", align_corners=True) — NOT the half-pixel
    convention of jax.image.resize. Caught by the FPN differential-parity
    test (tests/test_zoo_parity.py); affects every head with upsampling > 1
    (FPN upsampling=4, PSPNet upsampling=8)."""
    b, h, w, c = x.shape
    th, tw = h * factor, w * factor
    if h == 1 and w == 1:
        return jnp.broadcast_to(x, (b, th, tw, c))
    ys = jnp.linspace(0.0, h - 1.0, th)
    xs = jnp.linspace(0.0, w - 1.0, tw)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def smp_activation(name: Optional[str]):
    """smp's `Activation` dispatch (base/modules.py:76-105) as a pure fn.

    Channel-axis activations translate NCHW dim=1 to NHWC axis=-1.
    torch's implicit-softmax-dim rule (`nn.Softmax()` with no dim) picks
    dim 1 for 2D/4D tensors — channels in both our layouts — so plain
    "softmax" and "softmax2d" coincide, exactly as they do in torch.
    """
    if name is None or name == "identity":
        return lambda x: x
    if name == "sigmoid":
        return nn.sigmoid
    if name in ("softmax", "softmax2d"):
        return lambda x: nn.softmax(x, axis=-1)
    if name == "logsoftmax":
        return lambda x: nn.log_softmax(x, axis=-1)
    if name == "tanh":
        return jnp.tanh
    if name == "argmax":
        # ArgMax(dim=None) == torch.argmax over the fully-flattened tensor
        return jnp.argmax
    if name == "argmax2d":
        return lambda x: jnp.argmax(x, axis=-1)
    if callable(name):
        return name
    raise ValueError(
        "Activation should be callable/sigmoid/softmax/logsoftmax/tanh/"
        "None; got {}".format(name))


def model_output(model, masks, encoder_features, train: bool = False):
    """Reference SegmentationModel.forward tail (base/model.py:13-24):
    plain models return masks; with `aux_params` set, a ClassificationHead
    over the deepest encoder feature is added and (masks, labels) is
    returned. Masks stay wrapped in the repo's deep-supervision list.

    Called from inside a model's @nn.compact __call__, so the
    ClassificationHead submodule binds to that model's scope.
    """
    if getattr(model, "aux_params", None) is None:
        return [masks]
    labels = ClassificationHead(**model.aux_params, dtype=model.dtype,
                                name="classification_head")(
                                    encoder_features[-1], train)
    return [masks], labels


class SegmentationHead(nn.Module):
    """3x3 conv (+bias) -> optional bilinear upsample -> optional
    activation (heads.py:5-11)."""

    classes: int
    kernel_size: int = 3
    upsampling: int = 1
    activation: Optional[Any] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param("kernel", kaiming_normal, (k, k, x.shape[-1], self.classes),
                       jnp.float32)
        b = self.param("bias", torch_conv_bias(x.shape[-1] * k * k),
                       (self.classes,), jnp.float32)
        x = conv2d(x, w.astype(x.dtype)) + b.astype(x.dtype)
        if self.upsampling > 1:
            x = upsample_bilinear(x, self.upsampling)
        return smp_activation(self.activation)(x)


class ClassificationHead(nn.Module):
    """avg/max pool -> dropout -> linear -> optional activation
    (heads.py:14-25)."""

    classes: int
    pooling: str = "avg"
    dropout: float = 0.2
    activation: Optional[Any] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.pooling not in ("max", "avg"):
            raise ValueError("Pooling should be one of ('max', 'avg'), "
                             "got {}.".format(self.pooling))
        if self.pooling == "avg":
            y = jnp.mean(x, axis=(1, 2))
        else:
            y = jnp.max(x, axis=(1, 2))
        if self.dropout and train:
            y = nn.Dropout(self.dropout)(y, deterministic=not train)
        # nn.Linear -> weights_init xavier_normal_ + zero bias
        y = nn.Dense(self.classes, kernel_init=xavier_normal,
                     dtype=self.dtype)(y)
        return smp_activation(self.activation)(y)
