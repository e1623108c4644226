"""Legacy semantic-segmentation block library (NHWC Flax).

Port of the reference's `utils/functional.py` — the pytorch-semseg block
collection carried along from the NasUnet skeleton (conv/deconv+norm
wrappers, UNet/SegNet/LinkNet/FRRN/RefineNet/PSP/ICNet building blocks).
Nothing in the reference imports it at runtime; it is ported for component
completeness with the same observable semantics, including the quirks the
torch code has (unetConv2/residualConvUnit use UNPADDED 3x3 convs, so
spatial size shrinks by 2 per conv — reference utils/functional.py:177-203,
457-472).

SegNet's maxpool-with-argmax + unpool pair is expressed TPU-style: a
reshape-window argmax (static shapes, no gather loops) and a one-hot
scatter unpool — both jit/vmap-friendly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from senas_tpu.ops.primitives import build_norm, kaiming_normal, relu

Dtype = Any


def _conv(x, w, stride=1, padding=0, dilation=1):
    p = padding if isinstance(padding, tuple) else (padding, padding)
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=(p, p) if isinstance(
            p[0], tuple) else ((p[0], p[0]), (p[1], p[1])),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvNorm(nn.Module):
    """conv2DBatchNorm / conv2DGroupNorm / their ReLU variants and the
    norm-free case, by flags (reference functional.py:6-154)."""

    filters: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    bias: bool = True
    norm: Optional[str] = "batch"   # "batch" | "group" | None
    n_groups: int = 16
    act: bool = False
    transpose: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        w = self.param("kernel", kaiming_normal,
                       (k, k, x.shape[-1], self.filters), jnp.float32)
        w = w.astype(x.dtype)
        if self.transpose:
            # torch ConvTranspose2d(k, stride, padding, output_padding=0)
            # via lhs dilation: out = (H-1)*stride - 2*padding + k
            lo = k - 1 - self.padding
            x = lax.conv_general_dilated(
                x, w, window_strides=(1, 1),
                padding=((lo, lo), (lo, lo)),
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = _conv(x, w, self.stride, self.padding, self.dilation)
        if self.bias and self.norm is None:
            b = self.param("bias", nn.initializers.zeros, (self.filters,),
                           jnp.float32)
            x = x + b.astype(x.dtype)
        if self.norm == "batch":
            x = build_norm(self.dtype, name="bn")(x, use_running_average=not train)
        elif self.norm == "group":
            x = nn.GroupNorm(num_groups=self.n_groups, dtype=self.dtype,
                             name="gn")(x)
        return relu(x) if self.act else x


class UnetConv2(nn.Module):
    """unetConv2 (functional.py:177-203): two UNPADDED 3x3 convs."""

    filters: int
    is_batchnorm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = "batch" if self.is_batchnorm else None
        x = ConvNorm(self.filters, 3, norm=norm, act=True, dtype=self.dtype,
                     name="conv1")(x, train)
        return ConvNorm(self.filters, 3, norm=norm, act=True, dtype=self.dtype,
                        name="conv2")(x, train)


def _bilinear_resize(x, hw: Tuple[int, int]):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="bilinear")


class UnetUp(nn.Module):
    """unetUp (functional.py:204-218): upsample low-res input, center-pad
    the skip, concat, UnetConv2 (no norm)."""

    filters: int
    is_deconv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        if self.is_deconv:
            x = ConvNorm(self.filters, 2, stride=2, norm=None, bias=True,
                         transpose=True, dtype=self.dtype, name="up")(x, train)
        else:
            x = _bilinear_resize(x, (x.shape[1] * 2, x.shape[2] * 2))
        off = x.shape[1] - skip.shape[1]
        pad = off // 2
        skip = jnp.pad(skip, ((0, 0), (pad, off - pad), (pad, off - pad), (0, 0)))
        return UnetConv2(self.filters, is_batchnorm=False, dtype=self.dtype,
                         name="conv")(jnp.concatenate([skip, x], -1), train)


# ---------------------------------------------------------------------------
# SegNet: argmax pooling + unpooling (static-shape TPU formulation)
# ---------------------------------------------------------------------------

def max_pool_argmax_2x2(x):
    """MaxPool2d(2,2,return_indices=True): returns (pooled, idx in 0..3)."""
    b, h, w, c = x.shape
    wnd = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    wnd = wnd.reshape(b, h // 2, w // 2, 4, c)
    idx = jnp.argmax(wnd, axis=3)
    pooled = jnp.max(wnd, axis=3)
    return pooled, idx


def max_unpool_2x2(x, idx, out_hw: Tuple[int, int]):
    """Inverse of max_pool_argmax_2x2: one-hot scatter into 2x2 windows."""
    b, h, w, c = x.shape
    onehot = jax.nn.one_hot(idx, 4, axis=3, dtype=x.dtype)  # [B,h,w,4,C]
    wnd = onehot * x[:, :, :, None, :]
    wnd = wnd.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    full = wnd.reshape(b, h * 2, w * 2, c)
    return full[:, : out_hw[0], : out_hw[1]]


class SegnetDown(nn.Module):
    """segnetDown2/3 (functional.py:221-251): n conv-bn-relu (padded) then
    argmax pool. Returns (pooled, indices, unpooled_hw)."""

    filters: int
    n_convs: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_convs):
            x = ConvNorm(self.filters, 3, padding=1, norm="batch", act=True,
                         dtype=self.dtype, name=f"conv{i + 1}")(x, train)
        shape = x.shape[1:3]
        pooled, idx = max_pool_argmax_2x2(x)
        return pooled, idx, shape


class SegnetUp(nn.Module):
    """segnetUp2/3 (functional.py:253-281): unpool then n conv-bn-relu."""

    filters: int
    n_convs: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, idx, out_hw, train: bool = False):
        x = max_unpool_2x2(x, idx, out_hw)
        for i in range(self.n_convs):
            x = ConvNorm(self.filters, 3, padding=1, norm="batch", act=True,
                         dtype=self.dtype, name=f"conv{i + 1}")(x, train)
        return x


# ---------------------------------------------------------------------------
# Residual / LinkNet / FRRN / RefineNet / PSP families
# ---------------------------------------------------------------------------

class ResidualBlock(nn.Module):
    """residualBlock (functional.py:283-309): 3x3(s)+3x3 with 1x1 shortcut."""

    filters: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvNorm(self.filters, 3, stride=self.stride, padding=1,
                     bias=False, norm="batch", act=True, dtype=self.dtype,
                     name="convbnrelu1")(x, train)
        y = ConvNorm(self.filters, 3, padding=1, bias=False, norm="batch",
                     dtype=self.dtype, name="convbn2")(y, train)
        s = ConvNorm(self.filters, 1, stride=self.stride, bias=False,
                     norm="batch", dtype=self.dtype, name="shortcut")(x, train)
        return relu(y + s)


class ResidualBottleneck(nn.Module):
    """residualBottleneck (functional.py:311-341): 1x1 -> 3x3 -> 1x1*4."""

    filters: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvNorm(self.filters, 1, bias=False, norm="batch", act=True,
                     dtype=self.dtype, name="convbn1")(x, train)
        y = ConvNorm(self.filters, 3, stride=self.stride, padding=1,
                     bias=False, norm="batch", act=True, dtype=self.dtype,
                     name="convbn2")(y, train)
        y = ConvNorm(self.filters * 4, 1, bias=False, norm="batch",
                     dtype=self.dtype, name="convbn3")(y, train)
        s = ConvNorm(self.filters * 4, 1, stride=self.stride, bias=False,
                     norm="batch", dtype=self.dtype, name="shortcut")(x, train)
        return relu(y + s)


class LinknetUp(nn.Module):
    """linknetUp (functional.py:343-367): 1x1 C/2 -> deconv 3x3 s2 -> 1x1 C."""

    filters: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.filters // 2
        x = ConvNorm(half, 1, padding=1, norm="batch", act=True,
                     dtype=self.dtype, name="convbnrelu1")(x, train)
        x = ConvNorm(half, 3, stride=2, norm="batch", act=True, transpose=True,
                     dtype=self.dtype, name="deconvbnrelu2")(x, train)
        return ConvNorm(self.filters, 1, padding=1, norm="batch", act=True,
                        dtype=self.dtype, name="convbnrelu3")(x, train)


class FRRU(nn.Module):
    """Full-Resolution Residual Unit (functional.py:369-419). y = pooled
    stream, z = full-res residual stream (32 channels)."""

    filters: int
    scale: int
    group_norm: bool = False
    n_groups: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, y, z, train: bool = False):
        norm = "group" if self.group_norm else "batch"
        zp = lax.reduce_window(z, -jnp.inf, lax.max,
                               (1, self.scale, self.scale, 1),
                               (1, self.scale, self.scale, 1),
                               ((0, 0), (0, 0), (0, 0), (0, 0)))
        x = jnp.concatenate([y, zp], -1)
        x = ConvNorm(self.filters, 3, padding=1, bias=False, norm=norm,
                     n_groups=self.n_groups, act=True, dtype=self.dtype,
                     name="conv1")(x, train)
        y_prime = ConvNorm(self.filters, 3, padding=1, bias=False, norm=norm,
                           n_groups=self.n_groups, act=True, dtype=self.dtype,
                           name="conv2")(x, train)
        r = ConvNorm(32, 1, norm=None, bias=True, dtype=self.dtype,
                     name="conv_res")(y_prime, train)
        r = jnp.repeat(jnp.repeat(r, self.scale, 1), self.scale, 2)  # nearest
        return y_prime, z + r


class RU(nn.Module):
    """Residual Unit for FRRN (functional.py:421-455)."""

    filters: int
    group_norm: bool = False
    n_groups: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = "group" if self.group_norm else "batch"
        y = ConvNorm(self.filters, 3, padding=1, bias=False, norm=norm,
                     n_groups=self.n_groups, act=True, dtype=self.dtype,
                     name="conv1")(x, train)
        y = ConvNorm(self.filters, 3, padding=1, bias=False, norm=norm,
                     n_groups=self.n_groups, dtype=self.dtype,
                     name="conv2")(y, train)
        return x + y


class ResidualConvUnit(nn.Module):
    """residualConvUnit (functional.py:457-472): relu-conv-relu-conv
    (UNPADDED, like the torch original) + residual of the cropped input."""

    kernel: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = relu(x)
        y = ConvNorm(c, self.kernel, norm=None, bias=True, dtype=self.dtype,
                     name="conv1")(y, train)
        y = relu(y)
        y = ConvNorm(c, self.kernel, norm=None, bias=True, dtype=self.dtype,
                     name="conv2")(y, train)
        crop = (x.shape[1] - y.shape[1]) // 2
        return y + x[:, crop: crop + y.shape[1], crop: crop + y.shape[2]]


class MultiResolutionFusion(nn.Module):
    """multiResolutionFusion (functional.py:474-499): conv each input
    (unpadded 3x3), bilinear-upsample by its scale, sum."""

    filters: int
    up_scale_high: int
    up_scale_low: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_high, x_low=None, train: bool = False):
        h = ConvNorm(self.filters, 3, norm=None, bias=True, dtype=self.dtype,
                     name="conv_high")(x_high, train)
        h = _bilinear_resize(h, (h.shape[1] * self.up_scale_high,
                                 h.shape[2] * self.up_scale_high))
        if x_low is None:
            return h
        l = ConvNorm(self.filters, 3, norm=None, bias=True, dtype=self.dtype,
                     name="conv_low")(x_low, train)
        l = _bilinear_resize(l, (l.shape[1] * self.up_scale_low,
                                 l.shape[2] * self.up_scale_low))
        return h + l


class ChainedResidualPooling(nn.Module):
    """chainedResidualPooling (functional.py:501-515): relu -> maxpool(5,1,2)
    -> unpadded 3x3 conv, + cropped residual."""

    filters: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = relu(x)
        y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
                              ((0, 0), (2, 2), (2, 2), (0, 0)))
        y = ConvNorm(self.filters, 3, norm=None, bias=True, dtype=self.dtype,
                     name="conv")(y, train)
        crop = (x.shape[1] - y.shape[1]) // 2
        return y + x[:, crop: crop + y.shape[1], crop: crop + y.shape[2]]


class BottleNeckPSP(nn.Module):
    """bottleNeckPSP (functional.py:592-654): dilated bottleneck with
    projected shortcut; dilation>1 replaces stride in conv2."""

    mid: int
    filters: int
    stride: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvNorm(self.mid, 1, bias=False, norm="batch", act=True,
                     dtype=self.dtype, name="cbr1")(x, train)
        if self.dilation > 1:
            y = ConvNorm(self.mid, 3, padding=self.dilation,
                         dilation=self.dilation, bias=False, norm="batch",
                         act=True, dtype=self.dtype, name="cbr2")(y, train)
        else:
            y = ConvNorm(self.mid, 3, stride=self.stride, padding=1,
                         bias=False, norm="batch", act=True, dtype=self.dtype,
                         name="cbr2")(y, train)
        y = ConvNorm(self.filters, 1, bias=False, norm="batch",
                     dtype=self.dtype, name="cb3")(y, train)
        s = ConvNorm(self.filters, 1, stride=self.stride if self.dilation == 1
                     else 1, bias=False, norm="batch", dtype=self.dtype,
                     name="cb4")(x, train)
        return relu(y + s)


class BottleNeckIdentifyPSP(nn.Module):
    """bottleNeckIdentifyPSP (functional.py:656-707): identity residual."""

    mid: int
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = ConvNorm(self.mid, 1, bias=False, norm="batch", act=True,
                     dtype=self.dtype, name="cbr1")(x, train)
        y = ConvNorm(self.mid, 3, padding=self.dilation,
                     dilation=self.dilation, bias=False, norm="batch",
                     act=True, dtype=self.dtype, name="cbr2")(y, train)
        y = ConvNorm(c, 1, bias=False, norm="batch", dtype=self.dtype,
                     name="cb3")(y, train)
        return relu(x + y)


class ResidualBlockPSP(nn.Module):
    """residualBlockPSP (functional.py:709-751): one BottleNeckPSP then
    (n_blocks-1) identity bottlenecks."""

    n_blocks: int
    mid: int
    filters: int
    stride: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BottleNeckPSP(self.mid, self.filters, self.stride, self.dilation,
                          dtype=self.dtype, name="block1")(x, train)
        for i in range(self.n_blocks - 1):
            x = BottleNeckIdentifyPSP(self.mid, self.dilation,
                                      dtype=self.dtype,
                                      name=f"block{i + 2}")(x, train)
        return x


class CascadeFeatureFusion(nn.Module):
    """cascadeFeatureFusion (functional.py:753-802, ICNet): upsample low by
    2, dilated 3x3 on low + 1x1 on high, sum+relu; also returns the
    low-res class logits used for auxiliary supervision."""

    n_classes: int
    filters: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_low, x_high, train: bool = False):
        x_low = _bilinear_resize(x_low, (x_low.shape[1] * 2, x_low.shape[2] * 2))
        low = ConvNorm(self.filters, 3, padding=2, dilation=2, bias=False,
                       norm="batch", dtype=self.dtype, name="low_dilated")(
            x_low, train)
        high = ConvNorm(self.filters, 1, bias=False, norm="batch",
                        dtype=self.dtype, name="high_proj")(x_high, train)
        cls = ConvNorm(self.n_classes, 1, norm=None, bias=True,
                       dtype=self.dtype, name="low_cls")(x_low, train)
        return relu(low + high), cls


# ---------------------------------------------------------------------------
# interp helpers (functional.py:804-848)
# ---------------------------------------------------------------------------

def get_interp_size(x, s_factor: int = 1, z_factor: int = 1) -> Tuple[int, int]:
    """Caffe-style interp size arithmetic (functional.py:804-817)."""
    h, w = x.shape[1], x.shape[2]
    h = (h - 1) // s_factor + 1
    w = (w - 1) // s_factor + 1
    h = h + (h - 1) * (z_factor - 1)
    w = w + (w - 1) * (z_factor - 1)
    return h, w


def interp(x, size: Tuple[int, int], mode: str = "bilinear"):
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[-1]),
                            method=mode)


def get_upsampling_weight(in_channels: int, out_channels: int,
                          kernel_size: int) -> jnp.ndarray:
    """Bilinear deconv initializer (functional.py:835-848), HWIO layout."""
    factor = (kernel_size + 1) // 2
    center = factor - 1 if kernel_size % 2 == 1 else factor - 0.5
    og = jnp.mgrid[:kernel_size, :kernel_size]
    filt = (1 - jnp.abs(og[0] - center) / factor) * \
           (1 - jnp.abs(og[1] - center) / factor)
    w = jnp.zeros((kernel_size, kernel_size, in_channels, out_channels))
    n = min(in_channels, out_channels)
    return w.at[:, :, jnp.arange(n), jnp.arange(n)].set(filt[:, :, None])
