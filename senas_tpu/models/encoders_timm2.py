"""Native Res2Net and RegNet encoder families (NHWC Flax).

De-gates two more of the reference's timm-backed encoder families
(/root/reference/segmentation_models_pytorch/encoders/timm_res2net.py:85-168
and timm_regnet.py:140-340). Block semantics follow timm's
`Bottle2neck` (hierarchical multi-scale residual splits, Res2Net paper)
and `RegNet` X/Y blocks (group-conv bottleneck + optional SE, widths from
the generate_regnet quantized linear parameterization). The per-variant
stage-width tables produced by `regnet_stage_widths` are cross-checked
against the smp entries' out_channels in tests.

Pretrained weights are not loadable here (zero egress), matching how the
reference itself runs offline.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from senas_tpu.models.encoders import stage_dilation
from senas_tpu.models.encoders_families import ConvBnAct, _conv, _max_pool
from senas_tpu.models.encoders_resnest import _avg_pool
from senas_tpu.ops.primitives import kaiming_normal, relu

Dtype = Any


# ---------------------------------------------------------------------------
# Res2Net (timm Bottle2neck)
# ---------------------------------------------------------------------------

class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    cardinality: int = 1
    base_width: int = 26
    scale: int = 4
    use_downsample: bool = False
    dtype: Optional[Dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0))) \
            * self.cardinality
        scale = self.scale
        is_first = self.stride > 1 or self.use_downsample
        num_scales = max(1, scale - 1)

        residual = x
        out = ConvBnAct(width * scale, 1, padding=(0, 0), dtype=self.dtype,
                        name="conv1")(x, train)
        splits = [out[..., i * width:(i + 1) * width] for i in range(scale)]
        spo = []
        sp = splits[0]
        for i in range(num_scales):
            if i == 0 or is_first:
                sp = splits[i]
            else:
                sp = sp + splits[i]
            sp = ConvBnAct(width, 3, stride=self.stride,
                           groups=self.cardinality, dtype=self.dtype,
                           name=f"conv2_{i}")(sp, train)
            spo.append(sp)
        if scale > 1:
            if is_first:  # timm: AvgPool2d(3, stride, padding=1)
                spo.append(_avg_pool_incl(splits[-1], 3, self.stride, 1))
            else:
                spo.append(splits[-1])
        out = jnp.concatenate(spo, axis=-1)
        out = ConvBnAct(self.planes * self.expansion, 1, padding=(0, 0),
                        act=False, dtype=self.dtype, name="conv3")(out, train)
        if self.use_downsample:
            residual = ConvBnAct(self.planes * self.expansion, 1,
                                 stride=self.stride, padding=(0, 0),
                                 act=False, dtype=self.dtype,
                                 name="downsample")(x, train)
        return relu(out + residual)


def _avg_pool_incl(x, k: int, stride: int, pad: int):
    """AvgPool2d(k, stride, padding=pad) with count_include_pad=True (the
    torch default, which timm's Bottle2neck pool uses)."""
    from jax import lax
    window, strides = (1, k, k, 1), (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    s = lax.reduce_window(x, 0.0, lax.add, window, strides, padding)
    return s / (k * k)


class Res2NetEncoder(nn.Module):
    """timm ResNet assembly with Bottle2neck blocks; smp stage contract
    (timm_res2net.py:8-44): deep=False stem (7x7), maxpool+layer1, ..."""

    layers: Sequence[int]
    depth: int = 5
    base_width: int = 26
    scale: int = 4
    cardinality: int = 1
    dtype: Optional[Dtype] = None

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3, 64, 256, 512, 1024, 2048)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = [x]
        if self.depth == 0:
            return features
        x = ConvBnAct(64, 7, stride=2, dtype=self.dtype, name="stem")(x, train)
        features.append(x)
        planes = (64, 128, 256, 512)
        for li, n_blocks in enumerate(self.layers):
            if len(features) > self.depth:
                break
            if li == 0:
                x = _max_pool(x, 3, 2, 1)
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                need_ds = stride != 1 or x.shape[-1] != planes[li] * 4
                x = Bottle2neck(planes[li], stride=stride,
                                cardinality=self.cardinality,
                                base_width=self.base_width, scale=self.scale,
                                use_downsample=need_ds, dtype=self.dtype,
                                name=f"layer{li + 1}_{bi}")(x, train)
            features.append(x)
        return features[: self.depth + 1]


RES2NET_ENCODERS = {
    "timm-res2net50_26w_4s": dict(cls=Res2NetEncoder, kw=dict(
        layers=(3, 4, 6, 3), base_width=26, scale=4)),
    "timm-res2net101_26w_4s": dict(cls=Res2NetEncoder, kw=dict(
        layers=(3, 4, 23, 3), base_width=26, scale=4)),
    "timm-res2net50_26w_6s": dict(cls=Res2NetEncoder, kw=dict(
        layers=(3, 4, 6, 3), base_width=26, scale=6)),
    "timm-res2net50_26w_8s": dict(cls=Res2NetEncoder, kw=dict(
        layers=(3, 4, 6, 3), base_width=26, scale=8)),
    "timm-res2net50_48w_2s": dict(cls=Res2NetEncoder, kw=dict(
        layers=(3, 4, 6, 3), base_width=48, scale=2)),
    "timm-res2net50_14w_8s": dict(cls=Res2NetEncoder, kw=dict(
        layers=(3, 4, 6, 3), base_width=14, scale=8)),
    "timm-res2next50": dict(cls=Res2NetEncoder, kw=dict(
        layers=(3, 4, 6, 3), base_width=4, scale=4, cardinality=8)),
}


# ---------------------------------------------------------------------------
# RegNet (timm regnet.py: quantized linear widths + X/Y blocks)
# ---------------------------------------------------------------------------

def regnet_stage_widths(w0: float, wa: float, wm: float, depth: int,
                        group_w: int, bottle_ratio: float = 1.0,
                        q: int = 8):
    """generate_regnet + adjust_widths_groups_comp (timm regnet.py):
    per-stage (width, n_blocks, group_width) tuples."""
    widths_cont = np.arange(depth) * wa + w0
    width_exps = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, width_exps)
    widths = (np.round(widths / q) * q).astype(int)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    # adjust for group-width compatibility
    out = []
    for w, d in zip(stage_widths.tolist(), stage_depths.tolist()):
        w_bot = int(round(w * bottle_ratio))
        g = min(group_w, w_bot)
        w_bot = int(round(w_bot / g) * g)
        w = int(w_bot / bottle_ratio)
        out.append((w, int(d), g))
    return out


class RegNetBlock(nn.Module):
    """timm Bottleneck regnet block: 1x1 -> 3x3 group (+SE) -> 1x1, ReLU
    after the residual add."""

    w_out: int
    stride: int = 1
    group_width: int = 8
    bottle_ratio: float = 1.0
    se_ratio: float = 0.0
    # >1 = block sits in a make_dilated-patched stage: every conv runs
    # stride 1 with this dilation (smp encoders/_utils.py:48-60)
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_b = int(round(self.w_out * self.bottle_ratio))
        groups = w_b // self.group_width
        d = self.dilation
        eff_stride = 1 if d > 1 else self.stride
        residual = x
        out = ConvBnAct(w_b, 1, padding=(0, 0), dtype=self.dtype,
                        name="conv1")(x, train)
        out = ConvBnAct(w_b, 3, stride=eff_stride, groups=groups, dilation=d,
                        dtype=self.dtype, name="conv2")(out, train)
        if self.se_ratio > 0:
            # SE on the block INPUT width (timm: rd_channels from in_chs)
            rd = int(round(x.shape[-1] * self.se_ratio))
            y = jnp.mean(out, axis=(1, 2), keepdims=True)
            w1 = self.param("se_fc1", kaiming_normal, (1, 1, w_b, rd),
                            jnp.float32)
            b1 = self.param("se_b1", nn.initializers.zeros, (rd,), jnp.float32)
            w2 = self.param("se_fc2", kaiming_normal, (1, 1, rd, w_b),
                            jnp.float32)
            b2 = self.param("se_b2", nn.initializers.zeros, (w_b,), jnp.float32)
            y = relu(_conv(y, w1.astype(y.dtype), padding=(0, 0))
                     + b1.astype(y.dtype))
            y = nn.sigmoid(_conv(y, w2.astype(y.dtype), padding=(0, 0))
                           + b2.astype(y.dtype))
            out = out * y
        out = ConvBnAct(self.w_out, 1, padding=(0, 0), act=False,
                        dtype=self.dtype, name="conv3")(out, train)
        if self.stride != 1 or x.shape[-1] != self.w_out:
            residual = ConvBnAct(self.w_out, 1, stride=eff_stride,
                                 padding=(0, 0), act=False, dtype=self.dtype,
                                 name="downsample")(x, train)
        return relu(out + residual)


class RegNetEncoder(nn.Module):
    """smp RegNetEncoder stage contract (timm_regnet.py:8-44):
    [identity, stem(3x3 s2 -> 32), s1, s2, s3, s4] — each stage stride 2."""

    w0: float
    wa: float
    wm: float
    net_depth: int
    group_w: int
    se_ratio: float = 0.0
    bottle_ratio: float = 1.0
    stem_width: int = 32
    depth: int = 5
    output_stride: int = 32          # make_dilated surface (32 | 16 | 8)
    dtype: Optional[Dtype] = None

    @property
    def out_channels(self) -> Tuple[int, ...]:
        stages = regnet_stage_widths(self.w0, self.wa, self.wm,
                                     self.net_depth, self.group_w,
                                     self.bottle_ratio)
        return ((3, self.stem_width) + tuple(w for w, _, _ in stages))[
            : self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = [x]
        if self.depth == 0:
            return features
        x = ConvBnAct(self.stem_width, 3, stride=2, dtype=self.dtype,
                      name="stem")(x, train)
        features.append(x)
        stages = regnet_stage_widths(self.w0, self.wa, self.wm,
                                     self.net_depth, self.group_w,
                                     self.bottle_ratio)
        for si, (w, d, g) in enumerate(stages):
            if len(features) > self.depth:
                break
            rate = stage_dilation(si + 2, self.output_stride)
            for bi in range(d):
                x = RegNetBlock(w, stride=2 if bi == 0 else 1, group_width=g,
                                bottle_ratio=self.bottle_ratio,
                                se_ratio=self.se_ratio, dilation=rate,
                                dtype=self.dtype,
                                name=f"s{si + 1}_b{bi}")(x, train)
            features.append(x)
        return features[: self.depth + 1]


def _regnet(w0, wa, wm, depth, group_w, se=0.0):
    return dict(cls=RegNetEncoder, kw=dict(w0=w0, wa=wa, wm=wm,
                                           net_depth=depth, group_w=group_w,
                                           se_ratio=se))


# variant table: timm_regnet.py:140-340 (X = no SE, Y = se_ratio 0.25)
REGNET_ENCODERS = {
    "timm-regnetx_002": _regnet(24, 36.44, 2.49, 13, 8),
    "timm-regnetx_004": _regnet(24, 24.48, 2.54, 22, 16),
    "timm-regnetx_006": _regnet(48, 36.97, 2.24, 16, 24),
    "timm-regnetx_008": _regnet(56, 35.73, 2.28, 16, 16),
    "timm-regnetx_016": _regnet(80, 34.01, 2.25, 18, 24),
    "timm-regnetx_032": _regnet(88, 26.31, 2.25, 25, 48),
    "timm-regnetx_040": _regnet(96, 38.65, 2.43, 23, 40),
    "timm-regnetx_064": _regnet(184, 60.83, 2.07, 17, 56),
    "timm-regnetx_080": _regnet(80, 49.56, 2.88, 23, 120),
    "timm-regnetx_120": _regnet(168, 73.36, 2.37, 19, 112),
    "timm-regnetx_160": _regnet(216, 55.59, 2.1, 22, 128),
    "timm-regnetx_320": _regnet(320, 69.86, 2.0, 23, 168),
    "timm-regnety_002": _regnet(24, 36.44, 2.49, 13, 8, se=0.25),
    "timm-regnety_004": _regnet(48, 27.89, 2.09, 16, 8, se=0.25),
    "timm-regnety_006": _regnet(48, 32.54, 2.32, 15, 16, se=0.25),
    "timm-regnety_008": _regnet(56, 38.84, 2.4, 14, 16, se=0.25),
    "timm-regnety_016": _regnet(48, 20.71, 2.65, 27, 24, se=0.25),
    "timm-regnety_032": _regnet(80, 42.63, 2.66, 21, 24, se=0.25),
    "timm-regnety_040": _regnet(96, 31.41, 2.24, 22, 64, se=0.25),
    "timm-regnety_064": _regnet(112, 33.22, 2.27, 25, 72, se=0.25),
    "timm-regnety_080": _regnet(192, 76.82, 2.19, 17, 56, se=0.25),
    "timm-regnety_120": _regnet(168, 73.36, 2.37, 19, 112, se=0.25),
    "timm-regnety_160": _regnet(200, 106.23, 2.48, 18, 112, se=0.25),
    "timm-regnety_320": _regnet(232, 115.89, 2.53, 20, 232, se=0.25),
}

# ---------------------------------------------------------------------------
# SkNet (timm selective_kernel.py: SelectiveKernel + path attention)
# ---------------------------------------------------------------------------

def _make_divisible(v: float, divisor: int = 8) -> int:
    return max(divisor, int(v + divisor / 2) // divisor * divisor)


class SelectiveKernel(nn.Module):
    """Two 3x3 paths (dilations 1 and 2 — timm's keep_3x3 folding of the
    [3, 5] kernel pair) + softmax path attention over a shared squeeze."""

    c_out: int
    stride: int = 1
    groups: int = 1
    rd_ratio: float = 1.0 / 16
    split_input: bool = True
    # >1 = make_dilated-patched stage. NOTE the reference patches BOTH SK
    # paths to the SAME stage dilation (replace_strides_with_dilation sets
    # every Conv2d, flattening the (1, 2) path pair) — reproduced exactly.
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        paths = []
        n_paths = 2
        if self.split_input:
            c = x.shape[-1] // n_paths
            inputs = [x[..., :c], x[..., c:]]
        else:
            inputs = [x, x]
        path_dil = (1, 2) if self.dilation == 1 else (self.dilation,) * 2
        eff_stride = 1 if self.dilation > 1 else self.stride
        for i, (xin, d) in enumerate(zip(inputs, path_dil)):
            paths.append(ConvBnAct(self.c_out, 3, stride=eff_stride,
                                   groups=self.groups, dilation=d,
                                   dtype=self.dtype, name=f"path{i}")(xin, train))
        stacked = jnp.stack(paths, axis=-2)  # [B,H,W,P,C]
        attn_chs = _make_divisible(self.c_out * self.rd_ratio)
        y = stacked.sum(axis=-2).mean(axis=(1, 2), keepdims=True)  # [B,1,1,C]
        w1 = self.param("fc_reduce", kaiming_normal,
                        (1, 1, self.c_out, attn_chs), jnp.float32)
        y = _conv(y, w1.astype(y.dtype), padding=(0, 0))
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="attn_bn")(y)
        y = relu(y)
        w2 = self.param("fc_select", kaiming_normal,
                        (1, 1, attn_chs, self.c_out * n_paths), jnp.float32)
        y = _conv(y, w2.astype(y.dtype), padding=(0, 0))
        y = y.reshape(y.shape[0], 1, 1, n_paths, self.c_out)
        y = nn.softmax(y, axis=-2)
        return (stacked * y).sum(axis=-2)


class SelectiveKernelBasic(nn.Module):
    planes: int
    stride: int = 1
    rd_ratio: float = 1.0 / 8
    use_downsample: bool = False
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        eff_stride = 1 if d > 1 else self.stride
        residual = x
        out = SelectiveKernel(self.planes, stride=self.stride,
                              rd_ratio=self.rd_ratio, split_input=True,
                              dilation=d, dtype=self.dtype,
                              name="conv1")(x, train)
        out = relu(out)
        out = ConvBnAct(self.planes, 3, act=False, dilation=d,
                        dtype=self.dtype, name="conv2")(out, train)
        if self.use_downsample:
            residual = ConvBnAct(self.planes, 1, stride=eff_stride,
                                 padding=(0, 0), act=False, dtype=self.dtype,
                                 name="downsample")(x, train)
        return relu(out + residual)


class SelectiveKernelBottleneck(nn.Module):
    planes: int
    stride: int = 1
    cardinality: int = 32
    base_width: int = 4
    use_downsample: bool = False
    dilation: int = 1
    dtype: Optional[Dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        d = self.dilation
        eff_stride = 1 if d > 1 else self.stride
        residual = x
        out = ConvBnAct(width, 1, padding=(0, 0), dtype=self.dtype,
                        name="conv1")(x, train)
        out = SelectiveKernel(width, stride=self.stride,
                              groups=self.cardinality, split_input=True,
                              dilation=d, dtype=self.dtype,
                              name="conv2")(out, train)
        out = relu(out)
        out = ConvBnAct(self.planes * self.expansion, 1, padding=(0, 0),
                        act=False, dtype=self.dtype, name="conv3")(out, train)
        if self.use_downsample:
            residual = ConvBnAct(self.planes * self.expansion, 1,
                                 stride=eff_stride, padding=(0, 0),
                                 act=False, dtype=self.dtype,
                                 name="downsample")(x, train)
        return relu(out + residual)


class SkNetEncoder(nn.Module):
    """timm ResNet assembly with selective-kernel blocks; smp stage contract
    (timm_sknet.py:8-39)."""

    layers: Sequence[int]
    block: str = "basic"  # "basic" | "bottleneck"
    depth: int = 5
    cardinality: int = 32
    base_width: int = 4
    output_stride: int = 32          # make_dilated surface (32 | 16 | 8)
    dtype: Optional[Dtype] = None

    @property
    def out_channels(self) -> Tuple[int, ...]:
        e = 1 if self.block == "basic" else 4
        return (3, 64, 64 * e, 128 * e, 256 * e, 512 * e)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = [x]
        if self.depth == 0:
            return features
        x = ConvBnAct(64, 7, stride=2, dtype=self.dtype, name="stem")(x, train)
        features.append(x)
        planes = (64, 128, 256, 512)
        for li, n_blocks in enumerate(self.layers):
            if len(features) > self.depth:
                break
            if li == 0:
                x = _max_pool(x, 3, 2, 1)
            rate = stage_dilation(li + 2, self.output_stride)
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                if self.block == "basic":
                    need_ds = stride != 1 or x.shape[-1] != planes[li]
                    x = SelectiveKernelBasic(
                        planes[li], stride=stride, use_downsample=need_ds,
                        dilation=rate, dtype=self.dtype,
                        name=f"layer{li + 1}_{bi}")(x, train)
                else:
                    need_ds = stride != 1 or x.shape[-1] != planes[li] * 4
                    x = SelectiveKernelBottleneck(
                        planes[li], stride=stride, cardinality=self.cardinality,
                        base_width=self.base_width, use_downsample=need_ds,
                        dilation=rate, dtype=self.dtype,
                        name=f"layer{li + 1}_{bi}")(x, train)
            features.append(x)
        return features[: self.depth + 1]


SKNET_ENCODERS = {
    "timm-skresnet18": dict(cls=SkNetEncoder, kw=dict(
        layers=(2, 2, 2, 2), block="basic")),
    "timm-skresnet34": dict(cls=SkNetEncoder, kw=dict(
        layers=(3, 4, 6, 3), block="basic")),
    "timm-skresnext50_32x4d": dict(cls=SkNetEncoder, kw=dict(
        layers=(3, 4, 6, 3), block="bottleneck", cardinality=32,
        base_width=4)),
}

# ---------------------------------------------------------------------------
# GERNet (timm ByobNet: basic / bottle block configs, timm_gernet.py:67-140)
# ---------------------------------------------------------------------------

class ByoBasicBlock(nn.Module):
    c_out: int
    stride: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        eff_stride = 1 if d > 1 else self.stride
        residual = x
        out = ConvBnAct(self.c_out, 3, stride=eff_stride, dilation=d,
                        dtype=self.dtype, name="conv1")(x, train)
        out = ConvBnAct(self.c_out, 3, act=False, dilation=d,
                        dtype=self.dtype, name="conv2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.c_out:
            residual = ConvBnAct(self.c_out, 1, stride=eff_stride,
                                 padding=(0, 0), act=False, dtype=self.dtype,
                                 name="shortcut")(x, train)
        return relu(out + residual)


class ByoBottleBlock(nn.Module):
    """1x1 -> 3x3 (group_size 1 = depthwise when gs=1) -> 1x1 with
    bottle_ratio-scaled mid width (inverted when br > 1)."""

    c_out: int
    stride: int = 1
    bottle_ratio: float = 1.0
    group_size: int = 0  # 0 = one group; 1 = depthwise
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = _make_divisible(self.c_out * self.bottle_ratio)
        groups = mid // self.group_size if self.group_size else 1
        d = self.dilation
        eff_stride = 1 if d > 1 else self.stride
        residual = x
        out = ConvBnAct(mid, 1, padding=(0, 0), dtype=self.dtype,
                        name="conv1")(x, train)
        out = ConvBnAct(mid, 3, stride=eff_stride, groups=groups, dilation=d,
                        dtype=self.dtype, name="conv2")(out, train)
        out = ConvBnAct(self.c_out, 1, padding=(0, 0), act=False,
                        dtype=self.dtype, name="conv3")(out, train)
        if self.stride != 1 or x.shape[-1] != self.c_out:
            residual = ConvBnAct(self.c_out, 1, stride=eff_stride,
                                 padding=(0, 0), act=False, dtype=self.dtype,
                                 name="shortcut")(x, train)
        return relu(out + residual)


class GERNetEncoder(nn.Module):
    """smp GERNetEncoder stage contract (timm_gernet.py:16-24): the LAST
    smp stage folds byob stages 4+5 and the final 1x1 conv together."""

    blocks: Sequence[Tuple]  # (type, d, c, s, gs, br) per byob stage
    stem_chs: int
    num_features: int
    depth: int = 5
    output_stride: int = 32          # make_dilated surface (32 | 16 | 8)
    dtype: Optional[Dtype] = None

    @property
    def out_channels(self) -> Tuple[int, ...]:
        cs = [c for _, _, c, _, _, _ in self.blocks]
        return ((3, self.stem_chs, cs[0], cs[1], cs[2], self.num_features)[
            : self.depth + 1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = [x]
        if self.depth == 0:
            return features
        x = ConvBnAct(self.stem_chs, 3, stride=2, dtype=self.dtype,
                      name="stem")(x, train)
        features.append(x)

        for si, (btype, d, c, s, gs, br) in enumerate(self.blocks):
            if len(features) > self.depth:
                break
            # byob stages 3+4 (and the final 1x1) fold into pyramid stage 5
            rate = stage_dilation(min(si + 2, 5), self.output_stride)
            for bi in range(d):
                stride = s if bi == 0 else 1
                if btype == "basic":
                    x = ByoBasicBlock(c, stride=stride, dilation=rate,
                                      dtype=self.dtype,
                                      name=f"s{si}_b{bi}")(x, train)
                else:
                    x = ByoBottleBlock(c, stride=stride, bottle_ratio=br,
                                       group_size=gs, dilation=rate,
                                       dtype=self.dtype,
                                       name=f"s{si}_b{bi}")(x, train)
            # smp folds stages 3, 4 and the final conv into ONE feature level
            if si < 3:
                features.append(x)
        x = ConvBnAct(self.num_features, 1, padding=(0, 0), dtype=self.dtype,
                      name="final_conv")(x, train)
        features.append(x)
        return features[: self.depth + 1]


GERNET_ENCODERS = {
    # (type, depth, channels, stride, group_size, bottle_ratio)
    "timm-gernet_s": dict(cls=GERNetEncoder, kw=dict(
        blocks=(("basic", 1, 48, 2, 0, 1.0), ("basic", 3, 48, 2, 0, 1.0),
                ("bottle", 7, 384, 2, 0, 0.25), ("bottle", 2, 560, 2, 1, 3.0),
                ("bottle", 1, 256, 1, 1, 3.0)),
        stem_chs=13, num_features=1920)),
    "timm-gernet_m": dict(cls=GERNetEncoder, kw=dict(
        blocks=(("basic", 1, 128, 2, 0, 1.0), ("basic", 2, 192, 2, 0, 1.0),
                ("bottle", 6, 640, 2, 0, 0.25), ("bottle", 4, 640, 2, 1, 3.0),
                ("bottle", 1, 640, 1, 1, 3.0)),
        stem_chs=32, num_features=2560)),
    "timm-gernet_l": dict(cls=GERNetEncoder, kw=dict(
        blocks=(("basic", 1, 128, 2, 0, 1.0), ("basic", 2, 192, 2, 0, 1.0),
                ("bottle", 6, 640, 2, 0, 0.25), ("bottle", 5, 640, 2, 1, 3.0),
                ("bottle", 4, 640, 1, 1, 3.0)),
        stem_chs=32, num_features=2560)),
}

TIMM2_ENCODERS = {**RES2NET_ENCODERS, **REGNET_ENCODERS, **SKNET_ENCODERS,
                  **GERNET_ENCODERS}
