"""Native ResNeSt encoder family (NHWC Flax).

Ports the one timm-backed encoder family the reference exposes that is
feasible without the timm package: `timm-resnest*`
(/root/reference/segmentation_models_pytorch/encoders/timm_resnest.py:89-209
lists the per-variant configs; the block/stem semantics follow
timm.models.resnest.ResNestBottleneck / SplitAttn and the ResNeSt paper).

Components:
  * deep stem (3x3 s2 -> 3x3 -> 3x3 to 2*stem_width) + maxpool
  * ResNestBottleneck: 1x1 -> SplitAttn 3x3 (radix-grouped conv + radix
    softmax attention) -> 1x1, with AvgPool anti-aliased downsampling (avd)
    and avg-down shortcut projections
  * smp stage contract: [identity, stem, maxpool+layer1, layer2-4]

Deviation note (documented, untestable here): timm applies `avd` only when
stride > 1 (its ResNet builder does not forward ResNeSt's original
`is_first` flag), so layer1's first block gets no smoothing pool; we match
timm's behavior. Pretrained weights are not loadable in this zero-egress
image either way.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from senas_tpu.models.encoders_families import ConvBnAct, _conv, _max_pool
from senas_tpu.ops.primitives import build_norm, kaiming_normal, relu

Dtype = Any


def _avg_pool(x, k: int, stride: int, pad: int):
    """AvgPool2d(k, stride, padding=pad, count_include_pad=False)."""
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    window, strides = (1, k, k, 1), (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    s = lax.reduce_window(x, 0.0, lax.add, window, strides, padding)
    n = lax.reduce_window(ones, 0.0, lax.add, window, strides, padding)
    return s / n


class SplitAttn(nn.Module):
    """timm SplitAttn: radix-grouped 3x3 conv + radix-softmax attention."""

    c_out: int
    radix: int = 2
    cardinality: int = 1
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        R, G = self.radix, self.cardinality
        C = self.c_out
        mid = C * R
        b = x.shape[0]
        # grouped conv with groups = cardinality * radix, then BN + ReLU
        x = ConvBnAct(mid, 3, stride=self.stride, groups=G * R,
                      dtype=self.dtype, name="conv")(x, train)
        h, w = x.shape[1:3]
        if R > 1:
            # NHWC channel order matches torch NCHW flatten: [R, C] major
            gap = x.reshape(b, h, w, R, C).sum(axis=3)
        else:
            gap = x
        gap = gap.mean(axis=(1, 2), keepdims=True)  # [b,1,1,C]
        # attn bottleneck: max(C*R//4 rounded to /8, 32) (timm make_divisible)
        attn_chs = max(32, (C * R // 4 + 4) // 8 * 8)
        w1 = self.param("fc1", kaiming_normal, (1, 1, C // G, attn_chs),
                        jnp.float32)
        gap = _conv(gap, w1.astype(gap.dtype), groups=G, padding=(0, 0))
        gap = build_norm(self.dtype, name="bn1")(
            gap, use_running_average=not train)
        gap = relu(gap)
        w2 = self.param("fc2", kaiming_normal, (1, 1, attn_chs // G, mid),
                        jnp.float32)
        attn = _conv(gap, w2.astype(gap.dtype), groups=G, padding=(0, 0))
        if R > 1:
            # RadixSoftmax: softmax over the radix axis per cardinal group
            attn = attn.reshape(b, R, G, C // G)
            attn = nn.softmax(attn, axis=1)
            out = (x.reshape(b, h, w, R, C)
                   * attn.reshape(b, 1, 1, R, C)).sum(axis=3)
        else:
            attn = nn.sigmoid(attn)
            out = x * attn
        return out


class ResNestBottleneck(nn.Module):
    planes: int
    stride: int = 1
    radix: int = 2
    cardinality: int = 1
    base_width: int = 64
    avd: bool = True
    avd_first: bool = False
    use_downsample: bool = False
    avg_down: bool = True
    dtype: Optional[Dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        group_width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        avd_stride = self.stride if (self.avd and self.stride > 1) else 0
        conv2_stride = 1 if avd_stride > 0 else self.stride

        residual = x
        out = ConvBnAct(group_width, 1, padding=(0, 0), dtype=self.dtype,
                        name="conv1")(x, train)
        if avd_stride > 0 and self.avd_first:
            out = _avg_pool(out, 3, avd_stride, 1)
        if self.radix >= 1:
            out = SplitAttn(group_width, radix=self.radix,
                            cardinality=self.cardinality, stride=conv2_stride,
                            dtype=self.dtype, name="conv2")(out, train)
        else:
            out = ConvBnAct(group_width, 3, stride=conv2_stride,
                            groups=self.cardinality, dtype=self.dtype,
                            name="conv2")(out, train)
        if avd_stride > 0 and not self.avd_first:
            out = _avg_pool(out, 3, avd_stride, 1)
        out = ConvBnAct(self.planes * self.expansion, 1, padding=(0, 0),
                        act=False, dtype=self.dtype, name="conv3")(out, train)

        if self.use_downsample:
            r = x
            if self.avg_down and self.stride > 1:
                r = _avg_pool(r, 2, self.stride, 0)
            residual = ConvBnAct(self.planes * self.expansion, 1,
                                 padding=(0, 0), act=False, dtype=self.dtype,
                                 name="downsample")(r, train)
        return relu(out + residual)


class ResNestEncoder(nn.Module):
    layers: Sequence[int]
    depth: int = 5
    stem_width: int = 32
    radix: int = 2
    cardinality: int = 1
    base_width: int = 64
    avd_first: bool = False
    dtype: Optional[Dtype] = None

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3, self.stem_width * 2, 256, 512, 1024, 2048)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = [x]
        if self.depth == 0:
            return features
        # deep stem: 3x3 s2 -> 3x3 -> 3x3 (to 2*stem_width)
        x = ConvBnAct(self.stem_width, 3, stride=2, dtype=self.dtype,
                      name="stem0")(x, train)
        x = ConvBnAct(self.stem_width, 3, dtype=self.dtype, name="stem1")(x, train)
        x = ConvBnAct(self.stem_width * 2, 3, dtype=self.dtype,
                      name="stem2")(x, train)
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
                x = ResNestBottleneck(
                    planes[li], stride=stride, radix=self.radix,
                    cardinality=self.cardinality, base_width=self.base_width,
                    avd_first=self.avd_first, use_downsample=need_ds,
                    dtype=self.dtype, name=f"layer{li + 1}_{bi}")(x, train)
            features.append(x)
        return features[: self.depth + 1]


# variant table: timm_resnest.py:89-209
RESNEST_ENCODERS = {
    "timm-resnest14d": dict(cls=ResNestEncoder, kw=dict(
        layers=(1, 1, 1, 1), stem_width=32)),
    "timm-resnest26d": dict(cls=ResNestEncoder, kw=dict(
        layers=(2, 2, 2, 2), stem_width=32)),
    "timm-resnest50d": dict(cls=ResNestEncoder, kw=dict(
        layers=(3, 4, 6, 3), stem_width=32)),
    "timm-resnest101e": dict(cls=ResNestEncoder, kw=dict(
        layers=(3, 4, 23, 3), stem_width=64)),
    "timm-resnest200e": dict(cls=ResNestEncoder, kw=dict(
        layers=(3, 24, 36, 3), stem_width=64)),
    "timm-resnest269e": dict(cls=ResNestEncoder, kw=dict(
        layers=(3, 30, 48, 8), stem_width=64)),
    "timm-resnest50d_4s2x40d": dict(cls=ResNestEncoder, kw=dict(
        layers=(3, 4, 6, 3), stem_width=32, radix=4, cardinality=2,
        base_width=40, avd_first=True)),
    "timm-resnest50d_1s4x24d": dict(cls=ResNestEncoder, kw=dict(
        layers=(3, 4, 6, 3), stem_width=32, radix=1, cardinality=4,
        base_width=24, avd_first=True)),
}
