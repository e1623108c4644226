"""Native MobileNetV3 encoder family (NHWC Flax).

De-gates the reference's `timm-mobilenetv3_*` encoders
(/root/reference/segmentation_models_pytorch/encoders/timm_mobilenetv3.py:
126-180). Architecture follows the MobileNetV3 paper / timm's
tf_mobilenetv3_* builds: hardswish activations, SE with hard-sigmoid gate
on the expanded width (ratio 0.25), TF 'same' padding on the stride-2
convs (asymmetric (0,1)/(1,2) — the tf_ variants), and the smp stage
split (large: stem+blocks0 | b1 | b2 | b3:5 | b5:+final-1x1; small:
stem | b0 | b1 | b2:4 | b4:+final-1x1). The `minimal` variants use relu,
no SE, and 3x3 kernels throughout. width_mult scales all widths through
make_divisible(8).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from senas_tpu.models.encoders import stage_dilation
from senas_tpu.ops.primitives import build_norm, kaiming_normal, relu

Dtype = Any


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _conv_same(x, w, stride: int = 1, groups: int = 1, dilation: int = 1):
    """TF 'same' padding (the tf_mobilenetv3 variants): symmetric k//2 at
    stride 1; asymmetric (lo, hi) with hi = lo + 1 parity at stride 2.
    With dilation (make_dilated stages run stride 1), the effective kernel
    (k-1)*d+1 keeps 'same' padding symmetric at (k//2)*d for odd k."""
    k = (w.shape[0] - 1) * dilation + 1
    if stride == 1:
        p = (k // 2, k // 2)
    else:
        total = max(k - stride, 0)
        p = (total // 2, total - total // 2)
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=(p, p),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


class _ConvBnAct(nn.Module):
    c_out: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: str = "hs"  # "hs" | "re" | none
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.param("kernel", kaiming_normal,
                       (self.kernel, self.kernel, x.shape[-1] // self.groups,
                        self.c_out), jnp.float32)
        x = _conv_same(x, w.astype(x.dtype),
                       stride=1 if self.dilation > 1 else self.stride,
                       groups=self.groups, dilation=self.dilation)
        x = build_norm(self.dtype, name="bn")(x, use_running_average=not train)
        if self.act == "hs":
            return hardswish(x)
        if self.act == "re":
            return relu(x)
        return x


class InvertedResidual(nn.Module):
    """MNv3 block: [1x1 expand] -> kxk depthwise -> [SE] -> 1x1 project."""

    exp: int
    c_out: int
    kernel: int = 3
    stride: int = 1
    se: bool = False
    act: str = "hs"
    # >1 = make_dilated-patched stage (conv strides 1, depthwise dilated;
    # residual condition keeps the ORIGINAL stride like the patched module)
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        residual = x
        y = x
        if self.exp != c_in:
            y = _ConvBnAct(self.exp, 1, act=self.act, dtype=self.dtype,
                           name="expand")(y, train)
        y = _ConvBnAct(self.exp, self.kernel, stride=self.stride,
                       groups=self.exp, dilation=self.dilation, act=self.act,
                       dtype=self.dtype, name="dw")(y, train)
        if self.se:
            rd = _make_divisible(self.exp * 0.25)
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            w1 = self.param("se_fc1", kaiming_normal, (1, 1, self.exp, rd),
                            jnp.float32)
            b1 = self.param("se_b1", nn.initializers.zeros, (rd,), jnp.float32)
            w2 = self.param("se_fc2", kaiming_normal, (1, 1, rd, self.exp),
                            jnp.float32)
            b2 = self.param("se_b2", nn.initializers.zeros, (self.exp,),
                            jnp.float32)
            s = relu(_conv_same(s, w1.astype(s.dtype)) + b1.astype(s.dtype))
            s = hardsigmoid(_conv_same(s, w2.astype(s.dtype))
                            + b2.astype(s.dtype))
            y = y * s
        y = _ConvBnAct(self.c_out, 1, act="none", dtype=self.dtype,
                       name="project")(y, train)
        if self.stride == 1 and c_in == self.c_out:
            y = y + residual
        return y


# per-block spec: (kernel, exp, out, se, act, stride); one tuple per block,
# grouped into timm's `blocks[i]` stage lists
_LARGE_BLOCKS = [
    [(3, 16, 16, False, "re", 1)],
    [(3, 64, 24, False, "re", 2), (3, 72, 24, False, "re", 1)],
    [(5, 72, 40, True, "re", 2), (5, 120, 40, True, "re", 1),
     (5, 120, 40, True, "re", 1)],
    [(3, 240, 80, False, "hs", 2), (3, 200, 80, False, "hs", 1),
     (3, 184, 80, False, "hs", 1), (3, 184, 80, False, "hs", 1)],
    [(3, 480, 112, True, "hs", 1), (3, 672, 112, True, "hs", 1)],
    [(5, 672, 160, True, "hs", 2), (5, 960, 160, True, "hs", 1),
     (5, 960, 160, True, "hs", 1)],
]
_SMALL_BLOCKS = [
    [(3, 16, 16, True, "re", 2)],
    [(3, 72, 24, False, "re", 2), (3, 88, 24, False, "re", 1)],
    [(5, 96, 40, True, "hs", 2), (5, 240, 40, True, "hs", 1),
     (5, 240, 40, True, "hs", 1)],
    [(5, 120, 48, True, "hs", 1), (5, 144, 48, True, "hs", 1)],
    [(5, 288, 96, True, "hs", 2), (5, 576, 96, True, "hs", 1),
     (5, 576, 96, True, "hs", 1)],
]


class MobileNetV3Encoder(nn.Module):
    mode: str = "large"            # "large" | "small"
    width_mult: float = 1.0
    minimal: bool = False          # relu, no SE, 3x3 kernels
    depth: int = 5
    output_stride: int = 32        # make_dilated surface (32 | 16 | 8)
    dtype: Optional[Dtype] = None

    @property
    def out_channels(self) -> Tuple[int, ...]:
        chs = ([16, 16, 24, 48, 576] if self.mode == "small"
               else [16, 24, 40, 112, 960])
        return ((3,) + tuple(_make_divisible(c * self.width_mult)
                             for c in chs))[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm = self.width_mult
        act0 = "re" if self.minimal else "hs"

        def spec(entry):
            k, e, c, se, act, s = entry
            if self.minimal:
                k, se, act = 3, False, "re"
            return dict(kernel=k, exp=_make_divisible(e * wm),
                        c_out=_make_divisible(c * wm), se=se, act=act,
                        stride=s)

        blocks = _SMALL_BLOCKS if self.mode == "small" else _LARGE_BLOCKS
        features = [x]
        if self.depth == 0:
            return features
        stem_c = _make_divisible(16 * wm)
        x = _ConvBnAct(stem_c, 3, stride=2, act=act0, dtype=self.dtype,
                       name="stem")(x, train)

        def run_stage(x, stage_idx, rate=1):
            for bi, entry in enumerate(blocks[stage_idx]):
                x = InvertedResidual(**spec(entry), dilation=rate,
                                     dtype=self.dtype,
                                     name=f"b{stage_idx}_{bi}")(x, train)
            return x

        final_c = _make_divisible((576 if self.mode == "small" else 960)
                                  * wm)
        if self.mode == "large":
            # smp stages: stem+b0 | b1 | b2 | b3+b4 | b5+final
            x = run_stage(x, 0)
            features.append(x)
            plan = [(1,), (2,), (3, 4), (5,)]
        else:
            # stem | b0 | b1 | b2+b3 | b4+final
            features.append(x)
            plan = [(0,), (1,), (2, 3), (4,)]
        for gi, group in enumerate(plan):
            if len(features) > self.depth:
                break
            rate = stage_dilation(gi + 2, self.output_stride)
            for si in group:
                x = run_stage(x, si, rate)
            if gi == len(plan) - 1:
                x = _ConvBnAct(final_c, 1, act=act0, dtype=self.dtype,
                               name="final_conv")(x, train)
            features.append(x)
        return features[: self.depth + 1]


MNV3_ENCODERS = {
    "timm-mobilenetv3_large_075": dict(cls=MobileNetV3Encoder, kw=dict(
        mode="large", width_mult=0.75)),
    "timm-mobilenetv3_large_100": dict(cls=MobileNetV3Encoder, kw=dict(
        mode="large", width_mult=1.0)),
    "timm-mobilenetv3_large_minimal_100": dict(cls=MobileNetV3Encoder, kw=dict(
        mode="large", width_mult=1.0, minimal=True)),
    "timm-mobilenetv3_small_075": dict(cls=MobileNetV3Encoder, kw=dict(
        mode="small", width_mult=0.75)),
    "timm-mobilenetv3_small_100": dict(cls=MobileNetV3Encoder, kw=dict(
        mode="small", width_mult=1.0)),
    "timm-mobilenetv3_small_minimal_100": dict(cls=MobileNetV3Encoder, kw=dict(
        mode="small", width_mult=1.0, minimal=True)),
}
