"""Additional encoder families for the baseline zoo: VGG, DenseNet,
MobileNetV2, EfficientNet-B0/1/2 (NHWC Flax).

Parity targets: segmentation_models_pytorch/encoders/{vgg,densenet,
mobilenet,efficientnet}.py — same stage boundaries and per-stage channel
contract (feature pyramid at strides 1,2,4,8,16,32), so every zoo decoder
works unchanged on top. The dpn/senet/inception*/xception families live in
encoders_families.py; only the timm-* wrappers (which expose timm's whole
model registry, not an architecture) stay gated with a clear error.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.models.encoders import stage_dilation
from senas_tpu.ops.primitives import (avg_pool_3x3, build_norm, conv2d,
                                      kaiming_normal, max_pool_3x3, relu)
from jax import lax

Dtype = Any

# VGG configs (vgg.py:34-39): numbers are conv widths, "M" is a 2x2 maxpool
_VGG_CFG = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
          512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


def _max_pool_2x2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), ((0, 0), (0, 0), (0, 0), (0, 0)))


class VGGEncoder(nn.Module):
    """VGG feature pyramid: a stage ends right before each maxpool, the
    final stage is the last pool alone (vgg.py:44-69 get_stages).
    out_channels: (64, 128, 256, 512, 512, 512)."""

    config: Tuple  # mix of ints and "M"
    batch_norm: bool = False
    depth: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = []
        stage = 0
        conv_i = 0
        for item in self.config:
            if item == "M":
                features.append(x)
                stage += 1
                if stage > self.depth:
                    break
                x = _max_pool_2x2(x)
            else:
                w = self.param(f"conv{conv_i}", kaiming_normal,
                               (3, 3, x.shape[-1], item), jnp.float32)
                b = self.param(f"bias{conv_i}", nn.initializers.zeros,
                               (item,), jnp.float32)
                x = conv2d(x.astype(self.dtype or x.dtype),
                           w.astype(self.dtype or x.dtype)) + b.astype(
                    self.dtype or x.dtype)
                if self.batch_norm:
                    x = build_norm(self.dtype, name=f"bn{conv_i}")(
                        x, use_running_average=not train)
                x = relu(x)
                conv_i += 1
        if stage <= self.depth:  # trailing stage: the final maxpool
            features.append(_max_pool_2x2(features[-1]))
        return features[: self.depth + 1]


class _DenseLayer(nn.Module):
    growth: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = build_norm(self.dtype, name="norm1")(x, use_running_average=not train)
        y = relu(y)
        w1 = self.param("conv1", kaiming_normal,
                        (1, 1, y.shape[-1], 4 * self.growth), jnp.float32)
        y = conv2d(y, w1.astype(y.dtype))
        y = build_norm(self.dtype, name="norm2")(y, use_running_average=not train)
        y = relu(y)
        w2 = self.param("conv2", kaiming_normal,
                        (3, 3, 4 * self.growth, self.growth), jnp.float32)
        y = conv2d(y, w2.astype(y.dtype))
        return jnp.concatenate([x, y], axis=-1)


class DenseNetEncoder(nn.Module):
    """DenseNet feature pyramid (densenet.py stage contract):
    f0 = x, f1 = stem conv (stride 2), then each dense block's output taken
    BEFORE its transition's pooling, final block after the last norm."""

    growth: int = 32
    init_channels: int = 64
    block_layers: Sequence[int] = (6, 12, 24, 16)
    depth: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        if self.depth == 0:
            return features
        w = self.param("conv0", kaiming_normal,
                       (7, 7, x.shape[-1], self.init_channels), jnp.float32)
        x = conv2d(x.astype(self.dtype or x.dtype),
                   w.astype(self.dtype or x.dtype), stride=2)
        x = build_norm(self.dtype, name="norm0")(x, use_running_average=not train)
        x = relu(x)
        features.append(x)

        x = max_pool_3x3(x, stride=2)
        for bi, n_layers in enumerate(self.block_layers):
            if len(features) > self.depth:
                break
            for li in range(n_layers):
                x = _DenseLayer(self.growth, dtype=self.dtype,
                                name=f"block{bi}_layer{li}")(x, train)
            last = bi == len(self.block_layers) - 1
            x = build_norm(self.dtype, name=f"trans{bi}_norm")(
                x, use_running_average=not train)
            x = relu(x)
            features.append(x)  # block output, pre-transition-pool
            if not last:
                wt = self.param(f"trans{bi}_conv", kaiming_normal,
                                (1, 1, x.shape[-1], x.shape[-1] // 2),
                                jnp.float32)
                x = conv2d(x, wt.astype(x.dtype))
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return features[: self.depth + 1]


class _InvertedResidual(nn.Module):
    c_out: int
    stride: int
    expand: int
    # >1 = block sits in a make_dilated-patched stage (conv strides 1,
    # depthwise dilated; the residual condition keeps the ORIGINAL stride
    # exactly as the patched torch module does)
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        hidden = c_in * self.expand
        eff_stride = 1 if self.dilation > 1 else self.stride
        y = x
        if self.expand != 1:
            w = self.param("expand_conv", kaiming_normal,
                           (1, 1, c_in, hidden), jnp.float32)
            y = conv2d(y, w.astype(y.dtype))
            y = build_norm(self.dtype, name="expand_bn")(
                y, use_running_average=not train)
            y = nn.relu6(y)
        wd = self.param("dw_conv", kaiming_normal, (3, 3, 1, hidden),
                        jnp.float32)
        y = conv2d(y, wd.astype(y.dtype), stride=eff_stride, groups=hidden,
                   dilation=self.dilation)
        y = build_norm(self.dtype, name="dw_bn")(y, use_running_average=not train)
        y = nn.relu6(y)
        wp = self.param("project_conv", kaiming_normal,
                        (1, 1, hidden, self.c_out), jnp.float32)
        y = conv2d(y, wp.astype(y.dtype))
        y = build_norm(self.dtype, name="project_bn")(
            y, use_running_average=not train)
        if self.stride == 1 and c_in == self.c_out:
            y = x + y
        return y


# MobileNetV2 inverted-residual plan: (expand, channels, repeats, stride)
_MBV2_PLAN = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
              (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
# smp stage boundaries: features at (3, 16, 24, 32, 96, 1280)
_MBV2_STAGE_AFTER = {0: 1, 1: 2, 2: 3, 4: 4}  # plan index -> pyramid level
# pyramid stage each plan group belongs to (mobilenet.py get_stages:
# features[2:4]=stage2, [4:7]=stage3, [7:14]=stage4, [14:]=stage5)
_MBV2_GROUP_STAGE = {0: 1, 1: 2, 2: 3, 3: 4, 4: 4, 5: 5, 6: 5}


class MobileNetV2Encoder(nn.Module):
    """MobileNetV2 feature pyramid (mobilenet.py stage contract):
    out_channels (3, 16, 24, 32, 96, 1280)."""

    depth: int = 5
    output_stride: int = 32          # make_dilated surface (32 | 16 | 8)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        if self.depth == 0:
            return features
        w = self.param("stem_conv", kaiming_normal, (3, 3, x.shape[-1], 32),
                       jnp.float32)
        x = conv2d(x.astype(self.dtype or x.dtype),
                   w.astype(self.dtype or x.dtype), stride=2)
        x = build_norm(self.dtype, name="stem_bn")(x, use_running_average=not train)
        x = nn.relu6(x)
        for pi, (t, c, n, s) in enumerate(_MBV2_PLAN):
            rate = stage_dilation(_MBV2_GROUP_STAGE[pi], self.output_stride)
            for r in range(n):
                x = _InvertedResidual(c, s if r == 0 else 1, t,
                                      dilation=rate, dtype=self.dtype,
                                      name=f"block{pi}_{r}")(x, train)
            if pi in _MBV2_STAGE_AFTER:
                features.append(x)
                if len(features) > self.depth:
                    return features[: self.depth + 1]
        wl = self.param("last_conv", kaiming_normal, (1, 1, x.shape[-1], 1280),
                        jnp.float32)
        x = conv2d(x, wl.astype(x.dtype))
        x = build_norm(self.dtype, name="last_bn")(x, use_running_average=not train)
        x = nn.relu6(x)
        features.append(x)
        return features[: self.depth + 1]


EXTRA_ENCODERS = {
    "vgg11": dict(cls=VGGEncoder, kw=dict(config=tuple(_VGG_CFG["A"]))),
    "vgg11_bn": dict(cls=VGGEncoder,
                     kw=dict(config=tuple(_VGG_CFG["A"]), batch_norm=True)),
    "vgg13": dict(cls=VGGEncoder, kw=dict(config=tuple(_VGG_CFG["B"]))),
    "vgg13_bn": dict(cls=VGGEncoder,
                     kw=dict(config=tuple(_VGG_CFG["B"]), batch_norm=True)),
    "vgg16": dict(cls=VGGEncoder, kw=dict(config=tuple(_VGG_CFG["D"]))),
    "vgg16_bn": dict(cls=VGGEncoder,
                     kw=dict(config=tuple(_VGG_CFG["D"]), batch_norm=True)),
    "vgg19": dict(cls=VGGEncoder, kw=dict(config=tuple(_VGG_CFG["E"]))),
    "vgg19_bn": dict(cls=VGGEncoder,
                     kw=dict(config=tuple(_VGG_CFG["E"]), batch_norm=True)),
    "densenet121": dict(cls=DenseNetEncoder,
                        kw=dict(block_layers=(6, 12, 24, 16))),
    "densenet169": dict(cls=DenseNetEncoder,
                        kw=dict(block_layers=(6, 12, 32, 32))),
    "densenet201": dict(cls=DenseNetEncoder,
                        kw=dict(block_layers=(6, 12, 48, 32))),
    "densenet161": dict(cls=DenseNetEncoder,
                        kw=dict(block_layers=(6, 12, 36, 24), growth=48,
                                init_channels=96)),
    "mobilenet_v2": dict(cls=MobileNetV2Encoder, kw=dict()),
}

# Remaining timm-backed surface with no native port: only the tu-
# TimmUniversalEncoder (a wrapper over timm's whole pretrained registry,
# not an architecture). Every timm-* architecture family is natively
# ported: resnest / res2net / regnet / sknet / gernet / mobilenetv3
# (encoders_resnest.py, encoders_timm2.py, encoders_mnv3.py) and
# efficientnet b0-b8/l2 + tf_efficientnet_lite0-4 (below).
GATED_FAMILIES = ("tu-",)


# ---------------------------------------------------------------------------
# EfficientNet (native Flax; efficientnet.py stage contract)
# ---------------------------------------------------------------------------

def _round_filters(c: int, width_mult: float, divisor: int = 8) -> int:
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(n: int, depth_mult: float) -> int:
    import math
    return int(math.ceil(depth_mult * n))


class _MBConv(nn.Module):
    """MBConv: expand 1x1 -> depthwise kxk (stride s) -> SE(0.25 of block
    input) -> project 1x1, swish activations, residual when shapes match.
    Stochastic depth (drop-connect) is omitted — a train-time regularizer
    the reference only gets via the efficientnet_pytorch wheel."""

    c_out: int
    kernel: int
    stride: int
    expand: int
    # lite (timm tf_efficientnet_lite*): relu6 instead of swish, no SE
    lite: bool = False
    # >1 = block sits in a make_dilated-patched stage (conv strides 1,
    # depthwise dilated; residual condition keeps the ORIGINAL stride)
    dilation: int = 1
    dtype: Optional[Dtype] = None

    def _act(self, y):
        return nn.relu6(y) if self.lite else nn.swish(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        hidden = c_in * self.expand
        eff_stride = 1 if self.dilation > 1 else self.stride
        y = x
        if self.expand != 1:
            w = self.param("expand_conv", kaiming_normal, (1, 1, c_in, hidden),
                           jnp.float32)
            y = conv2d(y, w.astype(y.dtype))
            y = build_norm(self.dtype, name="expand_bn")(
                y, use_running_average=not train)
            y = self._act(y)
        wd = self.param("dw_conv", kaiming_normal,
                        (self.kernel, self.kernel, 1, hidden), jnp.float32)
        y = conv2d(y, wd.astype(y.dtype), stride=eff_stride, groups=hidden,
                   dilation=self.dilation)
        y = build_norm(self.dtype, name="dw_bn")(y, use_running_average=not train)
        y = self._act(y)
        if not self.lite:
            # squeeze-excite, reduction relative to the BLOCK INPUT channels
            se_c = max(1, c_in // 4)
            s = jnp.mean(y, axis=(1, 2))
            w1 = self.param("se_reduce", kaiming_normal, (hidden, se_c), jnp.float32)
            b1 = self.param("se_reduce_b", nn.initializers.zeros, (se_c,), jnp.float32)
            w2 = self.param("se_expand", kaiming_normal, (se_c, hidden), jnp.float32)
            b2 = self.param("se_expand_b", nn.initializers.zeros, (hidden,), jnp.float32)
            s = nn.swish(s @ w1.astype(s.dtype) + b1.astype(s.dtype))
            s = nn.sigmoid(s @ w2.astype(s.dtype) + b2.astype(s.dtype))
            y = y * s[:, None, None, :]
        wp = self.param("project_conv", kaiming_normal,
                        (1, 1, hidden, self.c_out), jnp.float32)
        y = conv2d(y, wp.astype(y.dtype))
        y = build_norm(self.dtype, name="project_bn")(
            y, use_running_average=not train)
        if self.stride == 1 and c_in == self.c_out:
            y = x + y
        return y


# base (t expand, c channels, n repeats, k kernel, s stride) — EfficientNet-B0
_EFFNET_PLAN = [(1, 16, 1, 3, 1), (6, 24, 2, 3, 2), (6, 40, 2, 5, 2),
                (6, 80, 3, 3, 2), (6, 112, 3, 5, 1), (6, 192, 4, 5, 2),
                (6, 320, 1, 3, 1)]
# feature taps after these plan groups -> pyramid levels 2..5
_EFFNET_STAGE_AFTER = {1: 2, 2: 3, 4: 4, 6: 5}
# pyramid stage each plan group belongs to (efficientnet.py stage_idxs)
_EFFNET_GROUP_STAGE = {0: 2, 1: 2, 2: 3, 3: 4, 4: 4, 5: 5, 6: 5}


class EfficientNetEncoder(nn.Module):
    """EfficientNet-B* feature pyramid: f1 = stem (stride 2), then
    taps after the c24 / c40 / c112 / c320 block groups — the smp
    stage_idxs boundaries (efficientnet.py:45-53, 110-129).

    ``lite=True`` builds the EfficientNet-Lite variant exactly as smp's
    timm wrapper does (timm_efficientnet.py:53-91): relu6 instead of
    swish, no squeeze-excite, stem channels fixed at 32 (``fix_stem``),
    and first/last block-group repeats not scaled by the depth
    multiplier (``fix_first_last``)."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    depth: int = 5
    lite: bool = False
    output_stride: int = 32          # make_dilated surface (32 | 16 | 8)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        if self.depth == 0:
            return features
        act = nn.relu6 if self.lite else nn.swish
        stem_c = 32 if self.lite else _round_filters(32, self.width_mult)
        w = self.param("stem_conv", kaiming_normal, (3, 3, x.shape[-1], stem_c),
                       jnp.float32)
        x = conv2d(x.astype(self.dtype or x.dtype),
                   w.astype(self.dtype or x.dtype), stride=2)
        x = build_norm(self.dtype, name="stem_bn")(x, use_running_average=not train)
        x = act(x)
        features.append(x)
        last_pi = len(_EFFNET_PLAN) - 1
        for pi, (t, c, n, k, s) in enumerate(_EFFNET_PLAN):
            c_out = _round_filters(c, self.width_mult)
            if self.lite and pi in (0, last_pi):
                n_rep = n
            else:
                n_rep = _round_repeats(n, self.depth_mult)
            rate = stage_dilation(_EFFNET_GROUP_STAGE[pi], self.output_stride)
            for r in range(n_rep):
                x = _MBConv(c_out, k, s if r == 0 else 1, t, lite=self.lite,
                            dilation=rate, dtype=self.dtype,
                            name=f"block{pi}_{r}")(x, train)
            if pi in _EFFNET_STAGE_AFTER:
                features.append(x)
                if len(features) > self.depth:
                    break
        return features[: self.depth + 1]


EXTRA_ENCODERS.update({
    # (width_mult, depth_mult) per the EfficientNet compound-scaling table;
    # smp ships b0..b7 (efficientnet.py:106-177)
    "efficientnet-b0": dict(cls=EfficientNetEncoder,
                            kw=dict(width_mult=1.0, depth_mult=1.0)),
    "efficientnet-b1": dict(cls=EfficientNetEncoder,
                            kw=dict(width_mult=1.0, depth_mult=1.1)),
    "efficientnet-b2": dict(cls=EfficientNetEncoder,
                            kw=dict(width_mult=1.1, depth_mult=1.2)),
    "efficientnet-b3": dict(cls=EfficientNetEncoder,
                            kw=dict(width_mult=1.2, depth_mult=1.4)),
    "efficientnet-b4": dict(cls=EfficientNetEncoder,
                            kw=dict(width_mult=1.4, depth_mult=1.8)),
    "efficientnet-b5": dict(cls=EfficientNetEncoder,
                            kw=dict(width_mult=1.6, depth_mult=2.2)),
    "efficientnet-b6": dict(cls=EfficientNetEncoder,
                            kw=dict(width_mult=1.8, depth_mult=2.6)),
    "efficientnet-b7": dict(cls=EfficientNetEncoder,
                            kw=dict(width_mult=2.0, depth_mult=3.1)),
})

# timm-efficientnet-* duplicates the efficientnet-b* architecture through
# timm's builder (differences are pretrained-weight provenance + BN eps,
# both moot without downloaded weights); smp additionally exposes b8/l2
# and the tf_efficientnet_lite family there (timm_efficientnet.py:156-383).
EXTRA_ENCODERS.update({
    f"timm-efficientnet-{k}": dict(cls=EfficientNetEncoder,
                                   kw=dict(width_mult=wm, depth_mult=dm))
    for k, (wm, dm) in {
        "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
        "b3": (1.2, 1.4), "b4": (1.4, 1.8), "b5": (1.6, 2.2),
        "b6": (1.8, 2.6), "b7": (2.0, 3.1), "b8": (2.2, 3.6),
        "l2": (4.3, 5.3),
    }.items()
})
EXTRA_ENCODERS.update({
    f"timm-tf_efficientnet_lite{i}": dict(
        cls=EfficientNetEncoder,
        kw=dict(width_mult=wm, depth_mult=dm, lite=True))
    for i, (wm, dm) in enumerate(
        [(1.0, 1.0), (1.0, 1.1), (1.1, 1.2), (1.2, 1.4), (1.4, 1.8)])
})
