"""Native Flax implementations of the remaining smp encoder families:
SE-Net (se_resnet50/101/152, se_resnext50/101_32x4d, senet154), Xception,
InceptionV4, InceptionResNetV2 and DPN (dpn68/68b/92/98/107/131).

The reference wraps these through the `pretrainedmodels` wheel
(segmentation_models_pytorch/encoders/{senet,xception,inceptionv4,
inceptionresnetv2,dpn}.py); that package is not in this image, so here they
are re-implemented natively (NHWC Flax) against the same STAGE CONTRACT the
smp wrappers expose — the (out_channels, stride) pyramid per stage listed in
each smp encoder's `params["out_channels"]` and `get_stages()` — so every
zoo decoder composes unchanged. Pretrained ImageNet weights are not
available offline; encoders initialize randomly (kaiming), which matches
how the reference runs in this environment too (zero egress).

Stage contracts implemented (all from the smp wrapper files cited above):
  senet154            (3, 128, 256, 512, 1024, 2048)
  se_resnet50/...     (3,  64, 256, 512, 1024, 2048)
  xception            (3,  64, 128, 256,  728, 2048)
  inceptionv4         (3,  64, 192, 384, 1024, 1536)   stage_idxs (3,5,9,15)
  inceptionresnetv2   (3,  64, 192, 320, 1088, 1536)
  dpn68/68b           (3,  10, 144, 320,  704,  832)
  dpn92               (3,  64, 336, 704, 1552, 2688)
  dpn98               (3,  96, 336, 768, 1728, 2688)
  dpn107              (3, 128, 376, 1152, 2432, 2688)
  dpn131              (3, 128, 352, 832, 1984, 2688)

The smp wrappers "correct paddings" on 3x3 convs and stride-2 maxpools
(inceptionv4.py:42-47, inceptionresnetv2.py:42-48, xception.py:20-22) so
the pyramid halves exactly per stage; the same padding rule is applied here.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from senas_tpu.models.encoders import stage_dilation
from senas_tpu.ops.primitives import build_norm, kaiming_normal, relu

Dtype = Any


# ---------------------------------------------------------------------------
# rectangular conv / pool helpers (Inception needs 1x7 / 7x1 kernels)
# ---------------------------------------------------------------------------

def _conv(x, w, stride=1, groups: int = 1, dilation: int = 1, padding=None):
    """NHWC/HWIO conv with torch-style explicit padding (default (k//2)*d)."""
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = ((kh // 2) * dilation, (kw // 2) * dilation)
    ph, pw = padding
    s = (stride, stride) if isinstance(stride, int) else stride
    return lax.conv_general_dilated(
        x, w, window_strides=s, padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _max_pool(x, k: int = 3, stride: int = 2, pad=1):
    """MaxPool2d; `pad` is an int (symmetric) or (lo, hi) tuple.

    pad=(0, 1) reproduces torch's ceil_mode=True window alignment for even
    inputs (windows anchored at 0, the trailing partial window padded)."""
    lo, hi = (pad, pad) if isinstance(pad, int) else pad
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (lo, hi), (lo, hi), (0, 0)))


def _avg_pool_same(x, k: int = 3):
    """AvgPool2d(k, stride 1, pad k//2, count_include_pad=False)."""
    p = k // 2
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    window, strides = (1, k, k, 1), (1, 1, 1, 1)
    pad = ((0, 0), (p, p), (p, p), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pad)
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, pad)
    return summed / counts


class ConvBnAct(nn.Module):
    """conv (no bias) -> BN -> ReLU; the BasicConv2d of the inception nets.

    kernel may be an int or (kh, kw); padding follows torch's explicit-pad
    style with the smp "corrected" default (k//2 per axis)."""

    c_out: int
    kernel: Any = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    padding: Optional[Tuple[int, int]] = None
    act: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel if isinstance(self.kernel, tuple) else (
            self.kernel, self.kernel)
        w = self.param("kernel", kaiming_normal,
                       (k[0], k[1], x.shape[-1] // self.groups, self.c_out),
                       jnp.float32)
        x = _conv(x, w.astype(x.dtype), stride=self.stride, groups=self.groups,
                  dilation=self.dilation, padding=self.padding)
        x = build_norm(self.dtype, name="bn")(x, use_running_average=not train)
        return relu(x) if self.act else x


# ---------------------------------------------------------------------------
# SENet family (pretrainedmodels senet.py semantics)
# ---------------------------------------------------------------------------

class _SEModule(nn.Module):
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = c // self.reduction
        s = jnp.mean(x, axis=(1, 2))
        w1 = self.param("fc1", kaiming_normal, (c, mid), jnp.float32)
        b1 = self.param("fc1_b", nn.initializers.zeros, (mid,), jnp.float32)
        w2 = self.param("fc2", kaiming_normal, (mid, c), jnp.float32)
        b2 = self.param("fc2_b", nn.initializers.zeros, (c,), jnp.float32)
        s = relu(s @ w1.astype(s.dtype) + b1.astype(s.dtype))
        s = nn.sigmoid(s @ w2.astype(s.dtype) + b2.astype(s.dtype))
        return x * s[:, None, None, :]


class _SEBottleneck(nn.Module):
    """The three SENet bottleneck variants, selected by `style`:

      * "senet"    — SEBottleneck: 1x1 -> planes*2, grouped 3x3 (stride)
                     -> planes*4, 1x1 -> planes*4 (senet154)
      * "resnet"   — SEResNetBottleneck: STRIDE ON THE 1x1 conv1 (the Caffe
                     quirk pretrainedmodels preserves), 3x3 stride 1
      * "resnext"  — SEResNeXtBottleneck: width = planes*base_width/64 *
                     groups, stride on the grouped 3x3
    """

    planes: int
    style: str
    stride: int = 1
    groups: int = 1
    reduction: int = 16
    base_width: int = 4
    downsample_kernel: int = 1
    # >1 = block sits in a make_dilated-patched stage: every conv runs
    # stride 1 with this dilation (smp encoders/_utils.py:48-60)
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_out = self.planes * 4
        d = self.dilation
        if self.style == "senet":
            w1, w2, s1, s2, g = self.planes * 2, self.planes * 4, 1, self.stride, self.groups
        elif self.style == "resnet":
            w1, w2, s1, s2, g = self.planes, self.planes, self.stride, 1, 1
        else:  # resnext
            width = math.floor(self.planes * (self.base_width / 64)) * self.groups
            w1, w2, s1, s2, g = width, width, 1, self.stride, self.groups
        sd = self.stride
        if d > 1:
            s1 = s2 = sd = 1
        y = ConvBnAct(w1, kernel=1, stride=s1, dilation=d, dtype=self.dtype,
                      name="conv1")(x, train)
        y = ConvBnAct(w2, kernel=3, stride=s2, groups=g, dilation=d,
                      dtype=self.dtype, name="conv2")(y, train)
        y = ConvBnAct(c_out, kernel=1, act=False, dilation=d, dtype=self.dtype,
                      name="conv3")(y, train)
        y = _SEModule(self.reduction, dtype=self.dtype, name="se")(y)
        if self.stride != 1 or x.shape[-1] != c_out:
            x = ConvBnAct(c_out, kernel=self.downsample_kernel,
                          stride=sd, dilation=d, act=False, dtype=self.dtype,
                          name="downsample")(x, train)
        return relu(x + y)


class SENetEncoder(nn.Module):
    """SENet feature pyramid (smp senet.py get_stages): stage1 = layer0
    convs, stage2 = maxpool + layer1, stages 3-5 = layer2-4."""

    layers: Sequence[int]
    style: str = "resnet"
    groups: int = 1
    reduction: int = 16
    input_3x3: bool = False          # senet154 stem: 3x conv3x3 (64,64,128)
    downsample_kernel: int = 1       # senet154 uses 3 for layers 2-4
    depth: int = 5
    output_stride: int = 32          # make_dilated surface (32 | 16 | 8)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        if self.depth == 0:
            return features
        if self.input_3x3:
            x = ConvBnAct(64, 3, stride=2, dtype=self.dtype, name="stem0")(x, train)
            x = ConvBnAct(64, 3, dtype=self.dtype, name="stem1")(x, train)
            x = ConvBnAct(128, 3, dtype=self.dtype, name="stem2")(x, train)
        else:
            x = ConvBnAct(64, 7, stride=2, dtype=self.dtype, name="stem0")(x, train)
        features.append(x)

        planes = (64, 128, 256, 512)
        for li, n_blocks in enumerate(self.layers):
            if len(features) > self.depth:
                break
            if li == 0:
                # pretrainedmodels SENet: MaxPool2d(3, stride=2,
                # ceil_mode=True) — pad 0 + trailing partial window, i.e.
                # asymmetric (0, 1) padding, NOT symmetric pad 1
                x = _max_pool(x, 3, 2, (0, 1))
            rate = stage_dilation(li + 2, self.output_stride)
            for b in range(n_blocks):
                stride = 2 if (li > 0 and b == 0) else 1
                # layer1 always uses a 1x1 downsample (pretrainedmodels
                # passes downsample_kernel_size=1 for layer1 explicitly)
                dk = 1 if li == 0 else self.downsample_kernel
                x = _SEBottleneck(planes[li], self.style, stride=stride,
                                  groups=self.groups, reduction=self.reduction,
                                  downsample_kernel=dk, dilation=rate,
                                  dtype=self.dtype,
                                  name=f"layer{li + 1}_{b}")(x, train)
            features.append(x)
        return features[: self.depth + 1]


# ---------------------------------------------------------------------------
# Xception (pretrainedmodels xception.py semantics, smp-corrected padding)
# ---------------------------------------------------------------------------

class _SeparableConv(nn.Module):
    c_out: int
    kernel: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from senas_tpu.ops.primitives import conv2d

        c_in = x.shape[-1]
        dw = self.param("depthwise", kaiming_normal,
                        (self.kernel, self.kernel, 1, c_in), jnp.float32)
        # primitives.conv2d so the DENSE_DEPTHWISE_MAX_CHANNELS block-diagonal
        # MXU rewrite applies uniformly (same padding: k//2 symmetric)
        x = conv2d(x, dw.astype(x.dtype), groups=c_in)
        pw = self.param("pointwise", kaiming_normal, (1, 1, c_in, self.c_out),
                        jnp.float32)
        return conv2d(x, pw.astype(x.dtype))


class _XceptionBlock(nn.Module):
    c_out: int
    reps: int
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        skip = x
        if self.c_out != c_in or self.stride != 1:
            skip = ConvBnAct(self.c_out, kernel=1, stride=self.stride,
                             act=False, padding=(0, 0), dtype=self.dtype,
                             name="skip")(x, train)
        y = x
        widths = ([self.c_out] * self.reps if self.grow_first
                  else [c_in] * (self.reps - 1) + [self.c_out])
        for i, w in enumerate(widths):
            if i > 0 or self.start_with_relu:
                y = relu(y)
            y = _SeparableConv(w, dtype=self.dtype, name=f"sep{i}")(y)
            y = build_norm(self.dtype, name=f"bn{i}")(
                y, use_running_average=not train)
        if self.stride != 1:
            y = _max_pool(y, 3, self.stride, 1)
        return y + skip


class XceptionEncoder(nn.Module):
    """Xception pyramid (smp xception.py get_stages): stem (64, s2),
    block1 (128, s4), block2 (256, s8), block3..11 (728, s16),
    block12+conv3/4 (2048, s32; ends on bn4, no final relu)."""

    depth: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        if self.depth == 0:
            return features
        x = ConvBnAct(32, 3, stride=2, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBnAct(64, 3, dtype=self.dtype, name="conv2")(x, train)
        features.append(x)
        if self.depth >= 2:
            x = _XceptionBlock(128, 2, stride=2, start_with_relu=False,
                               dtype=self.dtype, name="block1")(x, train)
            features.append(x)
        if self.depth >= 3:
            x = _XceptionBlock(256, 2, stride=2, dtype=self.dtype,
                               name="block2")(x, train)
            features.append(x)
        if self.depth >= 4:
            x = _XceptionBlock(728, 2, stride=2, dtype=self.dtype,
                               name="block3")(x, train)
            for i in range(4, 12):
                x = _XceptionBlock(728, 3, dtype=self.dtype,
                                   name=f"block{i}")(x, train)
            features.append(x)
        if self.depth >= 5:
            x = _XceptionBlock(1024, 2, stride=2, grow_first=False,
                               dtype=self.dtype, name="block12")(x, train)
            x = _SeparableConv(1536, dtype=self.dtype, name="conv3")(x)
            x = build_norm(self.dtype, name="bn3")(x, use_running_average=not train)
            x = relu(x)
            x = _SeparableConv(2048, dtype=self.dtype, name="conv4")(x)
            x = build_norm(self.dtype, name="bn4")(x, use_running_average=not train)
            features.append(x)
        return features[: self.depth + 1]


# ---------------------------------------------------------------------------
# InceptionV4 (pretrainedmodels inceptionv4.py, smp stage_idxs (3,5,9,15))
# ---------------------------------------------------------------------------

class _InceptionMixed(nn.Module):
    """Generic concat-of-branches block. Each branch is a list of
    (c_out, kernel, stride, padding) conv specs, or the string
    "maxpool"/"avgpool+<c>" for the pooling branches."""

    branches: Tuple
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for bi, branch in enumerate(self.branches):
            y = x
            if branch == "maxpool":
                y = _max_pool(y, 3, 2, 1)
            elif isinstance(branch, str) and branch.startswith("avgpool+"):
                y = _avg_pool_same(y, 3)
                y = ConvBnAct(int(branch.split("+")[1]), kernel=1,
                              dtype=self.dtype, name=f"b{bi}_pool_conv")(y, train)
            else:
                for ci, (c, k, s, p) in enumerate(branch):
                    y = ConvBnAct(c, kernel=k, stride=s, padding=p,
                                  dtype=self.dtype, name=f"b{bi}_{ci}")(y, train)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


def _iv4_feature_blocks(dtype):
    """The 22-entry features list of InceptionV4 as (name, module-factory)."""
    C = ConvBnAct
    M = _InceptionMixed

    def conv(c, k=3, s=1, p=None):
        return (c, k, s, p)

    inception_a = lambda name: M((
        [conv(96, 1)],
        [conv(64, 1), conv(96, 3)],
        [conv(64, 1), conv(96, 3), conv(96, 3)],
        "avgpool+96"), dtype=dtype, name=name)
    inception_b = lambda name: M((
        [conv(384, 1)],
        [conv(192, 1), conv(224, (1, 7), 1, (0, 3)), conv(256, (7, 1), 1, (3, 0))],
        [conv(192, 1), conv(192, (7, 1), 1, (3, 0)), conv(224, (1, 7), 1, (0, 3)),
         conv(224, (7, 1), 1, (3, 0)), conv(256, (1, 7), 1, (0, 3))],
        "avgpool+128"), dtype=dtype, name=name)

    blocks = [
        ("f0", lambda: C(32, 3, stride=2, dtype=dtype, name="f0")),
        ("f1", lambda: C(32, 3, dtype=dtype, name="f1")),
        ("f2", lambda: C(64, 3, dtype=dtype, name="f2")),
        # Mixed_3a: maxpool || conv 3x3 s2 96 -> 160
        ("mixed_3a", lambda: M(("maxpool", [conv(96, 3, 2)]),
                               dtype=dtype, name="mixed_3a")),
        # Mixed_4a: (1x1 64, 3x3 96) || (1x1 64, 1x7, 7x1, 3x3 96) -> 192.
        # pretrainedmodels leaves these final 3x3s unpadded; the smp wrapper
        # "corrects" every 3x3 conv to padding 1 (inceptionv4.py:42-47), so
        # they are written padded here.
        ("mixed_4a", lambda: M((
            [conv(64, 1), conv(96, 3, 1, (1, 1))],
            [conv(64, 1), conv(64, (1, 7), 1, (0, 3)),
             conv(64, (7, 1), 1, (3, 0)), conv(96, 3, 1, (1, 1))]),
            dtype=dtype, name="mixed_4a")),
        # Mixed_5a: conv 3x3 s2 192 || maxpool -> 384
        ("mixed_5a", lambda: M(([conv(192, 3, 2)], "maxpool"),
                               dtype=dtype, name="mixed_5a")),
    ]
    for i in range(4):
        blocks.append((f"inception_a{i}",
                       (lambda n: (lambda: inception_a(n)))(f"inception_a{i}")))
    blocks.append(("reduction_a", lambda: M((
        [conv(384, 3, 2)],
        [conv(192, 1), conv(224, 3), conv(256, 3, 2)],
        "maxpool"), dtype=dtype, name="reduction_a")))
    for i in range(7):
        blocks.append((f"inception_b{i}",
                       (lambda n: (lambda: inception_b(n)))(f"inception_b{i}")))
    blocks.append(("reduction_b", lambda: M((
        [conv(192, 1), conv(192, 3, 2)],
        [conv(256, 1), conv(256, (1, 7), 1, (0, 3)),
         conv(320, (7, 1), 1, (3, 0)), conv(320, 3, 2)],
        "maxpool"), dtype=dtype, name="reduction_b")))
    return blocks


class _InceptionC(nn.Module):
    """Inception-C: branches with internal splits (1536 out)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = ConvBnAct
        b0 = C(256, 1, dtype=self.dtype, name="b0")(x, train)
        y1 = C(384, 1, dtype=self.dtype, name="b1_0")(x, train)
        b1a = C(256, (1, 3), padding=(0, 1), dtype=self.dtype, name="b1_1a")(y1, train)
        b1b = C(256, (3, 1), padding=(1, 0), dtype=self.dtype, name="b1_1b")(y1, train)
        y2 = C(384, 1, dtype=self.dtype, name="b2_0")(x, train)
        y2 = C(448, (3, 1), padding=(1, 0), dtype=self.dtype, name="b2_1")(y2, train)
        y2 = C(512, (1, 3), padding=(0, 1), dtype=self.dtype, name="b2_2")(y2, train)
        b2a = C(256, (1, 3), padding=(0, 1), dtype=self.dtype, name="b2_3a")(y2, train)
        b2b = C(256, (3, 1), padding=(1, 0), dtype=self.dtype, name="b2_3b")(y2, train)
        b3 = _avg_pool_same(x, 3)
        b3 = C(256, 1, dtype=self.dtype, name="b3_1")(b3, train)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=-1)


class InceptionV4Encoder(nn.Module):
    """InceptionV4 pyramid, smp stage split (3, 5, 9, 15) over the
    22-entry features list; out_channels (3, 64, 192, 384, 1024, 1536).
    Every 3x3 conv and stride-2 maxpool runs padding-corrected to pad 1
    (smp inceptionv4.py:42-47 rewrites the pretrainedmodels paddings); the
    (0,0)->(1,1) rewrite below applies that correction to the spec table."""

    depth: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        blocks = _iv4_feature_blocks(self.dtype)
        stage_ends = (3, 5, 9, 15, len(blocks) + 3)  # +3 inception_c blocks
        features = [x]
        idx = 0
        for name, factory in blocks:
            if len(features) > self.depth:
                return features[: self.depth + 1]
            x = factory()(x, train)
            idx += 1
            if idx in stage_ends:
                features.append(x)
        for i in range(3):
            if len(features) > self.depth:
                break
            x = _InceptionC(dtype=self.dtype, name=f"inception_c{i}")(x, train)
            if i == 2:
                features.append(x)
        return features[: self.depth + 1]


# ---------------------------------------------------------------------------
# InceptionResNetV2 (pretrainedmodels inceptionresnetv2.py)
# ---------------------------------------------------------------------------

class _ResBlock(nn.Module):
    """Block35/Block17/Block8: branches -> concat -> 1x1 (bias, no BN)
    scaled residual -> optional relu."""

    branches: Tuple
    c_out: int
    scale: float
    final_relu: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for bi, branch in enumerate(self.branches):
            y = x
            for ci, (c, k, s, p) in enumerate(branch):
                y = ConvBnAct(c, kernel=k, stride=s, padding=p,
                              dtype=self.dtype, name=f"b{bi}_{ci}")(y, train)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        w = self.param("conv2d", kaiming_normal,
                       (1, 1, y.shape[-1], self.c_out), jnp.float32)
        b = self.param("conv2d_b", nn.initializers.zeros, (self.c_out,),
                       jnp.float32)
        y = _conv(y, w.astype(y.dtype), padding=(0, 0)) + b.astype(y.dtype)
        out = x + self.scale * y
        return relu(out) if self.final_relu else out


class InceptionResNetV2Encoder(nn.Module):
    """InceptionResNetV2 pyramid (smp inceptionresnetv2.py get_stages):
    out_channels (3, 64, 192, 320, 1088, 1536)."""

    depth: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        C = ConvBnAct
        M = _InceptionMixed
        features = [x]
        if self.depth == 0:
            return features
        x = C(32, 3, stride=2, dtype=self.dtype, name="conv2d_1a")(x, train)
        x = C(32, 3, dtype=self.dtype, name="conv2d_2a")(x, train)
        x = C(64, 3, dtype=self.dtype, name="conv2d_2b")(x, train)
        features.append(x)
        if self.depth >= 2:
            x = _max_pool(x, 3, 2, 1)
            x = C(80, 1, dtype=self.dtype, name="conv2d_3b")(x, train)
            x = C(192, 3, dtype=self.dtype, name="conv2d_4a")(x, train)
            features.append(x)
        if self.depth >= 3:
            x = _max_pool(x, 3, 2, 1)
            x = M((
                [(96, 1, 1, None)],
                [(48, 1, 1, None), (64, 5, 1, (2, 2))],
                [(64, 1, 1, None), (96, 3, 1, (1, 1)), (96, 3, 1, (1, 1))],
                "avgpool+64"), dtype=self.dtype, name="mixed_5b")(x, train)
            for i in range(10):
                x = _ResBlock((
                    [(32, 1, 1, None)],
                    [(32, 1, 1, None), (32, 3, 1, (1, 1))],
                    [(32, 1, 1, None), (48, 3, 1, (1, 1)), (64, 3, 1, (1, 1))]),
                    c_out=320, scale=0.17, dtype=self.dtype,
                    name=f"block35_{i}")(x, train)
            features.append(x)
        if self.depth >= 4:
            x = M((
                [(384, 3, 2, (1, 1))],
                [(256, 1, 1, None), (256, 3, 1, (1, 1)), (384, 3, 2, (1, 1))],
                "maxpool"), dtype=self.dtype, name="mixed_6a")(x, train)
            for i in range(20):
                x = _ResBlock((
                    [(192, 1, 1, None)],
                    [(128, 1, 1, None), (160, (1, 7), 1, (0, 3)),
                     (192, (7, 1), 1, (3, 0))]),
                    c_out=1088, scale=0.10, dtype=self.dtype,
                    name=f"block17_{i}")(x, train)
            features.append(x)
        if self.depth >= 5:
            x = M((
                [(256, 1, 1, None), (384, 3, 2, (1, 1))],
                [(256, 1, 1, None), (288, 3, 2, (1, 1))],
                [(256, 1, 1, None), (288, 3, 1, (1, 1)), (320, 3, 2, (1, 1))],
                "maxpool"), dtype=self.dtype, name="mixed_7a")(x, train)
            for i in range(9):
                x = _ResBlock((
                    [(192, 1, 1, None)],
                    [(192, 1, 1, None), (224, (1, 3), 1, (0, 1)),
                     (256, (3, 1), 1, (1, 0))]),
                    c_out=2080, scale=0.20, dtype=self.dtype,
                    name=f"block8_{i}")(x, train)
            x = _ResBlock((
                [(192, 1, 1, None)],
                [(192, 1, 1, None), (224, (1, 3), 1, (0, 1)),
                 (256, (3, 1), 1, (1, 0))]),
                c_out=2080, scale=1.0, final_relu=False, dtype=self.dtype,
                name="block8_final")(x, train)
            x = C(1536, 1, dtype=self.dtype, name="conv2d_7b")(x, train)
            features.append(x)
        return features[: self.depth + 1]


# ---------------------------------------------------------------------------
# DPN (pretrainedmodels dpn.py semantics)
# ---------------------------------------------------------------------------

class _BnActConv(nn.Module):
    """pre-activation conv: BN -> ReLU -> conv (no bias)."""

    c_out: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = build_norm(self.dtype, name="bn")(x, use_running_average=not train)
        x = relu(x)
        w = self.param("kernel", kaiming_normal,
                       (self.kernel, self.kernel,
                        x.shape[-1] // self.groups, self.c_out), jnp.float32)
        return _conv(x, w.astype(x.dtype),
                     stride=1 if self.dilation > 1 else self.stride,
                     groups=self.groups, dilation=self.dilation)


class _DualPathBlock(nn.Module):
    """(residual, dense) tuple in, tuple out (pretrainedmodels
    DualPathBlock). block_type: 'proj' (stride 1, projected skip),
    'down' (stride 2, projected skip) or 'normal'."""

    num_1x1_a: int
    num_3x3_b: int
    num_1x1_c: int
    inc: int
    groups: int
    block_type: str = "normal"
    b: bool = False
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_in = jnp.concatenate(x, axis=-1) if isinstance(x, (list, tuple)) else x
        stride = 2 if self.block_type == "down" else 1
        d = self.dilation
        has_proj = self.block_type in ("proj", "down")
        if has_proj:
            s = _BnActConv(self.num_1x1_c + 2 * self.inc, 1, stride,
                           dilation=d, dtype=self.dtype,
                           name="c1x1_w")(x_in, train)
            x_s1, x_s2 = s[..., : self.num_1x1_c], s[..., self.num_1x1_c:]
        else:
            x_s1, x_s2 = x
        y = _BnActConv(self.num_1x1_a, 1, 1, dilation=d, dtype=self.dtype,
                       name="c1x1_a")(x_in, train)
        y = _BnActConv(self.num_3x3_b, 3, stride, groups=self.groups,
                       dilation=d, dtype=self.dtype, name="c3x3_b")(y, train)
        if self.b:
            y = build_norm(self.dtype, name="cat_bn")(
                y, use_running_average=not train)
            y = relu(y)
            w1 = self.param("c1x1_c1", kaiming_normal,
                            (1, 1, y.shape[-1], self.num_1x1_c), jnp.float32)
            w2 = self.param("c1x1_c2", kaiming_normal,
                            (1, 1, y.shape[-1], self.inc), jnp.float32)
            out1 = _conv(y, w1.astype(y.dtype))
            out2 = _conv(y, w2.astype(y.dtype))
        else:
            y = _BnActConv(self.num_1x1_c + self.inc, 1, 1, dtype=self.dtype,
                           name="c1x1_c")(y, train)
            out1, out2 = y[..., : self.num_1x1_c], y[..., self.num_1x1_c:]
        return (x_s1 + out1, jnp.concatenate([x_s2, out2], axis=-1))


class DPNEncoder(nn.Module):
    """Dual-path network pyramid (smp dpn.py get_stages): stage1 = stem
    conv+bn+relu, stage2 = maxpool + first block group, stages 3-5 = the
    remaining groups; tuple features surface as relu(concat) exactly as the
    smp wrapper does (dpn.py forward)."""

    k_sec: Sequence[int]
    inc_sec: Sequence[int]
    k_r: int
    groups: int
    num_init_features: int
    small: bool = False
    b: bool = False
    bw_factor_small: bool = True
    depth: int = 5
    output_stride: int = 32          # make_dilated surface (32 | 16 | 8)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        def surface(t):
            return relu(jnp.concatenate(t, axis=-1)) if isinstance(
                t, (list, tuple)) else t

        features = [x]
        if self.depth == 0:
            return features
        k = 3 if self.small else 7
        w = self.param("stem_conv", kaiming_normal,
                       (k, k, x.shape[-1], self.num_init_features), jnp.float32)
        x = _conv(x, w.astype(x.dtype), stride=2)
        x = build_norm(self.dtype, name="stem_bn")(x, use_running_average=not train)
        x = relu(x)
        features.append(x)

        bw_factor = 1 if self.small else 4
        t = x
        for gi in range(len(self.k_sec)):
            if len(features) > self.depth:
                break
            bw = 64 * (2 ** gi) * bw_factor
            inc = self.inc_sec[gi]
            r = (self.k_r * bw) // (64 * bw_factor)
            if gi == 0:
                t = _max_pool(t if not isinstance(t, tuple) else t[0], 3, 2, 1)
                block_type = "proj"
            else:
                block_type = "down"
            rate = stage_dilation(gi + 2, self.output_stride)
            for bi in range(self.k_sec[gi]):
                t = _DualPathBlock(
                    r, r, bw, inc, self.groups,
                    block_type=block_type if bi == 0 else "normal",
                    b=self.b, dilation=rate, dtype=self.dtype,
                    name=f"group{gi}_block{bi}")(t, train)
            if gi == len(self.k_sec) - 1:
                # final CatBnAct: BN + ReLU over the concatenated paths
                cat = jnp.concatenate(t, axis=-1)
                cat = build_norm(self.dtype, name="final_bn")(
                    cat, use_running_average=not train)
                features.append(relu(cat))
            else:
                features.append(surface(t))
        return features[: self.depth + 1]


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

FAMILY_ENCODERS = {
    "senet154": dict(cls=SENetEncoder, kw=dict(
        layers=(3, 8, 36, 3), style="senet", groups=64, input_3x3=True,
        downsample_kernel=3)),
    "se_resnet50": dict(cls=SENetEncoder, kw=dict(
        layers=(3, 4, 6, 3), style="resnet")),
    "se_resnet101": dict(cls=SENetEncoder, kw=dict(
        layers=(3, 4, 23, 3), style="resnet")),
    "se_resnet152": dict(cls=SENetEncoder, kw=dict(
        layers=(3, 8, 36, 3), style="resnet")),
    "se_resnext50_32x4d": dict(cls=SENetEncoder, kw=dict(
        layers=(3, 4, 6, 3), style="resnext", groups=32)),
    "se_resnext101_32x4d": dict(cls=SENetEncoder, kw=dict(
        layers=(3, 4, 23, 3), style="resnext", groups=32)),
    "xception": dict(cls=XceptionEncoder, kw=dict()),
    "inceptionv4": dict(cls=InceptionV4Encoder, kw=dict()),
    "inceptionresnetv2": dict(cls=InceptionResNetV2Encoder, kw=dict()),
    "dpn68": dict(cls=DPNEncoder, kw=dict(
        k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64), k_r=128, groups=32,
        num_init_features=10, small=True)),
    "dpn68b": dict(cls=DPNEncoder, kw=dict(
        k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64), k_r=128, groups=32,
        num_init_features=10, small=True, b=True)),
    "dpn92": dict(cls=DPNEncoder, kw=dict(
        k_sec=(3, 4, 20, 3), inc_sec=(16, 32, 24, 128), k_r=96, groups=32,
        num_init_features=64)),
    "dpn98": dict(cls=DPNEncoder, kw=dict(
        k_sec=(3, 6, 20, 3), inc_sec=(16, 32, 32, 128), k_r=160, groups=40,
        num_init_features=96)),
    "dpn107": dict(cls=DPNEncoder, kw=dict(
        k_sec=(4, 8, 20, 3), inc_sec=(20, 64, 64, 128), k_r=200, groups=50,
        num_init_features=128)),
    "dpn131": dict(cls=DPNEncoder, kw=dict(
        k_sec=(4, 8, 28, 3), inc_sec=(16, 32, 32, 128), k_r=160, groups=40,
        num_init_features=128)),
}
