"""Baseline segmentation-model zoo (NHWC Flax): Unet, Unet++, MAnet, Linknet,
FPN, PSPNet, DeepLabV3+, PAN — the reference's vendored smp family
(segmentation_models_pytorch/*/decoder.py) re-designed as Flax modules over
the shared resnet encoder (models/encoders.py).

All models return a LIST of [B,H,W,classes] logits (singleton), the
framework-wide convention (the reference's baselines return a raw tensor
that its loss then mis-indexes with [-1]; the list convention keeps the
deep-supervision API uniform and fixes that wart).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.models.base import (Attention, Conv2dReLU, SegmentationHead,
                                   model_output, upsample_bilinear,
                                   upsample_nearest2x)
from senas_tpu.models.encoders import get_encoder
from senas_tpu.ops.primitives import (build_norm, conv2d, conv_transpose2d,
                                      kaiming_normal, kaiming_normal_transpose,
                                      max_pool_2x2, relu, torch_conv_bias)

Dtype = Any


def _resize_bilinear(x, size_hw, align_corners=True):
    b, h, w, c = x.shape
    if align_corners and (h > 1 or w > 1):
        # torch align_corners=True semantics
        import jax.numpy as jnp
        th, tw = size_hw
        ys = jnp.linspace(0.0, h - 1.0, th)
        xs = jnp.linspace(0.0, w - 1.0, tw)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = (ys - y0)[None, :, None, None]
        wx = (xs - x0)[None, None, :, None]
        g = x
        top = g[:, y0][:, :, x0] * (1 - wx) + g[:, y0][:, :, x1] * wx
        bot = g[:, y1][:, :, x0] * (1 - wx) + g[:, y1][:, :, x1] * wx
        return top * (1 - wy) + bot * wy
    return jax.image.resize(x, (b, size_hw[0], size_hw[1], c), method="bilinear")


# ---------------------------------------------------------------------------
# U-Net (unet/decoder.py:8-121)
# ---------------------------------------------------------------------------

class UnetDecoderBlock(nn.Module):
    c_out: int
    attention_type: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = upsample_nearest2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
            x = Attention(self.attention_type, dtype=self.dtype)(x)
        x = Conv2dReLU(self.c_out, dtype=self.dtype)(x, train)
        x = Conv2dReLU(self.c_out, dtype=self.dtype)(x, train)
        return Attention(self.attention_type, dtype=self.dtype)(x)


class Unet(nn.Module):
    classes: int
    in_channels: int = 3
    encoder_name: str = "resnet10"
    encoder_depth: int = 5
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_attention_type: Optional[str] = None
    activation: Optional[Any] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_feats = get_encoder(self.encoder_name, self.encoder_depth,
                                self.dtype)(x, train)
        feats = enc_feats[1:][::-1]
        head, skips = feats[0], feats[1:]
        y = head
        for i, c_out in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            y = UnetDecoderBlock(c_out, self.decoder_attention_type,
                                 dtype=self.dtype, name=f"dec_{i}")(y, skip, train)
        masks = SegmentationHead(self.classes, activation=self.activation,
                                 dtype=self.dtype)(y)
        return model_output(self, masks, enc_feats, train)


# ---------------------------------------------------------------------------
# U-Net++ (unetplusplus/decoder.py:65-136)
# ---------------------------------------------------------------------------

class UnetPlusPlus(nn.Module):
    classes: int
    in_channels: int = 3
    encoder_name: str = "resnet10"
    encoder_depth: int = 5
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_attention_type: Optional[str] = None
    activation: Optional[Any] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_feats = get_encoder(self.encoder_name, self.encoder_depth,
                                self.dtype)(x, train)
        feats = enc_feats[1:][::-1]
        enc_ch = [f.shape[-1] for f in feats]
        in_channels = [enc_ch[0]] + list(self.decoder_channels[:-1])
        skip_channels = enc_ch[1:] + [0]
        out_channels = list(self.decoder_channels)
        depth = len(in_channels) - 1

        def block(tag, c_out):
            return UnetDecoderBlock(c_out, self.decoder_attention_type,
                                    dtype=self.dtype, name=f"x_{tag}")

        # out-channel plan per block x_{di}_{li}: out_channels[li] when di==0
        # else skip_channels[li] (unetplusplus/decoder.py:104-111, keyed by
        # the CONSTRUCTOR layer index li = di + sweep-layer)
        dense = {}
        for layer_idx in range(len(in_channels) - 1):
            for depth_idx in range(depth - layer_idx):
                if layer_idx == 0:
                    out = block(f"{depth_idx}_{depth_idx}", out_channels[0]
                                if depth_idx == 0 else skip_channels[depth_idx])(
                        feats[depth_idx], feats[depth_idx + 1], train)
                    dense[f"x_{depth_idx}_{depth_idx}"] = out
                else:
                    dense_l_i = depth_idx + layer_idx
                    cat = [dense[f"x_{idx}_{dense_l_i}"]
                           for idx in range(depth_idx + 1, dense_l_i + 1)]
                    cat = jnp.concatenate(cat + [feats[dense_l_i + 1]], axis=-1)
                    out_ch = (out_channels[dense_l_i] if depth_idx == 0
                              else skip_channels[dense_l_i])
                    dense[f"x_{depth_idx}_{dense_l_i}"] = block(
                        f"{depth_idx}_{dense_l_i}", out_ch)(
                        dense[f"x_{depth_idx}_{dense_l_i - 1}"], cat, train)
        y = block(f"0_{depth}", out_channels[-1])(dense[f"x_0_{depth - 1}"],
                                                  None, train)
        masks = SegmentationHead(self.classes, activation=self.activation,
                                 dtype=self.dtype)(y)
        return model_output(self, masks, enc_feats, train)


# ---------------------------------------------------------------------------
# MAnet (manet/decoder.py)
# ---------------------------------------------------------------------------

class PAB(nn.Module):
    """Position-attention block (manet/decoder.py:7-37)."""

    pab_channels: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape

        def conv(name, cout, k):
            kern = self.param(name, kaiming_normal, (k, k, c, cout), jnp.float32)
            bias = self.param(name + "_b", nn.initializers.zeros, (cout,), jnp.float32)
            return kern.astype(x.dtype), bias.astype(x.dtype)

        wt, bt = conv("top", self.pab_channels, 1)
        wc, bc = conv("center", self.pab_channels, 1)
        wb, bb = conv("bottom", c, 3)
        x_top = conv2d(x, wt) + bt           # [B,H,W,pc]
        x_center = conv2d(x, wc) + bc
        x_bottom = conv2d(x, wb) + bb        # [B,H,W,C]

        hw = h * w
        top = x_top.reshape(b, hw, self.pab_channels)
        center = x_center.reshape(b, hw, self.pab_channels)
        bottom = x_bottom.reshape(b, hw, c)
        sp = jnp.einsum("bqc,bkc->bqk", center, top)  # [B,HW,HW]
        sp = jax.nn.softmax(sp.reshape(b, -1), axis=-1).reshape(b, hw, hw)
        attn = jnp.einsum("bqk,bkc->bqc", sp, bottom)  # [B,HW,C]
        # reference quirk (manet/decoder.py:34): the [B,HW,C] attention map
        # is reshaped DIRECTLY to (B,C,H,W) without a transpose — a
        # scrambling reinterpretation of the buffer. Reproduced here
        # bug-compatibly: row-major reinterpret then convert to NHWC.
        attn = attn.reshape(b, c, h, w).transpose(0, 2, 3, 1)
        y = x + attn
        wo = self.param("out", kaiming_normal, (3, 3, c, c), jnp.float32)
        bo = self.param("out_bias", nn.initializers.zeros, (c,), jnp.float32)
        return conv2d(y, wo.astype(x.dtype)) + bo.astype(x.dtype)


class MFAB(nn.Module):
    """Multi-scale fusion attention block (manet/decoder.py:40-101)."""

    skip_channels: int
    c_out: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        sc = self.skip_channels
        x = Conv2dReLU(x.shape[-1], dtype=self.dtype)(x, train)
        x = Conv2dReLU(sc, kernel_size=1, dtype=self.dtype)(x, train)
        x = upsample_nearest2x(x)

        def se(t, name):
            red = max(1, sc // self.reduction)
            y = jnp.mean(t, axis=(1, 2))
            w1 = self.param(f"{name}_w1", kaiming_normal, (1, 1, sc, red), jnp.float32)
            b1 = self.param(f"{name}_b1", nn.initializers.zeros, (red,), jnp.float32)
            w2 = self.param(f"{name}_w2", kaiming_normal, (1, 1, red, sc), jnp.float32)
            b2 = self.param(f"{name}_b2", nn.initializers.zeros, (sc,), jnp.float32)
            y = relu(jnp.einsum("bc,xycr->br", y, w1.astype(t.dtype)) + b1.astype(t.dtype))
            y = nn.sigmoid(jnp.einsum("br,xyrc->bc", y, w2.astype(t.dtype)) + b2.astype(t.dtype))
            return y[:, None, None, :]

        attention_hl = se(x, "hl")
        attention_ll = se(skip, "ll")
        x = x * (attention_hl + attention_ll)
        x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dReLU(self.c_out, dtype=self.dtype)(x, train)
        return Conv2dReLU(self.c_out, dtype=self.dtype)(x, train)


class MAnet(nn.Module):
    classes: int
    in_channels: int = 3
    encoder_name: str = "resnet10"
    encoder_depth: int = 5
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    pab_channels: int = 64
    activation: Optional[Any] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_feats = get_encoder(self.encoder_name, self.encoder_depth,
                                self.dtype)(x, train)
        feats = enc_feats[1:][::-1]
        head, skips = feats[0], feats[1:]
        y = PAB(self.pab_channels, dtype=self.dtype)(head)
        for i, c_out in enumerate(self.decoder_channels):
            if i < len(skips):
                y = MFAB(skips[i].shape[-1], c_out, dtype=self.dtype,
                         name=f"dec_{i}")(y, skips[i], train)
            else:
                y = UnetDecoderBlock(c_out, dtype=self.dtype,
                                     name=f"dec_{i}")(y, None, train)
        masks = SegmentationHead(self.classes, activation=self.activation,
                                 dtype=self.dtype)(y)
        return model_output(self, masks, enc_feats, train)


# ---------------------------------------------------------------------------
# Linknet (linknet/decoder.py)
# ---------------------------------------------------------------------------

class LinknetBlock(nn.Module):
    c_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        c_in = x.shape[-1]
        mid = c_in // 4
        x = Conv2dReLU(mid, kernel_size=1, dtype=self.dtype)(x, train)
        # TransposeX2: 4x4 transpose conv stride 2 (+BN) + ReLU
        w = self.param("tkernel", kaiming_normal_transpose,
                       (4, 4, mid, mid), jnp.float32)
        b = self.param("tbias", torch_conv_bias(mid * 16), (mid,), jnp.float32)
        x = conv_transpose2d(x, w.astype(x.dtype), stride=2, output_padding=0,
                             torch_padding=1) + b.astype(x.dtype)
        x = build_norm(self.dtype)(x, use_running_average=not train)
        x = relu(x)
        x = Conv2dReLU(self.c_out, kernel_size=1, dtype=self.dtype)(x, train)
        if skip is not None:
            x = x + skip
        return x


class Linknet(nn.Module):
    classes: int
    in_channels: int = 3
    encoder_name: str = "resnet10"
    encoder_depth: int = 5
    prefinal_channels: int = 32
    activation: Optional[Any] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc_feats = get_encoder(self.encoder_name, self.encoder_depth,
                                self.dtype)(x, train)
        feats = enc_feats[1:][::-1]
        enc_ch = [f.shape[-1] for f in feats]
        channels = enc_ch + [self.prefinal_channels]
        y = feats[0]
        skips = feats[1:]
        for i in range(self.encoder_depth):
            skip = skips[i] if i < len(skips) else None
            y = LinknetBlock(channels[i + 1], dtype=self.dtype,
                             name=f"dec_{i}")(y, skip, train)
        masks = SegmentationHead(self.classes, activation=self.activation,
                                 dtype=self.dtype)(y)
        return model_output(self, masks, enc_feats, train)


# ---------------------------------------------------------------------------
# FPN (fpn/decoder.py)
# ---------------------------------------------------------------------------

class Conv3x3GNReLU(nn.Module):
    c_out: int
    upsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", kaiming_normal, (3, 3, x.shape[-1], self.c_out),
                       jnp.float32)
        x = conv2d(x, w.astype(x.dtype))
        # epsilon: torch GroupNorm uses 1e-5 (flax default is 1e-6)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(x)
        x = relu(x)
        if self.upsample:
            x = _resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                                 align_corners=True)
        return x


class FPN(nn.Module):
    classes: int
    in_channels: int = 3
    encoder_name: str = "resnet10"
    encoder_depth: int = 5
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    merge_policy: str = "add"
    upsampling: int = 4
    activation: Optional[Any] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = get_encoder(self.encoder_name, self.encoder_depth,
                            self.dtype)(x, train)
        c2, c3, c4, c5 = feats[-4:]

        def p_conv(name, t):
            w = self.param(name, kaiming_normal, (1, 1, t.shape[-1],
                                                  self.pyramid_channels), jnp.float32)
            b = self.param(name + "_b", nn.initializers.zeros,
                           (self.pyramid_channels,), jnp.float32)
            return conv2d(t, w.astype(t.dtype)) + b.astype(t.dtype)

        p5 = p_conv("p5", c5)
        p4 = upsample_nearest2x(p5) + p_conv("p4_skip", c4)
        p3 = upsample_nearest2x(p4) + p_conv("p3_skip", c3)
        p2 = upsample_nearest2x(p3) + p_conv("p2_skip", c2)

        outs = []
        for i, (p, ups) in enumerate(zip([p5, p4, p3, p2], [3, 2, 1, 0])):
            y = Conv3x3GNReLU(self.segmentation_channels, upsample=bool(ups),
                              dtype=self.dtype, name=f"seg_{i}_0")(p)
            for j in range(1, ups):
                y = Conv3x3GNReLU(self.segmentation_channels, upsample=True,
                                  dtype=self.dtype, name=f"seg_{i}_{j}")(y)
            outs.append(y)
        y = sum(outs) if self.merge_policy == "add" else jnp.concatenate(outs, -1)
        masks = SegmentationHead(self.classes, upsampling=self.upsampling,
                                 activation=self.activation,
                                 dtype=self.dtype)(y)
        return model_output(self, masks, feats, train)


# ---------------------------------------------------------------------------
# PSPNet (pspnet/decoder.py)
# ---------------------------------------------------------------------------

class PSPNet(nn.Module):
    classes: int
    in_channels: int = 3
    encoder_name: str = "resnet10"
    encoder_depth: int = 5
    psp_out_channels: int = 512
    upsampling: int = 8
    activation: Optional[Any] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = get_encoder(self.encoder_name, self.encoder_depth,
                            self.dtype)(x, train)
        y = feats[-1]
        b, h, w, c = y.shape
        sizes = (1, 2, 3, 6)
        branches = []
        for si, size in enumerate(sizes):
            # adaptive avg pool to (size, size): mean over equal regions
            if h % size == 0 and w % size == 0:
                pooled = jnp.mean(y.reshape(b, size, h // size, size, w // size, c),
                                  axis=(2, 4))
            else:
                pooled = jax.image.resize(y, (b, size, size, c), method="linear")
            pooled = Conv2dReLU(c // len(sizes), kernel_size=1,
                                use_batchnorm=size != 1, dtype=self.dtype,
                                name=f"psp_{si}")(pooled, train)
            branches.append(_resize_bilinear(pooled, (h, w), align_corners=True))
        y = jnp.concatenate(branches + [y], axis=-1)
        y = Conv2dReLU(self.psp_out_channels, kernel_size=1,
                       dtype=self.dtype)(y, train)
        masks = SegmentationHead(self.classes, upsampling=self.upsampling,
                                 activation=self.activation,
                                 dtype=self.dtype)(y)
        return model_output(self, masks, feats, train)


# ---------------------------------------------------------------------------
# DeepLabV3+ (deeplabv3/decoder.py:54-195)
# ---------------------------------------------------------------------------

class _SeparableConvBnReLU(nn.Module):
    c_out: int
    kernel_size: int = 3
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        dw = self.param("dw", kaiming_normal,
                        (self.kernel_size, self.kernel_size, 1, c), jnp.float32)
        x = conv2d(x, dw.astype(x.dtype), dilation=self.dilation, groups=c)
        pw = self.param("pw", kaiming_normal, (1, 1, c, self.c_out), jnp.float32)
        x = conv2d(x, pw.astype(x.dtype))
        x = build_norm(self.dtype)(x, use_running_average=not train)
        return relu(x)


class ASPP(nn.Module):
    c_out: int
    atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    separable: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        res = [Conv2dReLU(self.c_out, kernel_size=1, dtype=self.dtype,
                          name="conv1x1")(x, train)]
        for i, rate in enumerate(self.atrous_rates):
            if self.separable:
                res.append(_SeparableConvBnReLU(self.c_out, 3, rate,
                                                dtype=self.dtype,
                                                name=f"aspp_{i}")(x, train))
            else:
                w_ = self.param(f"aspp_{i}_k", kaiming_normal,
                                (3, 3, c, self.c_out), jnp.float32)
                y = conv2d(x, w_.astype(x.dtype), dilation=rate)
                y = build_norm(self.dtype, name=f"aspp_{i}_bn")(
                    y, use_running_average=not train)
                res.append(relu(y))
        # image pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = Conv2dReLU(self.c_out, kernel_size=1, dtype=self.dtype,
                            name="pool_conv")(pooled, train)
        pooled = jnp.broadcast_to(pooled, (b, h, w, self.c_out))
        res.append(pooled)
        y = jnp.concatenate(res, axis=-1)
        y = Conv2dReLU(self.c_out, kernel_size=1, dtype=self.dtype,
                       name="project")(y, train)
        # reference applies Dropout(0.5) here; train-mode only
        if train:
            y = nn.Dropout(0.5)(y, deterministic=not train)
        return y


class DeepLabV3Plus(nn.Module):
    classes: int
    in_channels: int = 3
    encoder_name: str = "resnet10"
    encoder_depth: int = 5
    decoder_channels: int = 256
    atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    output_stride: int = 16
    upsampling: int = 4
    activation: Optional[Any] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # smp DeepLabV3Plus: any dilatable encoder, output stride 8 or 16
        # (deeplabv3/model.py:128-141 + encoder.make_dilated)
        if self.output_stride not in (8, 16):
            raise ValueError("Encoder output stride should be 8 or 16, "
                             "got {}".format(self.output_stride))
        enc = get_encoder(self.encoder_name, self.encoder_depth,
                          dtype=self.dtype, output_stride=self.output_stride)
        feats = enc(x, train)
        y = ASPP(self.decoder_channels, self.atrous_rates, separable=True,
                 dtype=self.dtype)(feats[-1], train)
        y = _SeparableConvBnReLU(self.decoder_channels, dtype=self.dtype,
                                 name="aspp_post")(y, train)
        scale = 2 if self.output_stride == 8 else 4
        y = _resize_bilinear(y, (y.shape[1] * scale, y.shape[2] * scale),
                             align_corners=True)
        high = feats[-4]
        high = Conv2dReLU(48, kernel_size=1, dtype=self.dtype,
                          name="highres")(high, train)
        y = jnp.concatenate([y, high], axis=-1)
        y = _SeparableConvBnReLU(self.decoder_channels, dtype=self.dtype,
                                 name="fuse")(y, train)
        masks = SegmentationHead(self.classes, upsampling=self.upsampling,
                                 activation=self.activation,
                                 dtype=self.dtype)(y)
        return model_output(self, masks, feats, train)


# ---------------------------------------------------------------------------
# PAN (pan/decoder.py)
# ---------------------------------------------------------------------------

class ConvBnReLU(nn.Module):
    c_out: int
    kernel_size: int = 1
    add_relu: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        w = self.param("kernel", kaiming_normal, (k, k, x.shape[-1], self.c_out),
                       jnp.float32)
        b = self.param("bias", torch_conv_bias(x.shape[-1] * k * k),
                       (self.c_out,), jnp.float32)
        x = conv2d(x, w.astype(x.dtype)) + b.astype(x.dtype)
        x = build_norm(self.dtype)(x, use_running_average=not train)
        if self.add_relu:
            x = relu(x)
        return x


class FPABlock(nn.Module):
    c_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # global pooling branch
        b1 = jnp.mean(x, axis=(1, 2), keepdims=True)
        b1 = ConvBnReLU(self.c_out, 1, dtype=self.dtype, name="branch1")(b1, train)
        b1 = jnp.broadcast_to(b1, (b, h, w, self.c_out))
        # mid branch
        mid = ConvBnReLU(self.c_out, 1, dtype=self.dtype, name="mid")(x, train)
        # pyramid branch
        x1 = max_pool_2x2(x)
        x1 = ConvBnReLU(1, 7, dtype=self.dtype, name="down1")(x1, train)
        x2 = max_pool_2x2(x1)
        x2 = ConvBnReLU(1, 5, dtype=self.dtype, name="down2")(x2, train)
        x3 = max_pool_2x2(x2)
        x3 = ConvBnReLU(1, 3, dtype=self.dtype, name="down3a")(x3, train)
        x3 = ConvBnReLU(1, 3, dtype=self.dtype, name="down3b")(x3, train)
        x3 = _resize_bilinear(x3, (h // 4, w // 4), align_corners=True)
        x2 = ConvBnReLU(1, 5, dtype=self.dtype, name="conv2")(x2, train)
        y = x2 + x3
        y = _resize_bilinear(y, (h // 2, w // 2), align_corners=True)
        x1 = ConvBnReLU(1, 7, dtype=self.dtype, name="conv1")(x1, train)
        y = y + x1
        y = _resize_bilinear(y, (h, w), align_corners=True)
        return y * mid + b1


class GAUBlock(nn.Module):
    c_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        y_up = _resize_bilinear(y, (h, w), align_corners=True)
        x = ConvBnReLU(self.c_out, 3, dtype=self.dtype, name="conv2")(x, train)
        ya = jnp.mean(y, axis=(1, 2), keepdims=True)
        ya = ConvBnReLU(self.c_out, 1, add_relu=False, dtype=self.dtype,
                        name="conv1")(ya, train)
        ya = nn.sigmoid(ya)
        return y_up + x * ya


class PAN(nn.Module):
    classes: int
    in_channels: int = 3
    encoder_name: str = "resnet10"
    encoder_depth: int = 5
    # PAN dilates the last encoder stage by default (pan/model.py:49,
    # encoder_output_stride=16), so feats[-1] sits at stride 16, not 32.
    encoder_output_stride: int = 16
    decoder_channels: int = 32
    upsampling: int = 4
    activation: Optional[Any] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.encoder_output_stride not in (16, 32):
            raise ValueError("PAN support output stride 16 or 32, got "
                             "{}".format(self.encoder_output_stride))
        feats = get_encoder(self.encoder_name, self.encoder_depth,
                            self.dtype,
                            output_stride=self.encoder_output_stride)(x, train)
        y = FPABlock(self.decoder_channels, dtype=self.dtype)(feats[-1], train)
        y = GAUBlock(self.decoder_channels, dtype=self.dtype,
                     name="gau3")(feats[-2], y, train)
        y = GAUBlock(self.decoder_channels, dtype=self.dtype,
                     name="gau2")(feats[-3], y, train)
        y = GAUBlock(self.decoder_channels, dtype=self.dtype,
                     name="gau1")(feats[-4], y, train)
        masks = SegmentationHead(self.classes, upsampling=self.upsampling,
                                 activation=self.activation,
                                 dtype=self.dtype)(y)
        return model_output(self, masks, feats, train)
