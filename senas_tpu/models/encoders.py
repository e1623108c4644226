"""ResNet encoder family for the baseline zoo (NHWC Flax).

Mirrors the reference's modified smp encoder stack: the custom `resnet10`
(BasicBlock, layers=[1,1,1,1], out_channels (3,64,64,128,256,512) —
encoders/resnet.py:131-138) used by EVERY baseline config
(models/__init__.py:13), plus resnet18/34. Stage layout matches
ResNetEncoder.get_stages (encoders/resnet.py:47-56): [identity,
conv7x7+bn+relu, maxpool+layer1, layer2, layer3, layer4]; forward returns
depth+1 feature maps at strides 1,2,4,...
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.ops.primitives import (BasicBlock, build_norm, conv2d,
                                      kaiming_normal, max_pool_3x3, relu)


def stage_dilation(stage: int, output_stride: int) -> int:
    """Dilation rate smp's ``EncoderMixin.make_dilated`` assigns to the
    1-based pyramid `stage` (reference encoders/_base.py:35-53): output
    stride 16 dilates stage 5 with rate 2; output stride 8 dilates stages
    4 and 5 with rates 2 and 4. Returns 1 for untouched stages. The
    patched semantics (`replace_strides_with_dilation`, _utils.py:48-60)
    are: every conv in the stage gets stride 1, the stage's dilation rate,
    and torch-style padding (k//2)*rate; pooling layers are untouched.
    """
    if output_stride == 32:
        return 1
    if output_stride == 16:
        return 2 if stage == 5 else 1
    if output_stride == 8:
        return {4: 2, 5: 4}.get(stage, 1)
    raise ValueError(
        "Output stride should be 16 or 8, got {}.".format(output_stride))


class Bottleneck(nn.Module):
    """torchvision-style Bottleneck (1x1 -> 3x3(groups) -> 1x1, expansion 4).

    Used by the smp resnet50/101/152 and resnext* encoder entries
    (reference segmentation_models_pytorch/encoders/resnet.py:158-280).
    Like BasicBlock, returns the pre-activation sum; the encoder applies
    the trailing ReLU.
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    width_per_group: int = 64
    use_downsample: bool = False
    dtype: Optional[Any] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        residual = x
        width = int(self.planes * (self.width_per_group / 64.0)) * self.groups
        w1 = self.param("conv1", kaiming_normal,
                        (1, 1, x.shape[-1], width), jnp.float32)
        out = conv2d(x, w1.astype(x.dtype))
        out = build_norm(self.dtype, name="bn1")(out, use_running_average=not train)
        out = relu(out)
        w2 = self.param("conv2", kaiming_normal,
                        (3, 3, width // self.groups, width), jnp.float32)
        out = conv2d(out, w2.astype(out.dtype), stride=self.stride,
                     dilation=self.dilation, groups=self.groups)
        out = build_norm(self.dtype, name="bn2")(out, use_running_average=not train)
        out = relu(out)
        planes_out = self.planes * self.expansion
        w3 = self.param("conv3", kaiming_normal,
                        (1, 1, width, planes_out), jnp.float32)
        out = conv2d(out, w3.astype(out.dtype))
        out = build_norm(self.dtype, name="bn3")(out, use_running_average=not train)
        if self.use_downsample:
            wd = self.param("down_conv", kaiming_normal,
                            (1, 1, x.shape[-1], planes_out), jnp.float32)
            residual = conv2d(x, wd.astype(x.dtype), stride=self.stride)
            residual = build_norm(self.dtype, name="down_bn")(
                residual, use_running_average=not train)
        return out + residual


class ResNetEncoder(nn.Module):
    layers: Sequence[int]          # blocks per stage, e.g. (1,1,1,1)
    depth: int = 5                 # number of downsampling stages used
    base_width: int = 64
    block: str = "basic"           # "basic" | "bottleneck"
    groups: int = 1                # ResNeXt cardinality (bottleneck only)
    width_per_group: int = 64      # ResNeXt width (bottleneck only)
    # dilate_last replaces the final stage's stride with dilation 2
    # (smp encoder.make_dilated for output_stride=16, used by DeepLabV3+);
    # kept as a back-compat alias for output_stride=16
    dilate_last: bool = False
    # full make_dilated surface: 32 (none), 16 (stage 5 rate 2) or
    # 8 (stage 4 rate 2 + stage 5 rate 4)
    output_stride: int = 32
    dtype: Optional[Any] = None

    # channel plan per layer-group (expansion 1 for basic, 4 for bottleneck)
    @property
    def out_channels(self) -> Tuple[int, ...]:
        e = 1 if self.block == "basic" else Bottleneck.expansion
        return (3, 64, 64 * e, 128 * e, 256 * e, 512 * e)[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = [x]
        if self.depth == 0:
            return features

        # stage 1: conv7x7 s2 + BN + ReLU
        w = self.param("conv1", kaiming_normal, (7, 7, x.shape[-1], 64), jnp.float32)
        x = conv2d(x, w.astype(x.dtype), stride=2)
        x = build_norm(self.dtype, name="bn1")(x, use_running_average=not train)
        x = relu(x)
        features.append(x)

        widths = [64, 128, 256, 512]
        for stage in range(2, self.depth + 1):
            gi = stage - 2  # layer group index
            if stage == 2:
                x = max_pool_3x3(x, stride=2)
                stride = 1
            else:
                stride = 2
            os_ = 16 if (self.dilate_last and self.output_stride == 32) \
                else self.output_stride
            dilation = stage_dilation(stage, os_)
            if dilation > 1:
                stride = 1
            planes = widths[gi]
            for b in range(self.layers[gi]):
                s = stride if b == 0 else 1
                if self.block == "bottleneck":
                    need_ds = s != 1 or x.shape[-1] != planes * Bottleneck.expansion
                    x = Bottleneck(planes, stride=s, dilation=dilation,
                                   groups=self.groups,
                                   width_per_group=self.width_per_group,
                                   use_downsample=need_ds, dtype=self.dtype,
                                   name=f"layer{gi + 1}_{b}")(x, train)
                else:
                    need_ds = s != 1 or x.shape[-1] != planes
                    x = BasicBlock(planes, stride=s, dilation=dilation,
                                   use_downsample=need_ds,
                                   dtype=self.dtype, name=f"layer{gi + 1}_{b}")(x, train)
                x = relu(x)
            features.append(x)
        return features


_ENCODERS = {
    "resnet10": {"layers": (1, 1, 1, 1)},
    "resnet18": {"layers": (2, 2, 2, 2)},
    "resnet34": {"layers": (3, 4, 6, 3)},
    # Bottleneck family (encoders/resnet.py:158-280)
    "resnet50": {"layers": (3, 4, 6, 3), "block": "bottleneck"},
    "resnet101": {"layers": (3, 4, 23, 3), "block": "bottleneck"},
    "resnet152": {"layers": (3, 8, 36, 3), "block": "bottleneck"},
    "resnext50_32x4d": {"layers": (3, 4, 6, 3), "block": "bottleneck",
                        "groups": 32, "width_per_group": 4},
    "resnext101_32x4d": {"layers": (3, 4, 23, 3), "block": "bottleneck",
                         "groups": 32, "width_per_group": 4},
    "resnext101_32x8d": {"layers": (3, 4, 23, 3), "block": "bottleneck",
                         "groups": 32, "width_per_group": 8},
    "resnext101_32x16d": {"layers": (3, 4, 23, 3), "block": "bottleneck",
                          "groups": 32, "width_per_group": 16},
    "resnext101_32x32d": {"layers": (3, 4, 23, 3), "block": "bottleneck",
                          "groups": 32, "width_per_group": 32},
    "resnext101_32x48d": {"layers": (3, 4, 23, 3), "block": "bottleneck",
                          "groups": 32, "width_per_group": 48},
}


def _resolve_tu_alias(name: str, registries) -> Optional[str]:
    """Map a ``tu-<timm_name>`` onto a natively-ported encoder.

    The reference's TimmUniversalEncoder (encoders/timm_universal.py) is a
    thin ``timm.create_model(features_only=True)`` wrapper whose forward
    returns ``[x] + features`` — exactly the pyramid contract every native
    encoder here already implements. So for any timm architecture that has
    a native port, ``tu-<name>`` can resolve directly; only timm models
    with no ported architecture remain gated (a pretrained-weight-registry
    gap, not an architecture gap).
    """
    base = name[3:]
    candidates = [base, f"timm-{base}"]
    # timm underscore spellings -> smp registry spellings
    if base.startswith("efficientnet_b"):
        candidates.append("efficientnet-" + base[len("efficientnet_"):])
    if base.startswith("seresnet"):
        candidates.append("se_resnet" + base[len("seresnet"):])
    if base.startswith("seresnext"):
        candidates.append("se_resnext" + base[len("seresnext"):])
    if base.startswith("mobilenetv2"):
        candidates.append("mobilenet_v2")
    for cand in candidates:
        if cand in _ENCODERS or any(cand in r for r in registries):
            return cand
    return None


# reference error text for encoders whose make_dilated raises
# (encoders/{densenet,vgg,inceptionv4,inceptionresnetv2,xception,
#  timm_res2net,timm_resnest}.py)
_DILATED_UNSUPPORTED_MSG = {
    "DenseNetEncoder": "DenseNet encoders do not support dilated mode "
                       "due to pooling operation for downsampling!",
    "VGGEncoder": "'VGG' models do not support dilated mode due to Max "
                  "Pooling operations for downsampling!",
    "InceptionV4Encoder": "InceptionV4 encoder does not support dilated "
                          "mode due to pooling operation for downsampling!",
    "InceptionResNetV2Encoder": "InceptionResNetV2 encoder does not "
                                "support dilated mode "
                                "due to pooling operation for downsampling!",
    "XceptionEncoder": "Xception encoder does not support dilated mode "
                       "due to pooling operation for downsampling!",
    "Res2NetEncoder": "Res2Net encoders do not support dilated mode",
    "ResNestEncoder": "ResNest encoders do not support dilated mode",
}


def get_encoder_names():
    """All registered encoder names (smp encoders/__init__.py:85-86)."""
    from senas_tpu.models.encoders_extra import EXTRA_ENCODERS
    from senas_tpu.models.encoders_families import FAMILY_ENCODERS
    from senas_tpu.models.encoders_resnest import RESNEST_ENCODERS
    from senas_tpu.models.encoders_mnv3 import MNV3_ENCODERS
    from senas_tpu.models.encoders_timm2 import TIMM2_ENCODERS
    names = list(_ENCODERS)
    for r in (EXTRA_ENCODERS, FAMILY_ENCODERS, RESNEST_ENCODERS,
              TIMM2_ENCODERS, MNV3_ENCODERS):
        names.extend(r)
    return names


def get_encoder(name: str, depth: int = 5, dtype=None,
                dilate_last: bool = False,
                output_stride: int = 32,
                weights: Optional[str] = None) -> nn.Module:
    if weights is not None:
        # smp loads ImageNet weights by URL here (encoders/__init__.py:64-71);
        # impossible in this zero-egress image — fail loudly, not silently
        raise ValueError(
            f"pretrained weights {weights!r} are unavailable in this "
            "environment (no network egress); pass weights=None and "
            "initialize randomly, exactly as the reference does offline")
    if dilate_last and output_stride == 32:
        output_stride = 16
    if output_stride not in (8, 16, 32):
        raise ValueError(
            "Output stride should be 16 or 8, got {}.".format(output_stride))
    if name in _ENCODERS:
        return ResNetEncoder(depth=depth, dtype=dtype,
                             output_stride=output_stride,
                             name="encoder", **_ENCODERS[name])
    from senas_tpu.models.encoders_extra import EXTRA_ENCODERS, GATED_FAMILIES
    from senas_tpu.models.encoders_families import FAMILY_ENCODERS
    from senas_tpu.models.encoders_resnest import RESNEST_ENCODERS
    from senas_tpu.models.encoders_mnv3 import MNV3_ENCODERS
    from senas_tpu.models.encoders_timm2 import TIMM2_ENCODERS
    registries = (EXTRA_ENCODERS, FAMILY_ENCODERS, RESNEST_ENCODERS,
                  TIMM2_ENCODERS, MNV3_ENCODERS)
    if any(name in r for r in registries):
        entry = next(r[name] for r in registries if name in r)
        cls = entry["cls"]
        dilatable = "output_stride" in cls.__dataclass_fields__
        if output_stride != 32 and not dilatable:
            raise ValueError(_DILATED_UNSUPPORTED_MSG.get(
                cls.__name__, f"{name!r} does not support dilated mode"))
        kw = dict(entry["kw"])
        if dilatable:
            kw["output_stride"] = output_stride
        return cls(depth=depth, dtype=dtype, name="encoder", **kw)
    if name.startswith("tu-"):
        resolved = _resolve_tu_alias(name, registries)
        if resolved is not None:
            return get_encoder(resolved, depth=depth, dtype=dtype,
                               output_stride=output_stride)
    if any(name.startswith(f) for f in GATED_FAMILIES):
        raise KeyError(
            f"{name!r} names a timm model with no natively-ported "
            "architecture; the timm pretrained registry "
            "(TimmUniversalEncoder) is not available in this environment. "
            "tu-<name> works for every natively-ported architecture "
            "(e.g. tu-resnet34, tu-resnest50d, tu-tf_efficientnet_lite0); "
            "see senas_tpu/models/encoders_extra.py GATED_FAMILIES")
    from senas_tpu.models.encoders_extra import EXTRA_ENCODERS as _E
    raise KeyError(
        f"unknown encoder {name!r}; available: "
        f"{sorted(_ENCODERS) + sorted(_E) + sorted(FAMILY_ENCODERS) + sorted(RESNEST_ENCODERS)}")


def encoder_out_channels(name: str, depth: int = 5,
                         in_channels: int = 3) -> Tuple[int, ...]:
    """Per-stage channel pyramid of the named encoder.

    The smp contract (`params["out_channels"]`, encoders/resnet.py:135 etc.)
    as actually produced by the module: derived by abstract evaluation of the
    encoder forward (zero FLOPs), so it is correct for every registered
    family instead of hardcoding the resnet tuple.
    """
    import jax

    enc = get_encoder(name, depth=depth)
    x = jax.ShapeDtypeStruct((1, 256, 256, in_channels), jnp.float32)
    feats = jax.eval_shape(
        lambda xs: enc.init_with_output(
            {"params": jax.random.PRNGKey(0)}, xs, False)[0], x)
    return tuple(int(f.shape[-1]) for f in feats)
