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


class ResNetEncoder(nn.Module):
    layers: Sequence[int]          # blocks per stage, e.g. (1,1,1,1)
    depth: int = 5                 # number of downsampling stages used
    base_width: int = 64
    # dilate_last replaces the final stage's stride with dilation 2
    # (smp encoder.make_dilated for output_stride=16, used by DeepLabV3+)
    dilate_last: bool = False
    dtype: Optional[Any] = None

    # channel plan per layer-group (BasicBlock expansion = 1)
    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3, 64, 64, 128, 256, 512)[: self.depth + 1]

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
            dilation = 1
            if self.dilate_last and stage == self.depth:
                stride, dilation = 1, 2
            planes = widths[gi]
            for b in range(self.layers[gi]):
                s = stride if b == 0 else 1
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
}


def get_encoder(name: str, depth: int = 5, dtype=None,
                dilate_last: bool = False) -> nn.Module:
    if name in _ENCODERS:
        return ResNetEncoder(layers=_ENCODERS[name]["layers"], depth=depth,
                             dtype=dtype, dilate_last=dilate_last,
                             name="encoder")
    from senas_tpu.models.encoders_extra import EXTRA_ENCODERS, GATED_FAMILIES
    from senas_tpu.models.encoders_families import FAMILY_ENCODERS
    if name in EXTRA_ENCODERS or name in FAMILY_ENCODERS:
        if dilate_last:
            raise ValueError(f"{name!r} does not support dilated mode")
        entry = EXTRA_ENCODERS.get(name) or FAMILY_ENCODERS[name]
        return entry["cls"](depth=depth, dtype=dtype, name="encoder",
                            **entry["kw"])
    if any(name.startswith(f) for f in GATED_FAMILIES):
        raise KeyError(
            f"encoder family of {name!r} wraps the timm model registry "
            "(TimmUniversalEncoder / timm-* wrappers), which is not "
            "available in this environment; see "
            "senas_tpu/models/encoders_extra.py GATED_FAMILIES")
    from senas_tpu.models.encoders_extra import EXTRA_ENCODERS as _E
    raise KeyError(f"unknown encoder {name!r}; available: "
                   f"{sorted(_ENCODERS) + sorted(_E) + sorted(FAMILY_ENCODERS)}")


def encoder_out_channels(name: str, depth: int = 5) -> Tuple[int, ...]:
    return (3, 64, 64, 128, 256, 512)[: depth + 1]
