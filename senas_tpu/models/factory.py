"""Model factory: name -> constructed Flax module.

Parity with reference models/__init__.py:8-105: same model names, the same
depth -> decoder-channel truncation (256,128,...)[:depth], the resnet10
encoder for every smp-style baseline, FPN/PAN upsampling 2^(depth-3), and
NUM_CLASS / IN_CHANNELS inferred from the dataset registry.
"""

from __future__ import annotations

from typing import Any, Optional

from senas_tpu.data.base import get_dataset_spec
from senas_tpu.models import zoo
from senas_tpu.models.nasunet import NasUnet
from senas_tpu.models.senas_model import SenasModel

_DECODER_CHANNELS = (256, 128, 64, 32, 16, 8, 4, 2)


def get_segmentation_model(name: str, dataset: str = "promise12", **kwargs: Any):
    spec = get_dataset_spec(dataset)
    nclass, in_ch = spec.num_class, spec.in_channels
    depth = kwargs.get("depth", 5)
    dtype = kwargs.get("dtype")
    decod = _DECODER_CHANNELS[:depth]

    name = name.lower()
    if name == "senas":
        return SenasModel(nclass=nclass, in_channels=in_ch,
                          c=kwargs.get("c", 32), depth=depth,
                          dropout_prob=kwargs.get("dropout_prob", 0.0),
                          supervision=kwargs.get("supervision", False),
                          genotype=kwargs["genotype"],
                          double_down_channel=kwargs.get("double_down_channel", False),
                          remat=kwargs.get("remat", False),
                          dtype=dtype)
    if name == "nasunet":
        return NasUnet(nclass=nclass, in_channels=in_ch, depth=depth, dtype=dtype)
    if name == "unet":
        return zoo.Unet(classes=nclass, in_channels=in_ch, encoder_depth=depth,
                        decoder_channels=decod, dtype=dtype)
    if name == "unet_plus_plus":
        return zoo.UnetPlusPlus(classes=nclass, in_channels=in_ch,
                                encoder_depth=depth, decoder_channels=decod,
                                dtype=dtype)
    if name == "manet":
        return zoo.MAnet(classes=nclass, in_channels=in_ch, encoder_depth=depth,
                         decoder_channels=decod, dtype=dtype)
    if name == "linknet":
        return zoo.Linknet(classes=nclass, in_channels=in_ch, encoder_depth=depth,
                           dtype=dtype)
    if name == "fpn":
        return zoo.FPN(classes=nclass, in_channels=in_ch, encoder_depth=depth,
                       upsampling=2 ** (depth - 3), dtype=dtype)
    if name == "pspnet":
        return zoo.PSPNet(classes=nclass, in_channels=in_ch, encoder_depth=depth,
                          dtype=dtype)
    if name == "pan":
        return zoo.PAN(classes=nclass, in_channels=in_ch, encoder_depth=depth,
                       upsampling=2 ** (depth - 3), dtype=dtype)
    if name == "deeplab_v3_plus":
        return zoo.DeepLabV3Plus(classes=nclass, in_channels=in_ch, dtype=dtype)
    raise KeyError(f"unknown model {name!r}")
