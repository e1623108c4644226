"""Zoo checkpoint import: state_dict-based translation for all 8 smp
baselines (senas_tpu/compat/zoo_import.py).

For each architecture: build the VENDORED torch decoder/head + the
torchvision-style resnet10 encoder, synthesize the reference train-CLI
checkpoint layout (the smp model's state_dict under encoder./decoder./
segmentation_head. prefixes, base/model.py:5-24), import through the
public API, and require identical eval logits — the dotted-key mirror of
the module-traversal parity in tests/test_zoo_parity.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from senas_tpu.compat import import_zoo_checkpoint, translate_zoo_model
from senas_tpu.models import zoo

import test_zoo_parity as zp

pytestmark = [pytest.mark.slow, pytest.mark.parity]


@pytest.fixture(scope="module")
def smp_mods():
    return zp.smp_mods.__wrapped__()


def _combined_sd(enc, decoder, head, cls_head=None):
    """Synthesize the smp SegmentationModel.state_dict() layout."""
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", decoder),
                        ("segmentation_head", head),
                        ("classification_head", cls_head)):
        if mod is None:
            continue
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    return sd


def _roundtrip(model_name, ours, enc, decoder, head, x, cls_head=None,
               rtol=2e-4, atol=2e-4):
    for m in (enc, decoder, head):
        m.eval()
    zp._randomize_bn(enc, decoder)
    sd = _combined_sd(enc, decoder, head, cls_head)
    ckpt = {"epoch": 5, "dur_time": 1.0, "model_state": sd,
            "model_optimizer": {}, "best_dice_coeff": 61.0,
            "best_mIoU": 50.0, "best_pixAcc": 80.0, "best_loss": 0.5}
    variables, meta = import_zoo_checkpoint(ckpt, model_name)
    assert meta["epoch"] == 5 and meta["best_dice"] == 61.0

    # structural identity with a fresh init guards naming drift
    template = ours.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(x), False)
    zp._paths_equal(template, variables)

    with torch.no_grad():
        feats = enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        out_t = head(decoder(*feats))
        if cls_head is not None:
            cls_head.eval()
            labels_t = cls_head(feats[-1]).numpy()
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    out = ours.apply(jax.tree.map(jnp.asarray, variables),
                     jnp.asarray(x), False)
    if cls_head is not None:
        (masks, labels) = out
        np.testing.assert_allclose(np.asarray(labels), labels_t,
                                   rtol=1e-4, atol=1e-5)
        out = masks
    np.testing.assert_allclose(np.asarray(out[-1]), ref, rtol=rtol, atol=atol)


ENC_CH = (3, 64, 64, 128, 256, 512)


def test_import_unet_with_aux(smp_mods):
    md, heads, dec = smp_mods
    torch.manual_seed(0)
    enc = zp._ResNet10Encoder()
    decoder = dec.UnetDecoder(encoder_channels=ENC_CH,
                              decoder_channels=(256, 128, 64, 32, 16),
                              n_blocks=5, use_batchnorm=True, center=False,
                              attention_type=None)
    head = heads.SegmentationHead(16, 2, kernel_size=3)
    cls_head = heads.ClassificationHead(in_channels=512, classes=4,
                                        dropout=0.2)
    ours = zoo.Unet(classes=2, in_channels=3, encoder_name="resnet10",
                    encoder_depth=5, decoder_channels=(256, 128, 64, 32, 16),
                    aux_params=dict(classes=4, dropout=0.2))
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    _roundtrip("unet", ours, enc, decoder, head, x, cls_head=cls_head,
               rtol=1e-4, atol=1e-5)


def test_import_unetplusplus(smp_mods):
    _, heads, _ = smp_mods
    udec = zp._load_decoder("unetplusplus")
    torch.manual_seed(7)
    enc = zp._ResNet10Encoder()
    decoder = udec.UnetPlusPlusDecoder(
        encoder_channels=ENC_CH, decoder_channels=(256, 128, 64, 32, 16),
        n_blocks=5, use_batchnorm=True, attention_type=None, center=False)
    head = heads.SegmentationHead(16, 2, kernel_size=3)
    ours = zoo.UnetPlusPlus(classes=2, in_channels=3, encoder_name="resnet10",
                            encoder_depth=5,
                            decoder_channels=(256, 128, 64, 32, 16))
    x = np.random.RandomState(7).randn(1, 64, 64, 3).astype(np.float32)
    _roundtrip("unet_plus_plus", ours, enc, decoder, head, x)


def test_import_linknet(smp_mods):
    _, heads, _ = smp_mods
    ldec = zp._load_decoder("linknet")
    torch.manual_seed(1)
    enc = zp._ResNet10Encoder()
    decoder = ldec.LinknetDecoder(encoder_channels=ENC_CH,
                                  prefinal_channels=32, n_blocks=5,
                                  use_batchnorm=True)
    head = heads.SegmentationHead(32, 2, kernel_size=3)
    ours = zoo.Linknet(classes=2, in_channels=3, encoder_name="resnet10",
                       encoder_depth=5, prefinal_channels=32)
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    _roundtrip("linknet", ours, enc, decoder, head, x, rtol=1e-4, atol=1e-5)


def test_import_fpn(smp_mods):
    _, heads, _ = smp_mods
    fdec = zp._load_decoder("fpn")
    torch.manual_seed(2)
    enc = zp._ResNet10Encoder()
    decoder = fdec.FPNDecoder(encoder_channels=ENC_CH, encoder_depth=5,
                              pyramid_channels=256,
                              segmentation_channels=128, dropout=0.2,
                              merge_policy="add")
    head = heads.SegmentationHead(128, 2, kernel_size=3, upsampling=4)
    ours = zoo.FPN(classes=2, in_channels=3, encoder_name="resnet10",
                   encoder_depth=5)
    x = np.random.RandomState(2).randn(2, 64, 64, 3).astype(np.float32)
    _roundtrip("fpn", ours, enc, decoder, head, x, rtol=1e-4, atol=1e-4)


def test_import_pspnet(smp_mods):
    _, heads, _ = smp_mods
    pdec = zp._load_decoder("pspnet")
    torch.manual_seed(3)
    enc = zp._ResNet10Encoder()
    decoder = pdec.PSPDecoder(encoder_channels=ENC_CH, use_batchnorm=True,
                              out_channels=512, dropout=0.2)
    head = heads.SegmentationHead(512, 2, kernel_size=3, upsampling=8)
    ours = zoo.PSPNet(classes=2, in_channels=3, encoder_name="resnet10",
                      encoder_depth=5, psp_out_channels=512, upsampling=8)
    x = np.random.RandomState(3).randn(1, 192, 192, 3).astype(np.float32)
    _roundtrip("pspnet", ours, enc, decoder, head, x, rtol=1e-4, atol=1e-4)


def test_import_deeplabv3plus(smp_mods):
    _, heads, _ = smp_mods
    ddec = zp._load_decoder("deeplabv3")
    torch.manual_seed(4)
    enc = zp._ResNet10Encoder()
    for mod in enc.layer4.modules():  # make_dilated(16)
        if isinstance(mod, tnn.Conv2d):
            mod.stride = (1, 1)
            mod.dilation = (2, 2)
            kh = mod.kernel_size[0]
            mod.padding = ((kh // 2) * 2, (kh // 2) * 2)
    decoder = ddec.DeepLabV3PlusDecoder(
        encoder_channels=ENC_CH, out_channels=256, atrous_rates=(12, 24, 36),
        output_stride=16)
    head = heads.SegmentationHead(256, 2, kernel_size=3, upsampling=4)
    ours = zoo.DeepLabV3Plus(classes=2, in_channels=3,
                             encoder_name="resnet10", encoder_depth=5,
                             output_stride=16)
    x = np.random.RandomState(4).randn(1, 64, 64, 3).astype(np.float32)
    _roundtrip("deeplab_v3_plus", ours, enc, decoder, head, x,
               rtol=1e-4, atol=1e-4)


def test_import_manet(smp_mods):
    _, heads, _ = smp_mods
    mdec = zp._load_decoder("manet")
    torch.manual_seed(5)
    enc = zp._ResNet10Encoder()
    decoder = mdec.MAnetDecoder(encoder_channels=ENC_CH,
                                decoder_channels=(256, 128, 64, 32, 16),
                                n_blocks=5, reduction=16, use_batchnorm=True,
                                pab_channels=64)
    head = heads.SegmentationHead(16, 2, kernel_size=3)
    ours = zoo.MAnet(classes=2, in_channels=3, encoder_name="resnet10",
                     encoder_depth=5, decoder_channels=(256, 128, 64, 32, 16))
    x = np.random.RandomState(5).randn(1, 64, 64, 3).astype(np.float32)
    _roundtrip("manet", ours, enc, decoder, head, x)


def test_import_pan(smp_mods):
    _, heads, _ = smp_mods
    pdec = zp._load_decoder("pan")
    torch.manual_seed(6)
    enc = zp._ResNet10Encoder()
    for mod in enc.layer4.modules():  # make_dilated(16)
        if isinstance(mod, tnn.Conv2d):
            mod.stride = (1, 1)
            mod.dilation = (2, 2)
            kh = mod.kernel_size[0]
            mod.padding = ((kh // 2) * 2, (kh // 2) * 2)
    decoder = pdec.PANDecoder(encoder_channels=ENC_CH, decoder_channels=32)
    head = heads.SegmentationHead(32, 2, kernel_size=3, upsampling=4)
    ours = zoo.PAN(classes=2, in_channels=3, encoder_name="resnet10",
                   encoder_depth=5, decoder_channels=32)
    x = np.random.RandomState(6).randn(1, 128, 128, 3).astype(np.float32)
    _roundtrip("pan", ours, enc, decoder, head, x)


def test_unknown_model_rejected():
    with pytest.raises(KeyError, match="no zoo translator"):
        translate_zoo_model({}, "segformer")


def test_import_nasunet():
    """NasUnet state_dict round-trip through the zoo import API (the
    reference's 10th trainable model, models/nasunet/nas_unet.py)."""
    import test_nasunet_parity as nup

    from senas_tpu.models.nasunet import NasUnet

    gen = nup.ref_nasunet_mod.__wrapped__()  # generator fixture, drive by hand
    ref_mod = next(gen)
    try:
        nclass, in_ch, c, depth = 2, 1, 16, 3
        torch.manual_seed(0)
        ref = ref_mod.NasUnet(nclass, in_ch, c=c, depth=depth,
                              dropout_prob=0, double_down_channel=False)
        ref.eval()
        variables = translate_zoo_model(ref.state_dict(), "nasunet")
        assert "batch_stats" not in variables

        ours = NasUnet(nclass=nclass, in_channels=in_ch, c=c, depth=depth)
        x = np.random.RandomState(0).randn(2, 32, 32, in_ch).astype(np.float32)
        template = ours.init({"params": jax.random.PRNGKey(0)},
                             jnp.asarray(x), False)
        zp._paths_equal(template, variables)
        with torch.no_grad():
            ref_out = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))[-1]
        ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
        out = ours.apply(jax.tree.map(jnp.asarray, variables),
                         jnp.asarray(x), False)[-1]
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   rtol=2e-4, atol=2e-5)
    finally:
        gen.close()
