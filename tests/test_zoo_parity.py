"""Baseline-zoo differential parity: our Flax Unet vs the reference's
VENDORED smp implementation (segmentation_models_pytorch/unet/decoder.py +
base/modules.py + base/heads.py + encoders/resnet.py resnet10 entry).

The torch side runs the reference's own decoder/head/Conv2dReLU code,
loaded file-by-file with importlib (the package __init__ pulls timm /
pretrainedmodels, which don't exist here). The one stand-in is the
torchvision `ResNet`/`BasicBlock` base class pair (torchvision is not in
the image): reimplemented below with the standard torchvision formula the
smp resnet10 entry builds on (encoders/resnet.py:131-138).

Translated weights must produce identical eval-mode logits — this pins the
encoder stage layout, the nearest-upsample + skip-concat decoder order,
Conv2dReLU/BN conventions, and the segmentation head.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from senas_tpu.models.zoo import Unet

pytestmark = [pytest.mark.slow, pytest.mark.parity]

REF = "/root/reference/segmentation_models_pytorch"


@pytest.fixture(scope="module")
def smp_mods():
    def pkg(name, path):
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m
        return m

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkg("smpref", REF)
    base = pkg("smpref.base", REF + "/base")
    md = load("smpref.base.modules", REF + "/base/modules.py")
    base.modules = md
    heads = load("smpref.base.heads", REF + "/base/heads.py")
    base.heads = heads
    pkg("smpref.unet", REF + "/unet")
    dec = load("smpref.unet.decoder", REF + "/unet/decoder.py")
    return md, heads, dec


# --- minimal faithful torchvision resnet (the smp resnet10 base) ---------

class _BasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return torch.relu(out + identity)


class _ResNet10Encoder(tnn.Module):
    """smp ResNetEncoder(resnet10) semantics: get_stages order
    (encoders/resnet.py:47-65) over the torchvision layer plan."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 1, 1)
        self.layer2 = self._make_layer(128, 1, 2)
        self.layer3 = self._make_layer(256, 1, 2)
        self.layer4 = self._make_layer(512, 1, 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        layers = [_BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(_BasicBlock(planes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        feats = [x]
        x = torch.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.layer1(self.maxpool(x))
        feats.append(x)
        for layer in (self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


def _conv(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _bn(mod):
    p = {"scale": jnp.asarray(mod.weight.detach().numpy()),
         "bias": jnp.asarray(mod.bias.detach().numpy())}
    s = {"mean": jnp.asarray(mod.running_mean.numpy()),
         "var": jnp.asarray(mod.running_var.numpy())}
    return p, s


def _translate_encoder(enc):
    params, stats = {}, {}
    params["conv1"] = _conv(enc.conv1.weight)
    params["bn1"], stats["bn1"] = _bn(enc.bn1)
    for gi, layer in enumerate((enc.layer1, enc.layer2, enc.layer3, enc.layer4)):
        for b, blk in enumerate(layer):
            key = f"layer{gi + 1}_{b}"
            p = {"conv1": _conv(blk.conv1.weight),
                 "conv2": _conv(blk.conv2.weight)}
            s = {}
            p["bn1"], s["bn1"] = _bn(blk.bn1)
            p["bn2"], s["bn2"] = _bn(blk.bn2)
            if blk.downsample is not None:
                p["down_conv"] = _conv(blk.downsample[0].weight)
                p["down_bn"], s["down_bn"] = _bn(blk.downsample[1])
            params[key], stats[key] = p, s
    return params, stats


def _translate_conv2drelu(seq):
    """smp Conv2dReLU = Sequential(conv, bn, relu) -> our Conv2dReLU vars."""
    p = {"kernel": _conv(seq[0].weight)}
    bn_p, bn_s = _bn(seq[1])
    p["BatchNorm_0"] = bn_p
    return p, {"BatchNorm_0": bn_s}


def test_unet_matches_vendored_smp(smp_mods):
    md, heads, dec = smp_mods
    torch.manual_seed(0)
    enc = _ResNet10Encoder()
    decoder = dec.UnetDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512),
        decoder_channels=(256, 128, 64, 32, 16),
        n_blocks=5, use_batchnorm=True, center=False, attention_type=None)
    head = heads.SegmentationHead(16, 2, kernel_size=3)
    for m in (enc, decoder, head):
        m.eval()
    # non-trivial running stats
    with torch.no_grad():
        for mod in list(enc.modules()) + list(decoder.modules()):
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)

    rs = np.random.RandomState(0)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        feats = enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        out_t = head(decoder(*feats))
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    ours = Unet(classes=2, in_channels=3, encoder_name="resnet10",
                encoder_depth=5, decoder_channels=(256, 128, 64, 32, 16))
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)

    enc_p, enc_s = _translate_encoder(enc)
    params = {"encoder": enc_p}
    stats = {"encoder": enc_s}
    for i, blk in enumerate(decoder.blocks):
        p1, s1 = _translate_conv2drelu(blk.conv1)
        p2, s2 = _translate_conv2drelu(blk.conv2)
        params[f"dec_{i}"] = {"Conv2dReLU_0": p1, "Conv2dReLU_1": p2}
        stats[f"dec_{i}"] = {"Conv2dReLU_0": s1, "Conv2dReLU_1": s2}
    params["SegmentationHead_0"] = {
        "kernel": _conv(head[0].weight),
        "bias": jnp.asarray(head[0].bias.detach().numpy())}
    translated = {"params": params, "batch_stats": stats}

    # structural identity with the init tree guards naming drift
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(translated)[0]}
    assert ref_paths == got_paths, (
        f"missing={sorted(ref_paths - got_paths)[:5]} "
        f"extra={sorted(got_paths - ref_paths)[:5]}")

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def _tconv(w):
    """ConvTranspose2d (I,O,kH,kW): spatial flip + transpose to HWIO."""
    return jnp.asarray(
        np.flip(w.detach().numpy(), axis=(2, 3)).transpose(2, 3, 0, 1).copy())


def test_linknet_matches_vendored_smp(smp_mods):
    md, heads, _ = smp_mods

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkgm = types.ModuleType("smpref.linknet")
    pkgm.__path__ = [REF + "/linknet"]
    sys.modules["smpref.linknet"] = pkgm
    ldec = load("smpref.linknet.decoder", REF + "/linknet/decoder.py")

    from senas_tpu.models.zoo import Linknet

    torch.manual_seed(1)
    enc = _ResNet10Encoder()
    decoder = ldec.LinknetDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512),
        prefinal_channels=32, n_blocks=5, use_batchnorm=True)
    head = heads.SegmentationHead(32, 2, kernel_size=3)
    for m in (enc, decoder, head):
        m.eval()
    with torch.no_grad():
        for mod in list(enc.modules()) + list(decoder.modules()):
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)

    rs = np.random.RandomState(1)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = head(decoder(*enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))))
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    ours = Linknet(classes=2, in_channels=3, encoder_name="resnet10",
                   encoder_depth=5, prefinal_channels=32)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)

    enc_p, enc_s = _translate_encoder(enc)
    params, stats = {"encoder": enc_p}, {"encoder": enc_s}
    for i, blk in enumerate(decoder.blocks):
        c1, t, c2 = blk.block[0], blk.block[1], blk.block[2]
        p1, s1 = _translate_conv2drelu(c1)
        p2, s2 = _translate_conv2drelu(c2)
        bn_p, bn_s = _bn(t[1])
        params[f"dec_{i}"] = {
            "Conv2dReLU_0": p1,
            "tkernel": _tconv(t[0].weight),
            "tbias": jnp.asarray(t[0].bias.detach().numpy()),
            "BatchNorm_0": bn_p,
            "Conv2dReLU_1": p2,
        }
        stats[f"dec_{i}"] = {"Conv2dReLU_0": s1, "BatchNorm_0": bn_s,
                             "Conv2dReLU_1": s2}
    params["SegmentationHead_0"] = {
        "kernel": _conv(head[0].weight),
        "bias": jnp.asarray(head[0].bias.detach().numpy())}
    translated = {"params": params, "batch_stats": stats}

    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(translated)[0]}
    assert ref_paths == got_paths, (
        f"missing={sorted(ref_paths - got_paths)[:5]} "
        f"extra={sorted(got_paths - ref_paths)[:5]}")

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_fpn_matches_vendored_smp(smp_mods):
    md, heads, _ = smp_mods

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkgm = types.ModuleType("smpref.fpn")
    pkgm.__path__ = [REF + "/fpn"]
    sys.modules["smpref.fpn"] = pkgm
    fdec = load("smpref.fpn.decoder", REF + "/fpn/decoder.py")

    from senas_tpu.models.zoo import FPN

    torch.manual_seed(2)
    enc = _ResNet10Encoder()
    decoder = fdec.FPNDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512), encoder_depth=5,
        pyramid_channels=256, segmentation_channels=128, dropout=0.2,
        merge_policy="add")
    head = heads.SegmentationHead(128, 2, kernel_size=3, upsampling=4)
    for m in (enc, decoder, head):
        m.eval()
    with torch.no_grad():
        for mod in enc.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)

    rs = np.random.RandomState(2)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = head(decoder(*enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))))
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    ours = FPN(classes=2, in_channels=3, encoder_name="resnet10",
               encoder_depth=5)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)

    def _gn(mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    enc_p, enc_s = _translate_encoder(enc)
    params, stats = {"encoder": enc_p}, {"encoder": enc_s}
    params["p5"] = _conv(decoder.p5.weight)
    params["p5_b"] = jnp.asarray(decoder.p5.bias.detach().numpy())
    for name, blk in (("p4_skip", decoder.p4), ("p3_skip", decoder.p3),
                      ("p2_skip", decoder.p2)):
        params[name] = _conv(blk.skip_conv.weight)
        params[name + "_b"] = jnp.asarray(blk.skip_conv.bias.detach().numpy())
    for i, seg in enumerate(decoder.seg_blocks):
        for j, sub in enumerate(seg.block):
            params[f"seg_{i}_{j}"] = {
                "kernel": _conv(sub.block[0].weight),
                "GroupNorm_0": _gn(sub.block[1])}
    params["SegmentationHead_0"] = {
        "kernel": _conv(head[0].weight),
        "bias": jnp.asarray(head[0].bias.detach().numpy())}
    translated = {"params": params, "batch_stats": stats}

    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(translated)[0]}
    assert ref_paths == got_paths, (
        f"missing={sorted(ref_paths - got_paths)[:5]} "
        f"extra={sorted(got_paths - ref_paths)[:5]}")

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def _load_decoder(subpkg):
    name = f"smpref.{subpkg}"
    pkgm = types.ModuleType(name)
    pkgm.__path__ = [REF + "/" + subpkg]
    sys.modules[name] = pkgm
    spec = importlib.util.spec_from_file_location(
        name + ".decoder", REF + f"/{subpkg}/decoder.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name + ".decoder"] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize_bn(*models):
    with torch.no_grad():
        for m in models:
            for mod in m.modules():
                if isinstance(mod, tnn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.2)
                    mod.running_var.uniform_(0.5, 1.5)


def _paths_equal(variables, translated):
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(translated)[0]}
    assert ref_paths == got_paths, (
        f"missing={sorted(ref_paths - got_paths)[:6]} "
        f"extra={sorted(got_paths - ref_paths)[:6]}")


def test_pspnet_matches_vendored_smp(smp_mods):
    """PSP pooling pyramid + the x8 align-corners head upsample."""
    md, heads, _ = smp_mods
    pdec = _load_decoder("pspnet")
    from senas_tpu.models.zoo import PSPNet

    torch.manual_seed(3)
    enc = _ResNet10Encoder()
    decoder = pdec.PSPDecoder(encoder_channels=(3, 64, 64, 128, 256, 512),
                              use_batchnorm=True, out_channels=512,
                              dropout=0.2)
    head = heads.SegmentationHead(512, 2, kernel_size=3, upsampling=8)
    for m in (enc, decoder, head):
        m.eval()
    _randomize_bn(enc, decoder)

    rs = np.random.RandomState(3)
    # 192**2 input -> 6x6 bottom features: all PSP pool sizes (1,2,3,6)
    # divide evenly, the exact-adaptive-pool path on our side
    x = rs.randn(1, 192, 192, 3).astype(np.float32)
    with torch.no_grad():
        out_t = head(decoder(*enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))))
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    ours = PSPNet(classes=2, in_channels=3, encoder_name="resnet10",
                  encoder_depth=5, psp_out_channels=512, upsampling=8)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)

    enc_p, enc_s = _translate_encoder(enc)
    params, stats = {"encoder": enc_p}, {"encoder": enc_s}
    for si, blk in enumerate(decoder.psp.blocks):
        seq = blk.pool[1]  # Conv2dReLU
        if si == 0:  # pool_size=1: use_batchnorm forced False -> conv bias
            params[f"psp_{si}"] = {
                "kernel": _conv(seq[0].weight),
                "bias": jnp.asarray(seq[0].bias.detach().numpy())}
        else:
            p, s = _translate_conv2drelu(seq)
            params[f"psp_{si}"], stats[f"psp_{si}"] = p, s
    p, s = _translate_conv2drelu(decoder.conv)
    params["Conv2dReLU_0"], stats["Conv2dReLU_0"] = p, s
    params["SegmentationHead_0"] = {
        "kernel": _conv(head[0].weight),
        "bias": jnp.asarray(head[0].bias.detach().numpy())}
    translated = {"params": params, "batch_stats": stats}
    _paths_equal(variables, translated)

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("output_stride", [16, 8])
def test_deeplabv3plus_matches_vendored_smp(smp_mods, output_stride):
    """ASPP separable convs + dilated encoder stage(s) + align-corners ups.

    output_stride=16 patches stage 5 (rate 2); output_stride=8 patches
    stages 4 and 5 with rates 2 and 4 (encoders/_base.py:35-53).
    """
    md, heads, _ = smp_mods
    ddec = _load_decoder("deeplabv3")
    from senas_tpu.models.zoo import DeepLabV3Plus

    torch.manual_seed(4)
    enc = _ResNet10Encoder()

    # smp make_dilated: patch EVERY conv of the dilated stage(s)
    # (encoders/_utils.py:48-56)
    def dilate(layer, rate):
        for mod in layer.modules():
            if isinstance(mod, tnn.Conv2d):
                mod.stride = (1, 1)
                mod.dilation = (rate, rate)
                kh = mod.kernel_size[0]
                mod.padding = ((kh // 2) * rate, (kh // 2) * rate)

    if output_stride == 16:
        dilate(enc.layer4, 2)
    else:
        dilate(enc.layer3, 2)
        dilate(enc.layer4, 4)
    decoder = ddec.DeepLabV3PlusDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512), out_channels=256,
        atrous_rates=(12, 24, 36), output_stride=output_stride)
    head = heads.SegmentationHead(256, 2, kernel_size=3, upsampling=4)
    for m in (enc, decoder, head):
        m.eval()
    _randomize_bn(enc, decoder)

    rs = np.random.RandomState(4)
    x = rs.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = head(decoder(*enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))))
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    ours = DeepLabV3Plus(classes=2, in_channels=3, encoder_name="resnet10",
                         encoder_depth=5, output_stride=output_stride)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)

    def _sep(seq_sep, seq_bn):
        """smp SeparableConv2d (Sequential dw, pw) + following BN."""
        p = {"dw": _conv(seq_sep[0].weight), "pw": _conv(seq_sep[1].weight)}
        bn_p, bn_s = _bn(seq_bn)
        p["BatchNorm_0"] = bn_p
        return p, {"BatchNorm_0": bn_s}

    enc_p, enc_s = _translate_encoder(enc)
    params, stats = {"encoder": enc_p}, {"encoder": enc_s}
    aspp = decoder.aspp[0]
    ap, asv = {}, {}
    p, s = _translate_conv2drelu(aspp.convs[0])
    ap["conv1x1"], asv["conv1x1"] = p, s
    for i in range(3):
        branch = aspp.convs[1 + i]  # ASPPSeparableConv: (SeparableConv2d, BN, ReLU)
        p, s = _sep(branch[0], branch[1])
        ap[f"aspp_{i}"], asv[f"aspp_{i}"] = p, s
    pool = aspp.convs[4]  # (AdaptiveAvgPool, conv, BN, ReLU)
    p, s = _translate_conv2drelu([pool[1], pool[2]])
    ap["pool_conv"], asv["pool_conv"] = p, s
    p, s = _translate_conv2drelu(aspp.project)
    ap["project"], asv["project"] = p, s
    params["ASPP_0"], stats["ASPP_0"] = ap, asv
    p, s = _sep(decoder.aspp[1], decoder.aspp[2])
    params["aspp_post"], stats["aspp_post"] = p, s
    p, s = _translate_conv2drelu(decoder.block1)
    params["highres"], stats["highres"] = p, s
    p, s = _sep(decoder.block2[0], decoder.block2[1])
    params["fuse"], stats["fuse"] = p, s
    params["SegmentationHead_0"] = {
        "kernel": _conv(head[0].weight),
        "bias": jnp.asarray(head[0].bias.detach().numpy())}
    translated = {"params": params, "batch_stats": stats}
    _paths_equal(variables, translated)

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_manet_matches_vendored_smp(smp_mods):
    """PAB global position attention (incl. the reference's scrambled
    [B,HW,C]->(B,C,H,W) reshape quirk) + MFAB dual-SE fusion blocks."""
    md, heads, _ = smp_mods
    mdec = _load_decoder("manet")
    from senas_tpu.models.zoo import MAnet

    torch.manual_seed(5)
    enc = _ResNet10Encoder()
    decoder = mdec.MAnetDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512),
        decoder_channels=(256, 128, 64, 32, 16), n_blocks=5,
        reduction=16, use_batchnorm=True, pab_channels=64)
    head = heads.SegmentationHead(16, 2, kernel_size=3)
    for m in (enc, decoder, head):
        m.eval()
    _randomize_bn(enc, decoder)

    rs = np.random.RandomState(5)
    x = rs.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = head(decoder(*enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))))
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    ours = MAnet(classes=2, in_channels=3, encoder_name="resnet10",
                 encoder_depth=5, decoder_channels=(256, 128, 64, 32, 16))
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)

    def _cb(mod):  # plain Conv2d with bias
        return (_conv(mod.weight), jnp.asarray(mod.bias.detach().numpy()))

    enc_p, enc_s = _translate_encoder(enc)
    params, stats = {"encoder": enc_p}, {"encoder": enc_s}
    pab = decoder.center
    pk, pb = _cb(pab.top_conv)
    ck, cb = _cb(pab.center_conv)
    bk, bb = _cb(pab.bottom_conv)
    ok, ob = _cb(pab.out_conv)
    params["PAB_0"] = {"top": pk, "top_b": pb, "center": ck, "center_b": cb,
                       "bottom": bk, "bottom_b": bb, "out": ok, "out_bias": ob}
    for i, blk in enumerate(decoder.blocks):
        if hasattr(blk, "hl_conv"):  # MFAB
            p, s = {}, {}
            p["Conv2dReLU_0"], s["Conv2dReLU_0"] = _translate_conv2drelu(blk.hl_conv[0])
            p["Conv2dReLU_1"], s["Conv2dReLU_1"] = _translate_conv2drelu(blk.hl_conv[1])
            for tag, se in (("hl", blk.SE_hl), ("ll", blk.SE_ll)):
                p[f"{tag}_w1"], p[f"{tag}_b1"] = _cb(se[1])
                p[f"{tag}_w2"], p[f"{tag}_b2"] = _cb(se[3])
            p["Conv2dReLU_2"], s["Conv2dReLU_2"] = _translate_conv2drelu(blk.conv1)
            p["Conv2dReLU_3"], s["Conv2dReLU_3"] = _translate_conv2drelu(blk.conv2)
        else:  # plain DecoderBlock (no skip)
            p, s = {}, {}
            p["Conv2dReLU_0"], s["Conv2dReLU_0"] = _translate_conv2drelu(blk.conv1)
            p["Conv2dReLU_1"], s["Conv2dReLU_1"] = _translate_conv2drelu(blk.conv2)
        params[f"dec_{i}"], stats[f"dec_{i}"] = p, s
    params["SegmentationHead_0"] = {
        "kernel": _conv(head[0].weight),
        "bias": jnp.asarray(head[0].bias.detach().numpy())}
    translated = {"params": params, "batch_stats": stats}
    _paths_equal(variables, translated)

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pan_matches_vendored_smp(smp_mods):
    """FPA pyramid attention + GAU blocks over the dilated encoder."""
    md, heads, _ = smp_mods
    pdec = _load_decoder("pan")
    from senas_tpu.models.zoo import PAN

    torch.manual_seed(6)
    enc = _ResNet10Encoder()
    for mod in enc.layer4.modules():  # make_dilated(16)
        if isinstance(mod, tnn.Conv2d):
            mod.stride = (1, 1)
            mod.dilation = (2, 2)
            kh = mod.kernel_size[0]
            mod.padding = ((kh // 2) * 2, (kh // 2) * 2)
    decoder = pdec.PANDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512), decoder_channels=32)
    head = heads.SegmentationHead(32, 2, kernel_size=3, upsampling=4)
    for m in (enc, decoder, head):
        m.eval()
    _randomize_bn(enc, decoder)

    rs = np.random.RandomState(6)
    # 128^2: the FPA pyramid needs the stride-16 bottom at >=8x8
    x = rs.randn(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        out_t = head(decoder(*enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))))
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    ours = PAN(classes=2, in_channels=3, encoder_name="resnet10",
               encoder_depth=5, decoder_channels=32)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)

    def _cbr(mod):  # pan ConvBnRelu: conv(bias) + BN
        p = {"kernel": _conv(mod.conv.weight),
             "bias": jnp.asarray(mod.conv.bias.detach().numpy())}
        bn_p, bn_s = _bn(mod.bn)
        p["BatchNorm_0"] = bn_p
        return p, {"BatchNorm_0": bn_s}

    enc_p, enc_s = _translate_encoder(enc)
    params, stats = {"encoder": enc_p}, {"encoder": enc_s}
    fpa = decoder.fpa
    fp, fs = {}, {}
    fp["branch1"], fs["branch1"] = _cbr(fpa.branch1[1])
    fp["mid"], fs["mid"] = _cbr(fpa.mid[0])
    fp["down1"], fs["down1"] = _cbr(fpa.down1[1])
    fp["down2"], fs["down2"] = _cbr(fpa.down2[1])
    fp["down3a"], fs["down3a"] = _cbr(fpa.down3[1])
    fp["down3b"], fs["down3b"] = _cbr(fpa.down3[2])
    fp["conv2"], fs["conv2"] = _cbr(fpa.conv2)
    fp["conv1"], fs["conv1"] = _cbr(fpa.conv1)
    params["FPABlock_0"], stats["FPABlock_0"] = fp, fs
    for name, gau in (("gau3", decoder.gau3), ("gau2", decoder.gau2),
                      ("gau1", decoder.gau1)):
        gp, gs = {}, {}
        gp["conv1"], gs["conv1"] = _cbr(gau.conv1[1])
        gp["conv2"], gs["conv2"] = _cbr(gau.conv2)
        params[name], stats[name] = gp, gs
    params["SegmentationHead_0"] = {
        "kernel": _conv(head[0].weight),
        "bias": jnp.asarray(head[0].bias.detach().numpy())}
    translated = {"params": params, "batch_stats": stats}
    _paths_equal(variables, translated)

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_unetplusplus_matches_vendored_smp(smp_mods):
    """The dense UNet++ grid: every x_{i}_{j} block translated by key."""
    md, heads, _ = smp_mods
    udec = _load_decoder("unetplusplus")
    from senas_tpu.models.zoo import UnetPlusPlus

    torch.manual_seed(7)
    enc = _ResNet10Encoder()
    decoder = udec.UnetPlusPlusDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512),
        decoder_channels=(256, 128, 64, 32, 16), n_blocks=5,
        use_batchnorm=True, attention_type=None, center=False)
    head = heads.SegmentationHead(16, 2, kernel_size=3)
    for m in (enc, decoder, head):
        m.eval()
    _randomize_bn(enc, decoder)

    rs = np.random.RandomState(7)
    x = rs.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = head(decoder(*enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))))
    ref = np.transpose(out_t.numpy(), (0, 2, 3, 1))

    ours = UnetPlusPlus(classes=2, in_channels=3, encoder_name="resnet10",
                        encoder_depth=5, decoder_channels=(256, 128, 64, 32, 16))
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)

    enc_p, enc_s = _translate_encoder(enc)
    params, stats = {"encoder": enc_p}, {"encoder": enc_s}
    for key in variables["params"]:
        if not key.startswith("x_"):
            continue
        blk = decoder.blocks[key]
        p, s = {}, {}
        p["Conv2dReLU_0"], s["Conv2dReLU_0"] = _translate_conv2drelu(blk.conv1)
        p["Conv2dReLU_1"], s["Conv2dReLU_1"] = _translate_conv2drelu(blk.conv2)
        params[key], stats[key] = p, s
    params["SegmentationHead_0"] = {
        "kernel": _conv(head[0].weight),
        "bias": jnp.asarray(head[0].bias.detach().numpy())}
    translated = {"params": params, "batch_stats": stats}
    _paths_equal(variables, translated)

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_unet_gradient_parity_vs_vendored_smp(smp_mods):
    """Full-tree d(loss)/d(params) parity for the zoo path.

    The logits tests above pin the forward; this pins the backward: CE loss
    on an identical batch, torch autograd vs jax.grad, compared over EVERY
    parameter by pushing the torch .grad tensors through the same weight
    translation (translation is a pure transposition, so translated grads
    ARE our-layout grads). Guards BN-scale/beta grad flow and the
    nearest-upsample/concat backward through the whole decoder."""
    md, heads, dec = smp_mods
    from senas_tpu.models.zoo import Unet

    torch.manual_seed(7)
    enc = _ResNet10Encoder()
    decoder = dec.UnetDecoder(
        encoder_channels=(3, 64, 64, 128, 256, 512),
        decoder_channels=(256, 128, 64, 32, 16),
        n_blocks=5, use_batchnorm=True, center=False, attention_type=None)
    head = heads.SegmentationHead(16, 2, kernel_size=3)
    for m in (enc, decoder, head):
        m.eval()
    _randomize_bn(enc, decoder)

    rs = np.random.RandomState(7)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    y = rs.randint(0, 2, size=(2, 64, 64)).astype(np.int64)

    def translate():
        enc_p, enc_s = _translate_encoder(enc)
        params, stats = {"encoder": enc_p}, {"encoder": enc_s}
        for i, blk in enumerate(decoder.blocks):
            p1, s1 = _translate_conv2drelu(blk.conv1)
            p2, s2 = _translate_conv2drelu(blk.conv2)
            params[f"dec_{i}"] = {"Conv2dReLU_0": p1, "Conv2dReLU_1": p2}
            stats[f"dec_{i}"] = {"Conv2dReLU_0": s1, "Conv2dReLU_1": s2}
        params["SegmentationHead_0"] = {
            "kernel": _conv(head[0].weight),
            "bias": jnp.asarray(head[0].bias.detach().numpy())}
        return params, stats

    params, stats = translate()

    out = head(decoder(*enc(torch.tensor(np.transpose(x, (0, 3, 1, 2))))))
    loss = torch.nn.functional.cross_entropy(out, torch.tensor(y))
    loss.backward()
    # swap grads into the module weights, then reuse the SAME translation
    with torch.no_grad():
        for m in (enc, decoder, head):
            for p in m.parameters():
                assert p.grad is not None
                p.data = p.grad.clone()
    grads_ref, _ = translate()

    ours = Unet(classes=2, in_channels=3, encoder_name="resnet10",
                encoder_depth=5, decoder_channels=(256, 128, 64, 32, 16))
    xs, ys = jnp.asarray(x), jnp.asarray(y)

    def loss_fn(p):
        logits = ours.apply({"params": p, "batch_stats": stats},
                            xs, False)[-1]
        import optax
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, 2), ys.reshape(-1)).mean()

    lval, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(lval), float(loss.detach()), rtol=1e-5)
    flat_ref = jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    flat_got = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
    assert len(flat_ref) == len(flat_got) and len(flat_ref) > 60
    for path, ref_leaf in flat_ref:
        got_leaf = flat_got[path]
        np.testing.assert_allclose(
            np.asarray(got_leaf), np.asarray(ref_leaf), rtol=2e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))
