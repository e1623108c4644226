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
