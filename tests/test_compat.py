"""senas_tpu.compat: torch-reference checkpoint import.

Round-trips real reference networks through the public import API:
build the torch model, wrap its state_dict in the reference's checkpoint
format (train_model.py:220-233 / search_arc.py:227-238), import, and
require identical eval-mode outputs from our Flax models — including the
naive->fused supernet layout inversion the production search path uses.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from senas_tpu.compat import (classify_checkpoint, import_fixed_checkpoint,
                              import_search_checkpoint, set_encoder_variables,
                              translate_arch_params, translate_resnet_encoder)
from senas_tpu.models import geno_searched
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.search.supernet import SenasSearch, normalize_arch

pytestmark = [pytest.mark.slow, pytest.mark.parity]


def _stub_ref_env():
    def stub(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    stub("graphviz", Digraph=object)
    tvu = stub("torchvision.utils", make_grid=lambda *a, **k: None)
    tvt = stub("torchvision.transforms", ToPILImage=object, Compose=object)
    stub("torchvision", utils=tvu, transforms=tvt)
    stub("pynvml")
    stub("ptflops", get_model_complexity_info=lambda *a, **k: (0, 0))
    stub("torchstat", stat=lambda *a, **k: None)
    stub("adabound", AdaBound=object)
    stub("tensorboardX", SummaryWriter=object)


def _load_ref(path, name):
    _stub_ref_env()
    saved = sys.path[:]
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path[:] = saved


@pytest.fixture(scope="module")
def ref_model_mod():
    return _load_ref("/root/reference/models/senas_model.py", "cref_model")


@pytest.fixture(scope="module")
def ref_search_mod():
    return _load_ref("/root/reference/search/senas_search.py", "cref_search")


def _randomize_bn(net):
    with torch.no_grad():
        for name, buf in net.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.2)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)


def test_import_fixed_checkpoint_roundtrip(ref_model_mod):
    genotype = geno_searched.senas_node_4
    depth, c, hw = 3, 8, 32

    from utils.genotype import Genotype  # reference namedtuple (stubbed env)
    ref_geno = eval(repr(genotype), {"Genotype": Genotype, "range": range})
    torch.manual_seed(0)
    ref_net = ref_model_mod.SenasModel(2, 1, c=c, depth=depth,
                                       supervision=False, genotype=ref_geno,
                                       double_down_channel=False)
    ref_net.eval()
    _randomize_bn(ref_net)

    ckpt = {"epoch": 7, "dur_time": 123.0, "model_state": ref_net.state_dict(),
            "model_optimizer": {}, "best_pixAcc": 91.0, "best_mIoU": 72.5,
            "best_dice_coeff": 80.25, "best_loss": 0.31}
    assert classify_checkpoint(ckpt) == "train"
    variables, meta = import_fixed_checkpoint(ckpt, genotype, depth)
    assert meta["epoch"] == 7 and meta["best_dice"] == 80.25
    assert meta["best_miou"] == 72.5

    rs = np.random.RandomState(0)
    x = rs.randn(2, hw, hw, 1).astype(np.float32)
    with torch.no_grad():
        theirs = ref_net(torch.tensor(np.transpose(x, (0, 3, 1, 2))))[-1]
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))

    ours = SenasModel(nclass=2, in_channels=1, c=c, depth=depth,
                      genotype=genotype)
    out = ours.apply(jax.tree.map(jnp.asarray, variables),
                     jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), theirs, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("use_sharing", [True, False])
@pytest.mark.parametrize("fused", [True, False])
def test_import_search_checkpoint_roundtrip(ref_search_mod, fused,
                                            use_sharing):
    meta_nodes, depth, c, hw = 2, 3, 8, 16
    torch.manual_seed(0)
    ref_nas = ref_search_mod.NAS(1, c, 2, depth, meta_node_num=meta_nodes,
                                 use_sharing=use_sharing,
                                 double_down_channel=False, supervision=False,
                                 device=torch.device("cpu"))
    ref_nas.eval()
    _randomize_bn(ref_nas)
    # non-trivial arch tables so the softmaxes are far from uniform
    with torch.no_grad():
        for p in ref_nas._arch_parameters:
            p.mul_(300.0)

    ckpt = {"epoch": 3, "dur_time": 55.0, "cur_patience": 2,
            "geno_type": "genotype-string-here",
            "model_state": ref_nas.state_dict(),
            "arch_optimizer": {}, "model_optimizer": {},
            "alphas_dict": ref_nas.alphas_dict(),
            "betas_dict": ref_nas.betas_dict(), "scheduler": {}}
    assert classify_checkpoint(ckpt) == "search"
    variables, arch, meta = import_search_checkpoint(
        ckpt, depth, meta_nodes, fused=fused)
    assert meta["epoch"] == 3 and meta["cur_patience"] == 2
    # sharing auto-detection: shared tables collapse to one
    assert ("alphas_up_nm" in arch) == (not use_sharing)

    rs = np.random.RandomState(1)
    x = rs.randn(2, hw, hw, 1).astype(np.float32)
    with torch.no_grad():
        theirs = ref_nas(torch.tensor(np.transpose(x, (0, 3, 1, 2))))[-1]
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))

    ours = SenasSearch(in_channels=1, c=c, nclass=2, depth=depth,
                       meta_node_num=meta_nodes, fused=fused)
    aw = normalize_arch(jax.tree.map(jnp.asarray, arch), meta_nodes,
                        beta_mode="reference")
    out = ours.apply(jax.tree.map(jnp.asarray, variables),
                     jnp.asarray(x), aw, False)[-1]
    np.testing.assert_allclose(np.asarray(out), theirs, rtol=5e-4, atol=5e-5)


def test_translate_arch_params_explicit_override(ref_search_mod):
    torch.manual_seed(1)
    ref_nas = ref_search_mod.NAS(1, 4, 2, 3, meta_node_num=2,
                                 use_sharing=True, double_down_channel=False,
                                 supervision=False,
                                 device=torch.device("cpu"))
    sd = ref_nas.state_dict()
    auto = translate_arch_params(sd)
    assert "alphas_up_nm" not in auto  # identical tables -> shared
    forced = translate_arch_params(sd, use_sharing=False)
    assert "alphas_up_nm" in forced
    np.testing.assert_array_equal(forced["alphas_dn_nm"],
                                  forced["alphas_up_nm"])


def test_encoder_import_and_graft():
    from test_zoo_parity import _ResNet10Encoder

    from senas_tpu.models.encoders import get_encoder
    from senas_tpu.models.zoo import Unet

    torch.manual_seed(0)
    enc_t = _ResNet10Encoder()
    enc_t.eval()
    _randomize_bn(enc_t)
    enc_vars = translate_resnet_encoder(enc_t.state_dict())

    rs = np.random.RandomState(0)
    x = rs.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        feats_t = enc_t(torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    enc = get_encoder("resnet10", 5)
    feats = enc.apply(jax.tree.map(jnp.asarray, enc_vars), jnp.asarray(x),
                      False)
    assert len(feats) == len(feats_t)
    for ours_f, theirs_f in zip(feats[1:], feats_t[1:]):
        np.testing.assert_allclose(
            np.asarray(ours_f),
            np.transpose(theirs_f.numpy(), (0, 2, 3, 1)),
            rtol=2e-4, atol=2e-5)

    # graft into a zoo model: the encoder subtree is replaced verbatim
    model = Unet(classes=2, in_channels=3)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3), jnp.float32), False)
    grafted = set_encoder_variables(variables, enc_vars)
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["encoder"]["conv1"]),
        enc_vars["params"]["conv1"])
    out = model.apply(grafted, jnp.asarray(x), False)[-1]
    assert out.shape == (2, 64, 64, 2)

    # shape mismatches must be rejected, not silently grafted
    bad = jax.tree.map(lambda a: a, enc_vars)
    bad["params"]["conv1"] = np.zeros((3, 3, 3, 64), np.float32)
    with pytest.raises(ValueError):
        set_encoder_variables(variables, bad)
