"""Supernet forward parity: our naive-path SenasSearch vs the torch
reference search net, on identical weights and identical (softmaxed)
architecture parameters.

Combined with tests/test_fused_cell.py (fused == naive), this pins the
ENTIRE search compute path — stems, per-edge MixedOps over all 6 candidate
branches, beta-scaled node sums, gamma-mixed dense skips, head — to the
reference semantics.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from senas_tpu.core.genotype import DownOps, NormOps, UpOps
from senas_tpu.search.supernet import (SenasSearch, init_arch_params,
                                       normalize_arch)
from test_model_parity import _RefTree, _conv, _dense, _tconv

pytestmark = [pytest.mark.slow, pytest.mark.parity]

META, DEPTH, C, HW = 2, 3, 8, 16


@pytest.fixture(scope="module")
def ref_search_mod():
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
    saved = sys.path[:]
    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_search", "/root/reference/search/senas_search.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path[:] = saved


def _dw_tconv(w):
    """Depthwise ConvTranspose2d (C, 1, kH, kW) -> our grouped-transpose
    HWIO layout (kH, kW, 1, C), spatially flipped."""
    return jnp.asarray(
        np.flip(w.numpy(), axis=(2, 3)).transpose(2, 3, 1, 0).copy())


def _translate_branch(ref, name, transpose):
    """One candidate branch of a MixedOp (reference OPS layouts,
    utils/operations.py:8-21, dropout=0) -> our naive branch variables."""
    conv_fn = _tconv if transpose else _conv
    if name in ("none", "identity", "avg_pool", "max_pool", "up_sample"):
        bn_p, bn_s = ref.bn("norm")
        p = {"BatchNorm_0": bn_p}
        if ref.has("conv.weight"):
            p["kernel"] = _conv(ref.t("conv.weight"))
        return p, {"BatchNorm_0": bn_s}
    if name in ("conv_3", "dil_3_conv_5", "dil_2_conv_5"):
        bn_p, bn_s = ref.bn("1")
        return ({"_ConvWeight_0": {"kernel": conv_fn(ref.t("0.weight"))},
                 "BatchNorm_0": bn_p},
                {"BatchNorm_0": bn_s})
    if name == "se_conv_3":
        bn_p, bn_s = ref.bn("1")
        return ({"ConvBn_0": {
                    "_ConvWeight_0": {"kernel": conv_fn(ref.t("0.weight"))},
                    "BatchNorm_0": bn_p},
                 "SEBlock_0": {
                    "Dense_0": {"kernel": _dense(ref.t("2.excitation.0.weight"))},
                    "Dense_1": {"kernel": _dense(ref.t("2.excitation.2.weight"))}}},
                {"ConvBn_0": {"BatchNorm_0": bn_s}})
    if name in ("dep_sep_conv_3", "dep_sep_conv_5"):
        dbn_p, dbn_s = ref.bn("1")
        pbn_p, pbn_s = ref.bn("4")
        depth_fn = _dw_tconv if transpose else _conv
        return ({"depth": {"kernel": depth_fn(ref.t("0.weight"))},
                 "depth_norm": dbn_p,
                 "point": {"kernel": _conv(ref.t("3.weight"))},
                 "point_norm": pbn_p},
                {"depth_norm": dbn_s, "point_norm": pbn_s})
    raise NotImplementedError(name)


def _edge_optype(cell_type, edge_idx, meta):
    """Edge -> candidate-op vocabulary (search/cell.py:76-90)."""
    offsets = [sum(2 + i for i in range(n)) for n in range(meta)]
    for off in offsets:
        if edge_idx == off + 0:
            return ("down", DownOps, False) if cell_type == "down" \
                else ("norm", NormOps, False)
        if edge_idx == off + 1:
            return ("down", DownOps, False) if cell_type == "down" \
                else ("up", UpOps, True)
    return ("norm", NormOps, False)


def _translate_search_cell(ref, cell_type, meta):
    params, stats = {}, {}
    if cell_type == "down":
        bn_p, bn_s = ref.bn("preprocess0.2")
        p = {"BatchNorm_0": bn_p}
        if ref.has("preprocess0.1.weight"):
            p["kernel"] = _conv(ref.t("preprocess0.1.weight"))
        params["preprocess0"], stats["preprocess0"] = p, {"BatchNorm_0": bn_s}
    else:
        bn_p, bn_s = ref.bn("preprocess0.norm")
        params["preprocess0"] = {
            "kernel": _conv(ref.t("preprocess0.conv.weight")),
            "BatchNorm_0": bn_p}
        stats["preprocess0"] = {"BatchNorm_0": bn_s}
    n_edges = sum(2 + i for i in range(meta))
    for e in range(n_edges):
        _, ops, transpose = _edge_optype(cell_type, e, meta)
        ep, es = {}, {}
        for bi, bname in enumerate(ops):
            bp, bs = _translate_branch(ref.sub(f"_ops.{e}._ops.{bi}"),
                                       bname, transpose)
            ep[f"branch_{bi}_{bname}"] = bp
            es[f"branch_{bi}_{bname}"] = bs
        params[f"edge_{e}"], stats[f"edge_{e}"] = ep, es
    bn_p, bn_s = ref.bn("post_process.norm")
    params["post_process"] = {"kernel": _conv(ref.t("post_process.conv.weight")),
                              "BatchNorm_0": bn_p}
    stats["post_process"] = {"BatchNorm_0": bn_s}
    return params, stats


def _translate_search(sd, depth, meta):
    ref = _RefTree(sd)
    params, stats = {}, {}
    bn_p, bn_s = ref.bn("stem0.1")
    params["stem0"] = {"_ConvWeight_0": {"kernel": _conv(ref.t("stem0.0.weight"))},
                       "BatchNorm_0": bn_p}
    stats["stem0"] = {"BatchNorm_0": bn_s}
    blk = ref.sub("stem1.2")
    bn1_p, bn1_s = blk.bn("bn1")
    bn2_p, bn2_s = blk.bn("bn2")
    params["stem1_block"] = {"conv1": _conv(blk.t("conv1.weight")),
                             "conv2": _conv(blk.t("conv2.weight")),
                             "bn1": bn1_p, "bn2": bn2_p}
    stats["stem1_block"] = {"bn1": bn1_s, "bn2": bn2_s}
    for j in range(1, depth):
        p, s = _translate_search_cell(ref.sub(f"blocks.0.{j}"), "down", meta)
        params[f"down_{j}"], stats[f"down_{j}"] = p, s
    for i in range(1, depth):
        for j in range(depth - i):
            p, s = _translate_search_cell(ref.sub(f"blocks.{i}.{j}"), "up", meta)
            params[f"up_{i}_{j}"], stats[f"up_{i}_{j}"] = p, s
    hp, hs = _translate_search_cell(ref.sub("head_block.0.up_cell"), "up", meta)
    params["head"] = {"up_cell": hp, "segmentation_head": {
        "_ConvWeight_0": {"kernel": _conv(
            ref.t("head_block.0.segmentation_head.1.weight"))}}}
    stats["head"] = {"up_cell": hs}
    return {"params": params, "batch_stats": stats}


def test_supernet_forward_matches_reference(ref_search_mod):
    torch.manual_seed(0)
    ref_net = ref_search_mod.SenasSearch(1, C, 2, DEPTH, meta_node_num=META,
                                         double_down_channel=False,
                                         supervision=False)
    ref_net.eval()
    with torch.no_grad():
        for name, buf in ref_net.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.2)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)

    ours = SenasSearch(in_channels=1, c=C, nclass=2, depth=DEPTH,
                       meta_node_num=META, fused=False)
    variables = _translate_search(ref_net.state_dict(), DEPTH, META)

    arch = init_arch_params(jax.random.PRNGKey(3), META, DEPTH,
                            use_sharing=False)
    # scale up so the softmaxes are far from uniform
    arch = jax.tree.map(lambda a: a * 300.0, arch)
    aw = normalize_arch(arch, META, beta_mode="reference")

    rs = np.random.RandomState(0)
    x = rs.randn(2, HW, HW, 1).astype(np.float32)
    with torch.no_grad():
        theirs = ref_net(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))),
            torch.tensor(np.asarray(aw["alphas_dn_nm"])),
            torch.tensor(np.asarray(aw["alphas_up_nm"])),
            torch.tensor(np.asarray(aw["alphas_dn"])),
            torch.tensor(np.asarray(aw["alphas_up"])),
            torch.tensor(np.asarray(aw["betas_dn"])),
            torch.tensor(np.asarray(aw["betas_up"])),
            torch.tensor(np.asarray(aw["gamma"])),
        )[-1]
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))

    out = ours.apply(variables, jnp.asarray(x), aw, False)[-1]
    np.testing.assert_allclose(np.asarray(out), theirs, rtol=2e-4, atol=2e-5)


def test_arch_gradients_match_reference(ref_search_mod):
    """Bilevel-search parity: d(loss)/d(raw arch params) — through the
    softmax normalization (overlapping-beta reference mode), the supernet,
    and the dice_ce loss — matches the reference's first-order DARTS
    gradients (Architecture.step, senas_search.py:289-303)."""
    from senas_tpu.train.loss import build_loss

    torch.manual_seed(0)
    ref_nas = ref_search_mod.NAS(
        1, C, 2, DEPTH, meta_node_num=META, use_sharing=False,
        double_down_channel=False, supervision=False, multi_gpus=False,
        device=torch.device("cpu"))
    ref_nas.eval()

    arch = init_arch_params(jax.random.PRNGKey(7), META, DEPTH,
                            use_sharing=False)
    arch = jax.tree.map(lambda a: a * 50.0, arch)
    name_map = {"alphas_dn": "alphas_dn", "alphas_up": "alphas_up",
                "alphas_dn_nm": "alphas_dn_nm", "alphas_up_nm": "alphas_up_nm",
                "betas_dn": "betas_dn", "betas_up": "betas_up",
                "gamma": "gamma"}
    with torch.no_grad():
        for ours_name, ref_name in name_map.items():
            getattr(ref_nas, ref_name).copy_(
                torch.tensor(np.asarray(arch[ours_name])))

    ours_net = SenasSearch(in_channels=1, c=C, nclass=2, depth=DEPTH,
                           meta_node_num=META, fused=False)
    sd = {k[len("net."):]: v for k, v in ref_nas.state_dict().items()
          if k.startswith("net.")}
    variables = _translate_search(sd, DEPTH, META)

    rs = np.random.RandomState(2)
    x = rs.randn(2, HW, HW, 1).astype(np.float32)
    label = rs.randint(0, 2, (2, HW, HW))

    sys.path.insert(0, "/root/reference")
    try:
        from utils.loss.loss import SegmentationLosses
    finally:
        sys.path.pop(0)
    crit = SegmentationLosses(name="dice_ce")
    out_t = ref_nas(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    loss_t = crit(out_t, torch.tensor(label, dtype=torch.long))
    loss_t.backward()

    loss_fn = build_loss("dice_ce")

    def loss_of(raw_arch):
        aw = normalize_arch(raw_arch, META, beta_mode="reference")
        outs = ours_net.apply(variables, jnp.asarray(x), aw, False)
        return loss_fn(outs, jnp.asarray(label.astype(np.int32)))

    loss_j, grads = jax.value_and_grad(loss_of)(arch)
    np.testing.assert_allclose(float(loss_j), float(loss_t.item()), rtol=1e-5)
    for ours_name, ref_name in name_map.items():
        g_ref = getattr(ref_nas, ref_name).grad
        g_ref = (np.zeros(arch[ours_name].shape, np.float32)
                 if g_ref is None else g_ref.numpy())
        np.testing.assert_allclose(np.asarray(grads[ours_name]), g_ref,
                                   rtol=5e-3, atol=1e-6, err_msg=ours_name)
