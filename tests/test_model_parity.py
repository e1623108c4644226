"""Full-model logits parity: our SenasModel vs the PyTorch reference.

The strongest parity artifact available without datasets: build the
reference models/senas_model.py network, translate its randomly-initialized
state_dict into our Flax variable tree (NCHW->NHWC conv transposes, the
ConvTranspose2d spatial flip, BN weight/bias -> scale/bias, SE Linear
transposes), and require identical eval-mode logits on identical inputs.
This pins the entire wiring — stems, cell compilation from the genotype,
gamma pruning, dense-skip concatenation order, head — not just the ops.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from senas_tpu.models import geno_searched
from senas_tpu.models.senas_model import SenasModel

pytestmark = [pytest.mark.slow, pytest.mark.parity]


@pytest.fixture(scope="module")
def ref_mod():
    """Import the reference senas_model with its third-party imports stubbed."""
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
            "ref_senas_model", "/root/reference/models/senas_model.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path[:] = saved


# ---------------------------------------------------------------------------
# weight translation: torch layouts -> ours
# ---------------------------------------------------------------------------

def _conv(w):
    """Conv2d (O, I, kH, kW) -> HWIO."""
    return jnp.asarray(np.transpose(w.numpy(), (2, 3, 1, 0)))


def _tconv(w):
    """ConvTranspose2d (I, O, kH, kW): torch correlates the spatially
    FLIPPED kernel with in/out swapped; ours is an unflipped lhs-dilated
    correlation, so flip + transpose to HWIO."""
    return jnp.asarray(np.flip(w.numpy(), axis=(2, 3)).transpose(2, 3, 0, 1).copy())


def _dense(w):
    """Linear (O, I) -> flax Dense kernel (I, O)."""
    return jnp.asarray(w.numpy().T)


class _RefTree:
    """Dotted-key accessor over a torch state_dict."""

    def __init__(self, sd, prefix=""):
        self.sd = sd
        self.prefix = prefix

    def sub(self, name):
        return _RefTree(self.sd, f"{self.prefix}{name}.")

    def t(self, name):
        return self.sd[self.prefix + name]

    def has(self, name):
        return (self.prefix + name) in self.sd

    def bn(self, name):
        """-> (params {scale, bias}, stats {mean, var})"""
        p = {"scale": jnp.asarray(self.t(f"{name}.weight").numpy()),
             "bias": jnp.asarray(self.t(f"{name}.bias").numpy())}
        s = {"mean": jnp.asarray(self.t(f"{name}.running_mean").numpy()),
             "var": jnp.asarray(self.t(f"{name}.running_var").numpy())}
        return p, s


def _translate_op(ref, op_name, transpose):
    """One chosen candidate op: reference Sequential/AdapterBlock layouts
    (utils/operations.py:81-183, dropout=0) -> our op module variables."""
    conv_fn = _tconv if transpose else _conv
    if op_name in ("conv_3", "dil_3_conv_5", "dil_2_conv_5"):
        bn_p, bn_s = ref.bn("1")
        return ({"_ConvWeight_0": {"kernel": conv_fn(ref.t("0.weight"))},
                 "BatchNorm_0": bn_p},
                {"BatchNorm_0": bn_s})
    if op_name == "se_conv_3":
        bn_p, bn_s = ref.bn("1")
        return ({"ConvBn_0": {
                    "_ConvWeight_0": {"kernel": conv_fn(ref.t("0.weight"))},
                    "BatchNorm_0": bn_p},
                 "SEBlock_0": {
                    "Dense_0": {"kernel": _dense(ref.t("2.excitation.0.weight"))},
                    "Dense_1": {"kernel": _dense(ref.t("2.excitation.2.weight"))}}},
                {"ConvBn_0": {"BatchNorm_0": bn_s}})
    if op_name in ("dep_sep_conv_3", "dep_sep_conv_5"):
        dbn_p, dbn_s = ref.bn("1")
        pbn_p, pbn_s = ref.bn("4")
        return ({"depth": {"kernel": conv_fn(ref.t("0.weight"))},
                 "depth_norm": dbn_p,
                 "point": {"kernel": _conv(ref.t("3.weight"))},
                 "point_norm": pbn_p},
                {"depth_norm": dbn_s, "point_norm": pbn_s})
    if op_name in ("avg_pool", "max_pool", "up_sample", "identity", "none"):
        bn_p, bn_s = ref.bn("norm")
        p = {"BatchNorm_0": bn_p}
        if ref.has("conv.weight"):
            p["kernel"] = _conv(ref.t("conv.weight"))
        return p, {"BatchNorm_0": bn_s}
    raise NotImplementedError(op_name)


def _translate_cell(ref, gene, cell_type):
    """BuildCell: preprocess0, the 2*meta chosen ops, post_process."""
    params, stats = {}, {}
    # preprocess0: down = build_rectify Sequential(act, resample, norm);
    # up = ShrinkBlock(conv/norm attrs)
    if cell_type == "down":
        bn_p, bn_s = ref.bn("preprocess0.2")
        p = {"BatchNorm_0": bn_p}
        if ref.has("preprocess0.1.weight"):
            p["kernel"] = _conv(ref.t("preprocess0.1.weight"))
        params["preprocess0"], stats["preprocess0"] = p, {"BatchNorm_0": bn_s}
    else:
        bn_p, bn_s = ref.bn("preprocess0.norm")
        params["preprocess0"] = {"kernel": _conv(ref.t("preprocess0.conv.weight")),
                                 "BatchNorm_0": bn_p}
        stats["preprocess0"] = {"BatchNorm_0": bn_s}
    for i, (op_name, inp) in enumerate(gene):
        # UP ops sit on the vertical input (idx 1) of up cells; they use
        # transpose convs — everything else is a plain conv
        transpose = cell_type == "up" and inp == 1
        p, s = _translate_op(ref.sub(f"_ops.{i}"), op_name, transpose)
        params[f"op_{i}"], stats[f"op_{i}"] = p, s
    bn_p, bn_s = ref.bn("post_process.norm")
    params["post_process"] = {"kernel": _conv(ref.t("post_process.conv.weight")),
                              "BatchNorm_0": bn_p}
    stats["post_process"] = {"BatchNorm_0": bn_s}
    return params, stats


def _translate_model(sd, genotype, depth):
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
        p, s = _translate_cell(ref.sub(f"blocks.0.{j}"), genotype.down, "down")
        params[f"down_{j}"], stats[f"down_{j}"] = p, s

    # up cells: same (i, j) naming on both sides; gamma-pruned cells are
    # absent from both trees — walk whatever the reference kept
    up_keys = sorted({k.split(".")[1] + "." + k.split(".")[2]
                      for k in sd if k.startswith("blocks.")
                      and not k.startswith("blocks.0.")})
    for ij in up_keys:
        i, j = ij.split(".")
        p, s = _translate_cell(ref.sub(f"blocks.{i}.{j}"), genotype.up, "up")
        params[f"up_{i}_{j}"], stats[f"up_{i}_{j}"] = p, s

    hp, hs = _translate_cell(ref.sub("head_block.0.up_cell"), genotype.up, "up")
    params["head"] = {
        "up_cell": hp,
        "segmentation_head": {"_ConvWeight_0": {
            "kernel": _conv(ref.t("head_block.0.segmentation_head.1.weight"))}},
    }
    stats["head"] = {"up_cell": hs}
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("geno_name", ["senas_node_2", "senas_node_4"])
def test_senas_model_logits_match_reference(ref_mod, geno_name):
    genotype = getattr(geno_searched, geno_name)
    depth, c, hw = 3, 8, 32

    from utils.genotype import Genotype  # reference namedtuple (stubbed pkg)
    ref_geno = eval(repr(genotype), {"Genotype": Genotype, "range": range})
    torch.manual_seed(0)
    ref_net = ref_mod.SenasModel(2, 1, c=c, depth=depth, supervision=False,
                                 genotype=ref_geno, double_down_channel=False)
    ref_net.eval()
    # randomize BN stats so eval normalization is non-trivial
    with torch.no_grad():
        for name, buf in ref_net.named_buffers():
            if name.endswith("running_mean"):
                buf.normal_(0, 0.2)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)

    ours = SenasModel(nclass=2, in_channels=1, c=c, depth=depth,
                      genotype=genotype)
    variables = _translate_model(ref_net.state_dict(), genotype, depth)

    rs = np.random.RandomState(0)
    x = rs.randn(2, hw, hw, 1).astype(np.float32)
    with torch.no_grad():
        theirs = ref_net(torch.tensor(np.transpose(x, (0, 3, 1, 2))))[-1]
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))

    out = ours.apply(variables, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), theirs, rtol=1e-4, atol=1e-5)


def test_senas_model_grads_match_reference(ref_mod):
    """End-to-end TRAINING parity: identical dice_ce loss and identical
    d(loss)/d(params) through the whole net on identical weights + batch.
    torch grads are mapped through the same layout translators, so any
    stop-gradient / wiring / loss discrepancy shows up here."""
    from senas_tpu.train.loss import build_loss

    genotype = geno_searched.senas_node_2
    depth, c, hw = 3, 8, 16
    from utils.genotype import Genotype
    ref_geno = eval(repr(genotype), {"Genotype": Genotype, "range": range})
    torch.manual_seed(1)
    ref_net = ref_mod.SenasModel(2, 1, c=c, depth=depth, supervision=False,
                                 genotype=ref_geno, double_down_channel=False)
    ref_net.eval()  # eval-mode BN on both sides isolates the grad math

    ours = SenasModel(nclass=2, in_channels=1, c=c, depth=depth,
                      genotype=genotype)
    variables = _translate_model(ref_net.state_dict(), genotype, depth)

    rs = np.random.RandomState(1)
    x = rs.randn(2, hw, hw, 1).astype(np.float32)
    label = rs.randint(0, 2, (2, hw, hw))

    # --- torch side: reference dice_ce (utils/loss/loss.py) ---
    sys.path.insert(0, "/root/reference")
    try:
        from utils.loss.loss import SegmentationLosses
    finally:
        sys.path.pop(0)
    crit = SegmentationLosses(name="dice_ce")
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=False)
    out_t = ref_net(xt)
    loss_t = crit(out_t, torch.tensor(label, dtype=torch.long))
    loss_t.backward()

    # --- our side ---
    loss_fn = build_loss("dice_ce")

    def loss_of(params):
        outs = ours.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), False)
        return loss_fn(outs, jnp.asarray(label.astype(np.int32)))

    loss_j, grads = jax.value_and_grad(loss_of)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t.item()), rtol=1e-5)

    # translate torch grads through the SAME layout mapping and compare
    # state_dict(keep_vars=True) exposes grads under ALL alias names
    # (stem1 and blocks.0.0 share modules in the reference)
    grad_sd = {}
    for name, t in ref_net.state_dict(keep_vars=True).items():
        g = getattr(t, "grad", None)
        grad_sd[name] = (g if g is not None else torch.zeros_like(t)).detach()
    ref_grads = _translate_model(grad_sd, genotype, depth)["params"]

    flat_ours = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_ref = jax.tree.leaves(ref_grads)
    assert len(flat_ours) == len(flat_ref)
    for (path, g_ours), g_ref in zip(flat_ours, flat_ref):
        np.testing.assert_allclose(
            np.asarray(g_ours), np.asarray(g_ref), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))
