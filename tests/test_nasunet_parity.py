"""NasUnet differential parity vs the reference models/nasunet/.

The last model family without a torch differential test: build the
reference NasUnet (its own op vocabulary — cweight SE gates, GroupNorm,
weight_norm_act ConvOps ordering, interpolate-on-mismatch node merge,
nas_unet.py:8-139 / prim_ops_set.py), translate its weights into our Flax
tree, and require identical eval logits.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from senas_tpu.models.nasunet import NasUnet

pytestmark = [pytest.mark.slow, pytest.mark.parity]


@pytest.fixture(scope="module")
def ref_nasunet_mod():
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
    # namespace-package shim: models/nasunet has no __init__.py and its
    # sibling models/__init__.py pulls the whole smp/timm stack
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = ["/root/reference/models"]
    sys.modules["models"] = models_pkg
    saved = sys.path[:]
    sys.path.insert(0, "/root/reference")
    try:
        import models.nasunet.nas_unet as mod
        yield mod
    finally:
        sys.path[:] = saved


def _conv(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _tconv(w):
    return jnp.asarray(
        np.flip(w.detach().numpy(), axis=(2, 3)).transpose(2, 3, 0, 1).copy())


def _gn(mod):
    return {"scale": jnp.asarray(mod.weight.detach().numpy()),
            "bias": jnp.asarray(mod.bias.detach().numpy())}


def _convops(mod, transpose=False):
    p = {"conv": (_tconv if transpose else _conv)(mod.conv.weight)}
    if mod.norm is not None:
        p["GroupNorm_0"] = _gn(mod.norm)
    return p


def _dense(lin):
    return {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy())}


def _op_params(op, name):
    """One genotype op: ConvOps / CWeightOp / identity."""
    if name in ("identity", "none", "avg_pool", "max_pool"):
        return None
    if "cweight" in name:
        p = {"Dense_0": _dense(op.fc[0]), "Dense_1": _dense(op.fc[2])}
        if op.stride >= 2:
            p["conv"] = (_tconv if op.use_transpose else _conv)(op.conv.weight)
            p["GroupNorm_0"] = _gn(op.norm)
        return p
    return _convops(op, transpose=getattr(op, "use_transpose", False))


def _cell_params(ref_cell, names):
    p = {"preprocess0": _convops(ref_cell.preprocess0),
         "preprocess1": _convops(ref_cell.preprocess1)}
    for j, (op, nm) in enumerate(zip(ref_cell._ops, names)):
        op_p = _op_params(op, nm)
        if op_p is not None:
            p[f"op_{j}"] = op_p
    return p


def test_nasunet_matches_reference(ref_nasunet_mod):
    from senas_tpu.models.nasunet import NAS_UNET_V3

    nclass, in_ch, c, depth = 2, 1, 16, 3
    torch.manual_seed(0)
    ref = ref_nasunet_mod.NasUnet(nclass, in_ch, c=c, depth=depth,
                                  dropout_prob=0, double_down_channel=False)
    ref.eval()

    ours = NasUnet(nclass=nclass, in_channels=in_ch, c=c, depth=depth)
    down_names = [nm for nm, _ in NAS_UNET_V3.down]
    up_names = [nm for nm, _ in NAS_UNET_V3.up]

    params = {"stem0": _convops(ref.stem0), "stem1": _convops(ref.stem1)}
    for i, cell in enumerate(ref.down_cells):
        params[f"down_{i}"] = _cell_params(cell, down_names)
    for i, cell in enumerate(ref.up_cells):
        params[f"up_{i}"] = _cell_params(cell, up_names)
    params["head"] = {"conv": _conv(ref.nas_unet_head.conv.weight)}
    translated = {"params": params}

    rs = np.random.RandomState(0)
    x = rs.randn(2, 32, 32, in_ch).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))[-1]
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x), False)
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(translated)[0]}
    assert ref_paths == got_paths, (
        f"missing={sorted(ref_paths - got_paths)[:6]} "
        f"extra={sorted(got_paths - ref_paths)[:6]}")

    out = ours.apply(translated, jnp.asarray(x), False)[-1]
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)
