"""Fused (grouped) search cell == naive per-edge reference semantics.

Strategy: initialize the fused module, mechanically translate its grouped
parameters into the naive modules' per-edge parameter trees, and require
allclose outputs in both train and eval modes. This pins the grouped conv /
depthwise-multiplier / grouped-BN / SE-einsum layouts to the reference math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from senas_tpu.ops.primitives import OpType
from senas_tpu.search.cell import MixedOp, SearchCell
from senas_tpu.search.fused_cell import FusedSearchCell, GroupedMixedOp
from senas_tpu.search.supernet import init_arch_params, normalize_arch


def _bn(scale, bias, mean=None, var=None):
    p = {"scale": scale, "bias": bias}
    s = None
    if mean is not None:
        s = {"mean": mean, "var": var}
    return p, s


def translate_grouped_to_mixedop(gp, gs, e, E, op_type, C, P):
    """Slice edge e out of GroupedMixedOp params/batch_stats into a naive
    MixedOp variables dict."""
    params, stats = {}, {}
    sl = slice(e * P, (e + 1) * P)
    for i, name in enumerate(op_type.value["ops"]):
        key = f"branch_{i}_{name}"
        if name in ("avg_pool", "max_pool", "up_sample", "identity", "none"):
            p = {}
            if f"{name}_kernel" in gp:
                p["kernel"] = gp[f"{name}_kernel"][..., sl]
            elif name == "none" and C != P:
                # grouped path skips the conv on zeros; naive still owns a
                # (mathematically irrelevant) 1x1 kernel — zero it
                p["kernel"] = jnp.zeros((1, 1, C, P), jnp.float32)
            p["BatchNorm_0"] = {"scale": gp[f"{name}_bn"]["scale"][sl],
                                "bias": gp[f"{name}_bn"]["bias"][sl]}
            s = {"BatchNorm_0": {"mean": gs[f"{name}_bn"]["mean"][sl],
                                 "var": gs[f"{name}_bn"]["var"][sl]}}
            params[key], stats[key] = p, s
        elif name in ("conv_3", "dil_3_conv_5", "dil_2_conv_5"):
            params[key] = {
                "_ConvWeight_0": {"kernel": gp[f"{name}_kernel"][..., sl]},
                "BatchNorm_0": {"scale": gp[f"{name}_bn"]["scale"][sl],
                                "bias": gp[f"{name}_bn"]["bias"][sl]},
            }
            stats[key] = {"BatchNorm_0": {"mean": gs[f"{name}_bn"]["mean"][sl],
                                          "var": gs[f"{name}_bn"]["var"][sl]}}
        elif name == "se_conv_3":
            params[key] = {
                "ConvBn_0": {
                    "_ConvWeight_0": {"kernel": gp[f"{name}_kernel"][..., sl]},
                    "BatchNorm_0": {"scale": gp[f"{name}_bn"]["scale"][sl],
                                    "bias": gp[f"{name}_bn"]["bias"][sl]},
                },
                "SEBlock_0": {"Dense_0": {"kernel": gp[f"{name}_se1"][e]},
                              "Dense_1": {"kernel": gp[f"{name}_se2"][e]}},
            }
            stats[key] = {"ConvBn_0": {
                "BatchNorm_0": {"mean": gs[f"{name}_bn"]["mean"][sl],
                                "var": gs[f"{name}_bn"]["var"][sl]}}}
        elif name in ("dep_sep_conv_3", "dep_sep_conv_5"):
            idx = np.arange(C) * E + e  # depthwise channel c, multiplier e
            params[key] = {
                "depth": {"kernel": gp[f"{name}_dkernel"][..., idx]},
                "depth_norm": {"scale": gp[f"{name}_dbn"]["scale"][idx],
                               "bias": gp[f"{name}_dbn"]["bias"][idx]},
                "point": {"kernel": gp[f"{name}_pkernel"][e][None, None]},
                "point_norm": {"scale": gp[f"{name}_pbn"]["scale"][sl],
                               "bias": gp[f"{name}_pbn"]["bias"][sl]},
            }
            stats[key] = {
                "depth_norm": {"mean": gs[f"{name}_dbn"]["mean"][idx],
                               "var": gs[f"{name}_dbn"]["var"][idx]},
                "point_norm": {"mean": gs[f"{name}_pbn"]["mean"][sl],
                               "var": gs[f"{name}_pbn"]["var"][sl]},
            }
        else:
            raise AssertionError(name)
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("op_type,C,P,hw", [
    (OpType.DOWN, 12, 4, 16),
    (OpType.UP, 12, 4, 8),
    (OpType.NORM, 4, 4, 8),   # identity path without adapter conv (C==P)
    (OpType.NORM, 12, 4, 8),  # identity path with adapter conv
])
def test_grouped_equals_naive(op_type, C, P, hw):
    E = 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, hw, hw, C).astype(np.float32))
    alphas = jnp.asarray(rng.rand(E, 6).astype(np.float32))

    grouped = GroupedMixedOp(C, P, E, op_type)
    gv = grouped.init({"params": jax.random.PRNGKey(0)}, x, alphas, False)
    gp, gs = gv["params"], gv["batch_stats"]

    for train in [False, True]:
        out_g = grouped.apply(gv, x, alphas, train,
                              mutable=["batch_stats"] if train else False)
        if train:
            out_g = out_g[0]
        for e in range(E):
            naive = MixedOp(C, P, op_type)
            nv = translate_grouped_to_mixedop(gp, gs, e, E, op_type, C, P)
            out_n = naive.apply(nv, x, alphas[e], alphas[e], train,
                                mutable=["batch_stats"] if train else False)
            if train:
                out_n = out_n[0]
            np.testing.assert_allclose(np.asarray(out_g[..., e, :]),
                                       np.asarray(out_n), rtol=2e-4, atol=2e-5)


def _translate_cell(fused_vars, M, C, P, cell_type):
    """FusedSearchCell variables -> SearchCell variables."""
    fp, fs = fused_vars["params"], fused_vars["batch_stats"]
    params = {"preprocess0": fp["preprocess0"], "post_process": fp["post_process"]}
    stats = {"preprocess0": fs["preprocess0"], "post_process": fs["post_process"]}
    t0 = OpType.DOWN if cell_type == "down" else OpType.NORM
    t1 = OpType.DOWN if cell_type == "down" else OpType.UP
    offsets = [sum(2 + i for i in range(n)) for n in range(M)]
    for n in range(M):
        for (gkey, tt, j) in [("group0", t0, 0), ("group1", t1, 1)]:
            v = translate_grouped_to_mixedop(fp[gkey], fs[gkey], n, M, tt, C, P)
            params[f"edge_{offsets[n] + j}"] = v["params"]
            stats[f"edge_{offsets[n] + j}"] = v["batch_stats"]
        if n >= 1:
            inner_p, inner_s = fp[f"inner_{n}"], fs[f"inner_{n}"]
            for j in range(n):
                params[f"edge_{offsets[n] + 2 + j}"] = jax.tree.map(
                    lambda a: a[j], inner_p)
                stats[f"edge_{offsets[n] + 2 + j}"] = jax.tree.map(
                    lambda a: a[j], inner_s)
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("cell_type", ["down", "up"])
def test_fused_cell_equals_naive_cell(cell_type):
    M, C, c_out = 3, 8, 8
    P = c_out // 4  # = 2
    rng = np.random.RandomState(1)
    if cell_type == "down":
        in0 = jnp.asarray(rng.randn(2, 16, 16, C).astype(np.float32))
        in1 = jnp.asarray(rng.randn(2, 8, 8, C).astype(np.float32))
    else:
        in0 = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
        in1 = jnp.asarray(rng.randn(2, 8, 8, C).astype(np.float32))
    k = 9
    wn = jnp.asarray(rng.rand(k, 6).astype(np.float32))
    wc = jnp.asarray(rng.rand(k, 6).astype(np.float32))
    betas = jnp.asarray(rng.rand(k).astype(np.float32))

    fused = FusedSearchCell(M, 1, in0.shape[-1], C, c_out, cell_type)
    fv = fused.init({"params": jax.random.PRNGKey(0)}, in0, in1, wn, wc, betas, False)
    naive = SearchCell(M, 1, in0.shape[-1], C, c_out, cell_type)
    nv = _translate_cell(fv, M, C, P, cell_type)

    for train in [False, True]:
        mut = ["batch_stats"] if train else False
        out_f = fused.apply(fv, in0, in1, wn, wc, betas, train, mutable=mut)
        out_n = naive.apply(nv, in0, in1, wn, wc, betas, train, mutable=mut)
        if train:
            out_f, out_n = out_f[0], out_n[0]
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("dilated", [False, True])
@pytest.mark.parametrize("cell_type", ["down", "up"])
def test_merged_conv_path_equals_unmerged(cell_type, dilated, monkeypatch):
    """The trace-time branch-conv merging (measured perf negative, kept
    implemented) must be numerically identical to the per-branch path —
    same params, same outputs in train and eval modes."""
    from senas_tpu.search import fused_cell as fc

    M, C, c_out = 3, 8, 8
    rng = np.random.RandomState(4)
    if cell_type == "down":
        in0 = jnp.asarray(rng.randn(2, 16, 16, C).astype(np.float32))
    else:
        in0 = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
    in1 = jnp.asarray(rng.randn(2, 8, 8, C).astype(np.float32))
    k = 9
    wn = jnp.asarray(rng.rand(k, 6).astype(np.float32))
    wc = jnp.asarray(rng.rand(k, 6).astype(np.float32))
    betas = jnp.asarray(rng.rand(k).astype(np.float32))

    cell = FusedSearchCell(M, 1, in0.shape[-1], C, c_out, cell_type)
    variables = cell.init({"params": jax.random.PRNGKey(2)}, in0, in1, wn, wc,
                          betas, False)

    monkeypatch.setattr(fc, "MERGE_GROUP_CONVS", False)
    base_eval = cell.apply(variables, in0, in1, wn, wc, betas, False)
    base_train, base_mut = cell.apply(variables, in0, in1, wn, wc, betas,
                                      True, mutable=["batch_stats"])

    monkeypatch.setattr(fc, "MERGE_GROUP_CONVS", True)
    monkeypatch.setattr(fc, "MERGE_DILATED", dilated)
    got_eval = cell.apply(variables, in0, in1, wn, wc, betas, False)
    got_train, got_mut = cell.apply(variables, in0, in1, wn, wc, betas,
                                    True, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(got_eval), np.asarray(base_eval),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_train), np.asarray(base_train),
                               rtol=1e-5, atol=1e-6)
    for (pa, a), b in zip(
            jax.tree_util.tree_flatten_with_path(got_mut)[0],
            jax.tree.leaves(base_mut)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))
