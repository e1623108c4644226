"""Pallas fused epilogue for GroupedMixedOp (VERDICT r2 #2c, kernel form).

The supernet search step spends ~56-63% of device time in thousands of small
elementwise/BN kernels around the branch convolutions (BASELINE.md profile).
At the flagship geometry every GroupedMixedOp branch tensor is [B, H, W, 24]
(E=3 edges x c_part=8): 24 channels against 128 VPU lanes, so XLA's C-minor
layouts waste >5x of every elementwise pass, and each branch pays its own
BN-stats reduction + BN apply + (SE) + the final stack/einsum mix.

This module fuses the ENTIRE post-conv epilogue of a group — per-branch
train-mode BatchNorm, the SE block of `se_conv_3`, and the alpha-weighted
branch mix (reference semantics: search/cell.py:32-43 weighted sum; BN per
utils/operations.py conv blocks) — into TWO Pallas kernels + tiny [B,C]-level
XLA glue, by exploiting that for every branch the whole epilogue is an
AFFINE map per (batch, channel):

    mixed[b,h,w,c] = sum_o x_o[b,h,w,c] * A_o[b,c] + K[b,c]

  * BN train mode:  y = (x - mu_c) * rsqrt(var_c + eps) * g_c + b_c
    -> per-channel affine once (mu, var) are known.  Eval mode is affine in
    the running stats directly (primitives.BatchNorm:80-94 semantics).
  * SE: the post-BN spatial mean m[b,c] is affine in the raw per-(b,c) mean,
    so the sigmoid-MLP scale s[b,c] folds into A/K.
  * 'none': BN(zeros) is a closed-form constant (no tensor read at all).
  * alpha mixing: a per-channel scale on each branch.

Pass 1 (stats kernel) computes per-(b, w, c) sums and sum-of-squares for all
branches in ONE sweep; glue folds them into batch stats / affines / SE scales
(all [C]- or [B,C]-sized math that XLA fuses into a couple of micro-kernels);
pass 2 (apply kernel) reads each branch tensor once more and emits the mixed
output. Both kernels view [B,H,W,C] as [B,H,W*C] — a free reshape (C minor)
that fills all 128 lanes regardless of channel count (flagship W*C = 3072 at
every resolution level).

Traffic: 2 reads + 1 write of each branch tensor vs the unfused path's
~4 reads + 2 writes, and ~25 XLA kernels per group collapse into 2 + glue.

The backward has the same affine structure and is TWO more Pallas kernels
inside one composite jax.custom_vjp (so no per-primitive dx partial-sums are
materialised): a reduce kernel for (dA, dK) = (sum_h g*x_o, sum_h g), then —
after autodiffing the glue to get the stats cotangents — a dx kernel
emitting  dx_o = g * A_o + ds1_o + 2 * x_o * ds2_o  in one pass.

Numerics note: batch variance uses E[x^2] - mu^2 in f32 (one-sweep), where
the module path uses the two-pass mean((x-mu)^2); equality holds to f32
rounding and is covered by tolerance tests (tests/test_grouped_epilogue.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5

# VMEM budget per grid step for the streamed blocks (double-buffered by
# Mosaic; ~16 MB/core total, leave headroom for accumulators + compiler).
_VMEM_BUDGET = 4 * 1024 * 1024


def _pick_h_tile(h: int, wc: int = 0, streams: int = 1,
                 bytes_per_el: int = 4) -> int:
    """Largest H tile that divides h and keeps the per-step streamed block
    footprint (streams tensors of [tile, wc]) under the VMEM budget.
    16 is the bf16 min sublane tile; smaller tiles only for tiny h."""
    for t in (128, 64, 32, 16, 8, 4, 2, 1):
        if h % t:
            continue
        if t > 16 and wc and t * wc * bytes_per_el * streams > _VMEM_BUDGET:
            continue
        return t
    return 1


# ---------------------------------------------------------------------------
# Pass 1 (fwd): per-(b, w*c) sum / sumsq for N branch tensors in one sweep
# ---------------------------------------------------------------------------


def _stats_kernel(*refs):
    n = len(refs) // 3
    in_refs = refs[:n]
    s1_refs = refs[n:2 * n]
    s2_refs = refs[2 * n:3 * n]
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        for s1, s2 in zip(s1_refs, s2_refs):
            s1[...] = jnp.zeros_like(s1)
            s2[...] = jnp.zeros_like(s2)

    for x, s1, s2 in zip(in_refs, s1_refs, s2_refs):
        xb = x[0].astype(jnp.float32)          # [h_tile, W*C]
        s1[0, 0, :] += jnp.sum(xb, axis=0)
        s2[0, 0, :] += jnp.sum(xb * xb, axis=0)


# Mosaic tiling note (bug found on the first real-chip run; interpret mode
# never catches it): a [B, WC] array with block (1, wc) puts a size-1,
# non-tile-aligned slice in the SECOND-MINOR (sublane) dim, which Mosaic
# rejects against the (8, 128) f32 tile. All per-(b, wc) stat/broadcast
# arrays therefore carry an explicit singleton MINOR-2 axis — [B, 1, WC]
# with block (1, 1, wc) — so every block fully covers its last two dims
# (legal: Mosaic pads a fully-covered dim internally).


def _branch_stats(xs_flat: Sequence[jax.Array], interpret: bool = False):
    """xs_flat: list of [B, H, WC] arrays -> (s1, s2), each [n, B, WC] f32
    holding sums over H (fold W outside to get per-(b,c) sums)."""
    n = len(xs_flat)
    b, h, wc = xs_flat[0].shape
    ht = _pick_h_tile(h, wc, streams=n)
    grid = (b, h // ht)
    in_specs = [pl.BlockSpec((1, ht, wc), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM) for _ in range(n)]
    out_specs = [pl.BlockSpec((1, 1, wc), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(2 * n)]
    out_shape = [jax.ShapeDtypeStruct((b, 1, wc), jnp.float32)] * (2 * n)
    outs = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*xs_flat)
    return (jnp.stack(outs[:n]).reshape(n, b, wc),
            jnp.stack(outs[n:]).reshape(n, b, wc))


# ---------------------------------------------------------------------------
# Pass 2 (fwd): mixed = sum_o x_o * A_o[b] + K[b]
# ---------------------------------------------------------------------------


def _apply_kernel(*refs):
    # refs: n inputs, then A [n,1,1,WC] per-b block, K [1,1,WC] per-b
    # block, out
    n = len(refs) - 3
    in_refs = refs[:n]
    a_ref, k_ref, out_ref = refs[n], refs[n + 1], refs[n + 2]
    ht = out_ref.shape[1]
    acc = jnp.broadcast_to(k_ref[0, 0].astype(jnp.float32),
                           (ht, k_ref.shape[2]))
    for o, x in enumerate(in_refs):
        acc = acc + x[0].astype(jnp.float32) * a_ref[o, 0, 0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _apply_mix(xs_flat, a, k, out_dtype, interpret: bool = False):
    """xs_flat: n arrays [B,H,WC]; a: [n,B,WC] f32; k: [B,WC] f32 ->
    [B,H,WC] out_dtype."""
    n = len(xs_flat)
    b, h, wc = xs_flat[0].shape
    ht = _pick_h_tile(h, wc, streams=n + 1)
    grid = (b, h // ht)
    in_specs = (
        [pl.BlockSpec((1, ht, wc), lambda i, j: (i, j, 0),
                      memory_space=pltpu.VMEM) for _ in range(n)]
        + [pl.BlockSpec((n, 1, 1, wc), lambda i, j: (0, i, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, 1, wc), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)]
    )
    out_spec = pl.BlockSpec((1, ht, wc), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _apply_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, wc), out_dtype),
        interpret=interpret,
    )(*xs_flat, a.reshape(n, b, 1, wc), k.reshape(b, 1, wc))


# ---------------------------------------------------------------------------
# Bwd kernel 1: dA[o,b] = sum_h g * x_o ;  dK[b] = sum_h g
# ---------------------------------------------------------------------------


def _bwd_reduce_kernel(*refs):
    n = len(refs) - 3
    in_refs = refs[:n]
    g_ref, da_ref, dk_ref = refs[n], refs[n + 1], refs[n + 2]
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        da_ref[...] = jnp.zeros_like(da_ref)
        dk_ref[...] = jnp.zeros_like(dk_ref)

    g = g_ref[0].astype(jnp.float32)           # [h_tile, WC]
    dk_ref[0, 0, :] += jnp.sum(g, axis=0)
    for o, x in enumerate(in_refs):
        da_ref[o, 0, 0, :] += jnp.sum(g * x[0].astype(jnp.float32), axis=0)


def _bwd_reduce(xs_flat, g, interpret: bool = False):
    """xs_flat: n arrays [B,H,WC]; g (= d mixed): [B,H,WC] ->
    (dA [n,B,WC] f32, dK [B,WC] f32)."""
    n = len(xs_flat)
    b, h, wc = xs_flat[0].shape
    ht = _pick_h_tile(h, wc, streams=n + 1)
    grid = (b, h // ht)
    in_specs = [pl.BlockSpec((1, ht, wc), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM) for _ in range(n + 1)]
    out_specs = [pl.BlockSpec((n, 1, 1, wc), lambda i, j: (0, i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 1, wc), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n, b, 1, wc), jnp.float32),
                 jax.ShapeDtypeStruct((b, 1, wc), jnp.float32)]
    da, dk = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*xs_flat, g)
    return da.reshape(n, b, wc), dk.reshape(b, wc)


# ---------------------------------------------------------------------------
# Bwd kernel 2: dx_o = g * A_o[b] + ds1_o[b] + 2 * x_o * ds2_o[b]
# ---------------------------------------------------------------------------


def _bwd_dx_kernel(*refs):
    n = (len(refs) - 4) // 2
    in_refs = refs[:n]
    g_ref, a_ref, ds1_ref, ds2_ref = refs[n:n + 4]
    out_refs = refs[n + 4:]
    g = g_ref[0].astype(jnp.float32)           # [h_tile, WC]
    for o, (x, out) in enumerate(zip(in_refs, out_refs)):
        dx = (g * a_ref[o, 0, 0].astype(jnp.float32)
              + ds1_ref[o, 0, 0].astype(jnp.float32)
              + 2.0 * x[0].astype(jnp.float32)
              * ds2_ref[o, 0, 0].astype(jnp.float32))
        out[0] = dx.astype(out.dtype)


def _bwd_dx(xs_flat, g, a, ds1, ds2, interpret: bool = False):
    """dx_o = g * a[o] + ds1[o] + 2 x_o ds2[o]; per-(b,wc) terms broadcast
    over H. Returns a list of [B,H,WC] arrays in each x's dtype."""
    n = len(xs_flat)
    b, h, wc = xs_flat[0].shape
    ht = _pick_h_tile(h, wc, streams=2 * n + 1)
    grid = (b, h // ht)
    blk = lambda: pl.BlockSpec((1, ht, wc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    bcast = lambda: pl.BlockSpec((n, 1, 1, wc), lambda i, j: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = ([blk() for _ in range(n + 1)] + [bcast(), bcast(), bcast()])
    out_specs = [blk() for _ in range(n)]
    out_shape = [jax.ShapeDtypeStruct((b, h, wc), x.dtype) for x in xs_flat]
    return pl.pallas_call(
        _bwd_dx_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*xs_flat, g, a.reshape(n, b, 1, wc), ds1.reshape(n, b, 1, wc),
      ds2.reshape(n, b, 1, wc))


# ---------------------------------------------------------------------------
# Glue: fold sums into BN affines / SE scales (all [C]/[B,C]-sized math,
# pure jnp => autodiffed inside the composite custom_vjp's backward)
# ---------------------------------------------------------------------------


def _tile_w(v, w):
    """[..., C] -> [..., W*C] matching the (w, c) flatten order."""
    return jnp.tile(v, (1,) * (v.ndim - 1) + (w,))


def _glue(s1, s2, params, cfg):
    """s1, s2: [n, B, WC] f32 H-sums. params: (g, bb, al [n,C] f32, se_w1,
    se_w2, none_k [C] (or (0,)), rm, rv [n,C] (or (0,))).
    Returns (a_w [n,B,WC], k_w [B,WC], mu [n,C], var [n,C])."""
    n, b, h, w, c, se_index, E, P, has_none, train = cfg
    g, bb, al, se_w1, se_w2, none_k, rm, rv = params
    s1 = s1.reshape(n, b, w, c)
    sum_bc = s1.sum(axis=2)                    # [n, B, C] per-(b,c) sums
    cnt = b * h * w
    if train:
        sum_c = sum_bc.sum(axis=1)             # [n, C]
        sumsq_c = s2.reshape(n, b, w, c).sum(axis=(1, 2))
        mu = sum_c / cnt
        var = jnp.maximum(sumsq_c / cnt - mu * mu, 0.0)
    else:
        mu, var = rm, rv
    r = jax.lax.rsqrt(var + EPS)               # [n, C]

    a_bn = r * g                               # [n, C]
    k_bn = bb - mu * a_bn                      # [n, C]

    # SE: scale per (b, c) from the post-BN spatial mean (affine in the raw
    # per-(b,c) mean), fused_cell.py:105-116 semantics.
    s_scale = jnp.ones((n, b, c), jnp.float32)
    if se_index is not None:
        mean_raw = sum_bc[se_index] / (h * w)              # [B, C]
        m = mean_raw * a_bn[se_index] + k_bn[se_index]     # post-BN mean
        m = m.reshape(b, E, P)
        hid = jax.nn.relu(jnp.einsum("bep,epm->bem", m,
                                     se_w1.astype(jnp.float32)))
        sig = jax.nn.sigmoid(jnp.einsum("bem,emp->bep", hid,
                                        se_w2.astype(jnp.float32)))
        s_scale = s_scale.at[se_index].set(sig.reshape(b, c))

    # Fold everything into per-(b, c) affines.
    a_full = al[:, None, :] * a_bn[:, None, :] * s_scale   # [n, B, C]
    k_full = (al[:, None, :] * k_bn[:, None, :] * s_scale).sum(axis=0)  # [B,C]
    if has_none:
        # BN(zeros) train mode: mu=0, var=0 -> y = bias; none_k already
        # carries alpha_none * bias (computed by the caller, differentiable).
        k_full = k_full + none_k[None, :]

    a_w = _tile_w(a_full, w)                   # [n, B, W*C]
    k_w = _tile_w(k_full, w)                   # [B, W*C]
    return a_w, k_w, mu, var


@functools.lru_cache(maxsize=None)
def _make_epilogue(cfg, out_dtype_name, interpret):
    """Build (and cache, so jit tracing sees a stable callable) the composite
    custom_vjp epilogue for a static configuration."""
    out_dtype = jnp.dtype(out_dtype_name)

    n, b, h, w, c, se_index, E, P, has_none, train = cfg
    # eval mode without SE is a pure affine in the running stats: skip the
    # stats sweep entirely (halves HBM reads on the serving path). The glue
    # then never touches s1/s2, so tiny zero stand-ins are exact.
    need_stats = train or se_index is not None

    def _stats(xs):
        if need_stats:
            return _branch_stats(xs, interpret=interpret)
        z = jnp.zeros((n, b, w * c), jnp.float32)
        return z, z

    @jax.custom_vjp
    def epilogue(xs, params):
        s1, s2 = _stats(xs)
        a_w, k_w, mu, var = _glue(s1, s2, params, cfg)
        mixed = _apply_mix(xs, a_w, k_w, out_dtype, interpret=interpret)
        return mixed, mu, var

    def fwd(xs, params):
        s1, s2 = _stats(xs)
        a_w, k_w, mu, var = _glue(s1, s2, params, cfg)
        mixed = _apply_mix(xs, a_w, k_w, out_dtype, interpret=interpret)
        return (mixed, mu, var), (xs, s1, s2, params, a_w)

    def bwd(res, cts):
        dmixed, dmu, dvar = cts
        xs, s1, s2, params, a_w = res
        dA, dK = _bwd_reduce(xs, dmixed, interpret=interpret)
        _, glue_vjp = jax.vjp(
            lambda s1_, s2_, p_: _glue(s1_, s2_, p_, cfg), s1, s2, params)
        ds1, ds2, dparams = glue_vjp((dA, dK, dmu, dvar))
        # ds1/ds2 are per-(b, w, c) cotangents constant over H (the glue only
        # ever reduces s1/s2 over (b, w)); shapes [n, B, WC].
        dxs = _bwd_dx(xs, dmixed, a_w, ds1, ds2, interpret=interpret)
        return tuple(dxs), dparams

    epilogue.defvjp(fwd, bwd)
    return epilogue


def fused_group_epilogue(xs, scales, biases, alphas_cols, *,
                         train: bool = True,
                         run_means=None, run_vars=None,
                         se_index: Optional[int] = None,
                         se_w1=None, se_w2=None, E: int = 0, P: int = 0,
                         none_alpha_col=None, none_bias=None,
                         out_dtype=None, interpret: bool = False):
    """Fused BN(+SE)+alpha-mix over a branch set.

    xs:           list of n pre-BN branch tensors [B, H, W, C] (C = E*P).
    scales/biases: per-branch BN scale/bias, each [C] f32.
    alphas_cols:  per-branch per-channel mixing weight [C] f32 (alpha[o, e]
                  broadcast over the P channels of edge e).
    train:        True -> normalize by batch stats (and return them);
                  False -> normalize by run_means/run_vars (lists of [C]).
    se_index:     which branch (if any) has the SE epilogue; se_w1 [E, P, mid],
                  se_w2 [E, mid, P].
    none_*:       closed-form 'none' branch: BN(zeros) train mode has mu=0,
                  var=0 -> y = bias, mixed in via its alpha column.
    Returns (mixed [B,H,W,C], (means [n,C], vars [n,C])) — the biased batch
    stats per branch (train mode), for the caller's running-stat updates.
    """
    n = len(xs)
    b, h, w, c = xs[0].shape
    dt = jnp.dtype(out_dtype or xs[0].dtype)
    xs_flat = tuple(x.reshape(b, h, w * c) for x in xs)

    g = jnp.stack(scales).astype(jnp.float32)      # [n, C]
    bb = jnp.stack(biases).astype(jnp.float32)
    al = jnp.stack(alphas_cols).astype(jnp.float32)
    zero = jnp.zeros((0,), jnp.float32)
    has_none = none_alpha_col is not None
    none_k = (none_alpha_col.astype(jnp.float32)
              * none_bias.astype(jnp.float32)) if has_none else zero
    if train:
        rm = rv = zero
    else:
        rm = jnp.stack(run_means).astype(jnp.float32)
        rv = jnp.stack(run_vars).astype(jnp.float32)
    sw1 = se_w1.astype(jnp.float32) if se_index is not None else zero
    sw2 = se_w2.astype(jnp.float32) if se_index is not None else zero

    cfg = (n, b, h, w, c, se_index, E, P, has_none, bool(train))
    fn = _make_epilogue(cfg, dt.name, bool(interpret))
    mixed, mu, var = fn(xs_flat, (g, bb, al, sw1, sw2, none_k, rm, rv))
    return mixed.reshape(b, h, w, c), (mu, var)


def group_epilogue_reference(xs, scales, biases, alphas_cols, *,
                             train: bool = True,
                             run_means=None, run_vars=None,
                             se_index=None, se_w1=None, se_w2=None,
                             E: int = 0, P: int = 0,
                             none_alpha_col=None, none_bias=None,
                             out_dtype=None):
    """Pure-jnp replication of the unfused GroupedMixedOp epilogue (the
    ground truth the kernels must match; mirrors fused_cell.py:102-139:
    per-branch train-mode BN -> optional SE -> alpha-weighted sum, with each
    branch cast to the module dtype before mixing, like grouped_bn)."""
    b, h, w, c = xs[0].shape
    dt = out_dtype or xs[0].dtype
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for o, (x, g, bb, a) in enumerate(zip(xs, scales, biases, alphas_cols)):
        xf = x.astype(jnp.float32)
        if train:
            mu = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf - mu), axis=(0, 1, 2))
        else:
            mu, var = run_means[o], run_vars[o]
        y = (xf - mu) * jax.lax.rsqrt(var + EPS) * g + bb
        y = y.astype(dt)  # grouped_bn returns module dtype
        if o == se_index:
            m = jnp.mean(y.reshape(b, h, w, E, P), axis=(1, 2))  # [B,E,P]
            hid = jax.nn.relu(jnp.einsum("bep,epm->bem", m,
                                         se_w1.astype(y.dtype)))
            sig = jax.nn.sigmoid(jnp.einsum("bem,emp->bep", hid,
                                            se_w2.astype(y.dtype)))
            y = (y.reshape(b, h, w, E, P) * sig[:, None, None]).reshape(
                b, h, w, c)
        acc = acc + a.astype(jnp.float32) * y.astype(jnp.float32)
    if none_alpha_col is not None:
        acc = acc + (none_alpha_col.astype(jnp.float32)
                     * none_bias.astype(jnp.float32))
    return acc.astype(dt)
