"""Fused supernet cell: grouped MixedOps for TPU.

The reference evaluates each cell as 9 independent MixedOps x 6 candidate
branches = 54 small ops per cell (search/cell.py:92-108) — hundreds of tiny
convs per supernet step. This module regroups them the TPU way:

  * All edges that read the SAME input tensor (the 2*M "input edges" per
    cell read only preprocess0(in0) / relu(in1)) become ONE conv per
    candidate branch with E*c_part output channels — per-edge kernels are
    concatenated on the output-channel axis. BatchNorm is per-channel, so a
    grouped BN over E*c_part channels is numerically identical to E separate
    BNs; the SE block mixes within an edge only, expressed as a batched
    einsum. Depthwise convs group via channel-multiplier-E.
  * Inner edges (different input per edge) are vmapped MixedOps: XLA lowers
    a vmapped conv to one batched conv (batch_group_count), so each node
    adds 6 branch graphs instead of 6*n.

Per cell this is ~18 conv graphs instead of 54, with 3-6x wider output
channels per conv (MXU lane utilization), identical math to the reference
semantics. Equivalence to the naive path is covered by
tests/test_fused_cell.py via parameter translation.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.ops.primitives import (
    DENSE_DEPTHWISE_MAX_CHANNELS,
    OpType,
    RectifyBlock,
    RectifyResample,
    ShrinkBlock,
    _densify_depthwise,
    avg_pool_3x3,
    build_norm,
    conv2d,
    conv_transpose2d,
    kaiming_normal_fan,
    max_pool_3x3,
    relu,
    upsample2x,
    xavier_normal_fans,
)
from senas_tpu.search.cell import MixedOp

# Branch-conv merging (VERDICT r2 #2 structural MFU attack): all parametric
# branches of a GroupedMixedOp read the SAME input, and with the dense-
# depthwise rewrite every one of them is a plain conv — so same-geometry
# kernels can be concatenated on the output-channel axis and run as ONE
# wider conv (a 3x3 kernel embeds exactly into 5x5 with padding +1; a
# dilated 5x5 embeds exactly into a dense 13x13). Parameters keep their
# per-branch names/shapes — merging happens at trace time — so checkpoints,
# weight translation, and the naive==fused equivalence tests are untouched.
#
# MEASURED NEGATIVE (2026-08-17, v5e, keep-the-winner): full bilevel search
# step 433 ms (separate convs) vs 456 ms (merged 5x5) — XLA already
# schedules the separate branch convs well, and the output slicing +
# per-branch BN/SE epilogues on the wide tensor reintroduce copies. The
# dense-13x13 dilated fold is far worse (cell fwd+bwd 8.4 -> 13.9 ms; the
# 6.8x FLOP inflation of the dilated branches dominates even a ~94%-idle
# MXU). Both paths stay implemented + equivalence-tested, default OFF.
MERGE_GROUP_CONVS = os.environ.get("SENAS_MERGE_GROUP_CONVS", "0") == "1"
MERGE_DILATED = os.environ.get("SENAS_MERGE_DILATED", "0") == "1"


def _use_pallas_epilogue() -> bool:
    """Gate for the Pallas fused BN+SE+alpha-mix epilogue
    (ops/grouped_epilogue.py). Read at call time so tests can toggle it.

    Adjudicated on the v5e chip (keep-the-winner, BASELINE.md round 3):
    full bilevel search step 432.1 ms (XLA) vs 426.4 ms (Pallas), 1.013x,
    with HBM bytes/step 324 -> 300 GB — so the default is ON where the
    kernels actually lower (TPU). On CPU the Pallas path runs in interpret
    mode (orders of magnitude slower), so the default stays OFF there;
    tests that pin the gate set the env var explicitly."""
    v = os.environ.get("SENAS_PALLAS_EPILOGUE")
    if v is not None:
        return v == "1"
    # ON exactly where the kernels lower natively (the integration picks
    # interpret mode by this same check).
    return jax.default_backend() != "cpu"


class _EpilogueBN(nn.Module):
    """Parameter/stat holder with primitives.BatchNorm's EXACT variable
    layout ({params: scale, bias}, {batch_stats: mean, var}, f32), for
    branches whose BN compute happens inside the fused Pallas epilogue.
    Checkpoints are interchangeable with the unfused path. Call once to
    read (scale, bias, run_mean, run_var); call again with (mu, var, count)
    to advance the running stats with torch momentum-0.1 / unbiased-var
    semantics (primitives.BatchNorm:86-91)."""

    momentum: float = 0.1

    @nn.compact
    def __call__(self, c, mu=None, var=None, count=None):
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if mu is not None and not self.is_initializing():
            unbiased = var * (count / max(count - 1, 1))
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mu
            ra_var.value = (1 - m) * ra_var.value + m * unbiased
        return scale, bias, ra_mean.value, ra_var.value


def _embed_kernel(kern, k_to: int, dilation: int = 1):
    """Exactly embed a [k,k,I,O] (optionally dilated) kernel into a dense
    [k_to,k_to,I,O] dilation-1 kernel (centered; zero elsewhere)."""
    k = kern.shape[0]
    dk = dilation * (k - 1) + 1
    off = (k_to - dk) // 2
    out = jnp.zeros((k_to, k_to) + kern.shape[2:], kern.dtype)
    return out.at[off:off + dk:dilation, off:off + dk:dilation].set(kern)


class GroupedMixedOp(nn.Module):
    """E same-op-type edges over ONE shared input -> [B, H, W, E, c_part].

    alphas: [E, n_ops] mixing weights (already softmaxed).
    """

    c_in: int
    c_part: int
    num_edges: int
    op_type: OpType
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, alphas, train: bool = False):
        E, P, C = self.num_edges, self.c_part, self.c_in
        stride = 1 if self.op_type == OpType.NORM else 2
        transpose = self.op_type == OpType.UP
        b, h, w, _ = x.shape
        oh, ow = (h * 2, w * 2) if transpose else (h // stride, w // stride)

        def grouped_bn(t, name):
            return build_norm(self.dtype, name=name)(t, use_running_average=not train)

        # Init parity note: torch fans are PER-EDGE (the reference runs E
        # separate ops), so every grouped param passes its torch fan
        # explicitly — flax's inferred fans on [E,...] / [...,E*P] layouts
        # would be off by a factor of E.
        def se_epilogue(name, out):
            """out: [b,oh,ow,E*P] post-BN; per-edge squeeze-excite."""
            mid = P // 16 if P > 16 else 1
            y = jnp.mean(out.reshape(b, oh, ow, E, P), axis=(1, 2))  # [B,E,P]
            w1 = self.param(f"{name}_se1", xavier_normal_fans(P, mid),
                            (E, P, mid), jnp.float32).astype(out.dtype)
            w2 = self.param(f"{name}_se2", xavier_normal_fans(mid, P),
                            (E, mid, P), jnp.float32).astype(out.dtype)
            y = relu(jnp.einsum("bep,epm->bem", y, w1))
            y = nn.sigmoid(jnp.einsum("bem,emp->bep", y, w2))
            return (out.reshape(b, oh, ow, E, P) * y[:, None, None]).reshape(
                b, oh, ow, E * P)

        def dw_mid(name, out):
            """out: [b,oh,ow,C*E] raw depthwise conv output -> pre-pbn
            tensor [b,oh,ow,E*P] (dbn -> relu -> grouped pointwise)."""
            out = grouped_bn(out, f"{name}_dbn")
            out = relu(out)
            out = out.reshape(b, oh, ow, C, E)
            pkern = self.param(f"{name}_pkernel", kaiming_normal_fan(P),
                               (E, C, P), jnp.float32).astype(x.dtype)
            out = jnp.einsum("bhwce,ecp->bhwep", out, pkern)
            return out.reshape(b, oh, ow, E * P)

        def dw_epilogue(name, out):
            out = grouped_bn(dw_mid(name, out), f"{name}_pbn")
            return out.reshape(b, oh, ow, E, P)

        def conv_pre(name, k, dilation):
            fan = (C if transpose else P) * k * k
            kern = self.param(f"{name}_kernel", kaiming_normal_fan(fan),
                              (k, k, C, E * P), jnp.float32).astype(x.dtype)
            if transpose:
                return conv_transpose2d(x, kern, stride=2, dilation=dilation,
                                        output_padding=1)
            return conv2d(x, kern, stride=stride, dilation=dilation)

        def conv_branch(name, k, dilation, with_se):
            out = grouped_bn(conv_pre(name, k, dilation), f"{name}_bn")
            if with_se:
                out = se_epilogue(name, out)
            return out.reshape(b, oh, ow, E, P)

        def depsep_pre(name, k):
            # depthwise with channel-multiplier E: output channel c*E+e;
            # everything up to the final pbn (which the epilogue can absorb)
            dkern = self.param(f"{name}_dkernel", kaiming_normal_fan(C * k * k),
                               (k, k, 1, C * E), jnp.float32).astype(x.dtype)
            if transpose:
                out = conv_transpose2d(x, dkern, stride=2, output_padding=1,
                                       groups=C)
            else:
                out = conv2d(x, dkern, stride=stride, groups=C)
            return dw_mid(name, out)

        def depsep_branch(name, k):
            out = grouped_bn(depsep_pre(name, k), f"{name}_pbn")
            return out.reshape(b, oh, ow, E, P)

        def adapter_pre(name, base):
            # base: [B,oh,ow,C] (pool/upsample/identity)
            if C != P:
                kern = self.param(f"{name}_kernel", kaiming_normal_fan(P),
                                  (1, 1, C, E * P), jnp.float32).astype(x.dtype)
                return conv2d(base, kern)
            return jnp.tile(base, (1, 1, 1, E))

        def adapter_branch(name, base):
            # base or None for 'none'
            if base is None:
                out = jnp.zeros((b, oh, ow, E * P), x.dtype)
            else:
                out = adapter_pre(name, base)
            out = grouped_bn(out, f"{name}_bn")
            return out.reshape(b, oh, ow, E, P)

        def adapter_base(name):
            if name == "avg_pool":
                return avg_pool_3x3(x, stride=stride)
            if name == "max_pool":
                return max_pool_3x3(x, stride=stride)
            if name == "up_sample":
                return upsample2x(x)
            return x  # identity

        ops = self.op_type.value["ops"]

        # ---- Pallas fused epilogue path (ops/grouped_epilogue.py): every
        # branch contributes its pre-final-BN tensor; BN(+SE)+alpha-mix run
        # as two kernels. Variable layout is identical to the unfused path
        # (_EpilogueBN), so checkpoints are interchangeable; equivalence is
        # pinned by tests/test_grouped_epilogue_integration.py.
        if _use_pallas_epilogue() and not MERGE_GROUP_CONVS:
            from senas_tpu.ops.grouped_epilogue import fused_group_epilogue

            specs = []          # (op_idx, name, bn_name, pre-BN tensor)
            none_idx = None
            for o, name in enumerate(ops):
                if name == "none":
                    none_idx = o
                elif name in ("avg_pool", "max_pool", "up_sample", "identity"):
                    specs.append((o, name, f"{name}_bn",
                                  adapter_pre(name, adapter_base(name))))
                elif name in ("conv_3", "se_conv_3"):
                    specs.append((o, name, f"{name}_bn", conv_pre(name, 3, 1)))
                elif name == "dil_3_conv_5":
                    specs.append((o, name, f"{name}_bn", conv_pre(name, 5, 3)))
                elif name == "dil_2_conv_5":
                    specs.append((o, name, f"{name}_bn", conv_pre(name, 5, 2)))
                elif name == "dep_sep_conv_3":
                    specs.append((o, name, f"{name}_pbn", depsep_pre(name, 3)))
                elif name == "dep_sep_conv_5":
                    specs.append((o, name, f"{name}_pbn", depsep_pre(name, 5)))
                else:
                    raise NotImplementedError(name)

            bns, scales, biases, rms, rvs = [], [], [], [], []
            for _, _, bn_name, _ in specs:
                bn = _EpilogueBN(name=bn_name)
                s_, b_, rm_, rv_ = bn(E * P)
                bns.append(bn)
                scales.append(s_)
                biases.append(b_)
                rms.append(rm_)
                rvs.append(rv_)
            alphas_cols = [jnp.repeat(alphas[:, o], P) for o, *_ in specs]
            se_pos = next((i for i, (_, n2, _, _) in enumerate(specs)
                           if n2 == "se_conv_3"), None)
            se_w1 = se_w2 = None
            if se_pos is not None:
                mid = P // 16 if P > 16 else 1
                se_w1 = self.param("se_conv_3_se1", xavier_normal_fans(P, mid),
                                   (E, P, mid), jnp.float32)
                se_w2 = self.param("se_conv_3_se2", xavier_normal_fans(mid, P),
                                   (E, mid, P), jnp.float32)
            none_col = none_y = None
            if none_idx is not None:
                nbn = _EpilogueBN(name="none_bn")
                ns, nb2, nrm, nrv = nbn(E * P)
                none_col = jnp.repeat(alphas[:, none_idx], P)
                if train:
                    none_y = nb2  # BN(zeros) train mode: mu=0, var=0 -> bias
                else:
                    none_y = nb2 - nrm * jax.lax.rsqrt(nrv + 1e-5) * ns

            interpret = jax.default_backend() == "cpu"
            mixed, (mu, var) = fused_group_epilogue(
                [t for *_, t in specs], scales, biases, alphas_cols,
                train=train, run_means=rms, run_vars=rvs,
                se_index=se_pos, se_w1=se_w1, se_w2=se_w2, E=E, P=P,
                none_alpha_col=none_col, none_bias=none_y,
                out_dtype=x.dtype, interpret=interpret)
            if train:
                count = b * oh * ow
                for i, bn in enumerate(bns):
                    bn(E * P, mu=mu[i], var=var[i], count=count)
                if none_idx is not None:
                    zc = jnp.zeros((E * P,), jnp.float32)
                    nbn(E * P, mu=zc, var=zc, count=count)
            return mixed.reshape(b, oh, ow, E, P)

        # ---- merged-conv planning (see module docstring / MERGE_GROUP_CONVS)
        merge = MERGE_GROUP_CONVS and C <= DENSE_DEPTHWISE_MAX_CHANNELS
        merged_out = {}
        if merge:
            K = 13 if MERGE_DILATED else 5
            plan, parts = [], []

            def collect(name, kern, kind, dilation=1):
                parts.append(_embed_kernel(kern, K, dilation))
                plan.append((name, kind, kern.shape[-1] if kind != "dw"
                             else C * E))

            for name in ops:
                if name in ("conv_3", "se_conv_3"):
                    kern = self.param(f"{name}_kernel",
                                      kaiming_normal_fan((C if transpose else P) * 9),
                                      (3, 3, C, E * P), jnp.float32).astype(x.dtype)
                    collect(name, kern, "se" if name == "se_conv_3" else "conv")
                elif name in ("dil_3_conv_5", "dil_2_conv_5") and MERGE_DILATED:
                    d = 3 if name == "dil_3_conv_5" else 2
                    kern = self.param(f"{name}_kernel",
                                      kaiming_normal_fan((C if transpose else P) * 25),
                                      (5, 5, C, E * P), jnp.float32).astype(x.dtype)
                    collect(name, kern, "conv", dilation=d)
                elif name in ("dep_sep_conv_3", "dep_sep_conv_5"):
                    k = 3 if name.endswith("_3") else 5
                    dkern = self.param(f"{name}_dkernel",
                                       kaiming_normal_fan(C * k * k),
                                       (k, k, 1, C * E), jnp.float32).astype(x.dtype)
                    collect(name, _densify_depthwise(dkern, C), "dw")
            if parts:
                mk = jnp.concatenate(parts, axis=-1)  # [K,K,C,sum(widths)]
                if transpose:
                    out = conv_transpose2d(x, mk, stride=2, output_padding=1)
                else:
                    out = conv2d(x, mk, stride=stride)
                start = 0
                for name, kind, width in plan:
                    seg = out[..., start:start + width]
                    start += width
                    if kind == "dw":
                        merged_out[name] = dw_epilogue(name, seg)
                    else:
                        seg = grouped_bn(seg, f"{name}_bn")
                        if kind == "se":
                            seg = se_epilogue(name, seg)
                        merged_out[name] = seg.reshape(b, oh, ow, E, P)

        branches = []
        for name in ops:
            if name in merged_out:
                branches.append(merged_out[name])
            elif name == "avg_pool":
                branches.append(adapter_branch(name, avg_pool_3x3(x, stride=stride)))
            elif name == "max_pool":
                branches.append(adapter_branch(name, max_pool_3x3(x, stride=stride)))
            elif name == "up_sample":
                branches.append(adapter_branch(name, upsample2x(x)))
            elif name == "identity":
                branches.append(adapter_branch(name, x))
            elif name == "none":
                branches.append(adapter_branch(name, None))
            elif name == "conv_3":
                branches.append(conv_branch(name, 3, 1, with_se=False))
            elif name == "se_conv_3":
                branches.append(conv_branch(name, 3, 1, with_se=True))
            elif name == "dil_3_conv_5":
                branches.append(conv_branch(name, 5, 3, with_se=False))
            elif name == "dil_2_conv_5":
                branches.append(conv_branch(name, 5, 2, with_se=False))
            elif name == "dep_sep_conv_3":
                branches.append(depsep_branch(name, 3))
            elif name == "dep_sep_conv_5":
                branches.append(depsep_branch(name, 5))
            else:
                raise NotImplementedError(name)

        stacked = jnp.stack(branches, axis=0)  # [n_ops, B, oh, ow, E, P]
        aw = alphas.T.astype(stacked.dtype)     # [n_ops, E]
        return jnp.einsum("oe,obhwep->bhwep", aw, stacked)


def _stacked_mixed_op(c_in: int, c_part: int, op_type: OpType, num_edges: int,
                      dtype=None, name: Optional[str] = None):
    """Inner-edge group: vmapped MixedOp over stacked inputs [E,B,H,W,C]."""
    Vm = nn.vmap(
        MixedOp,
        in_axes=(0, 0, 0, None),
        out_axes=0,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        methods=["__call__"],
    )
    return Vm(c_in=c_in, c_part=c_part, op_type=op_type, dtype=dtype, name=name)


class FusedSearchCell(nn.Module):
    """Drop-in replacement for SearchCell with grouped edge evaluation.

    Same call signature and edge/alpha/beta indexing as SearchCell
    (search/cell.py:92-108 semantics): edge e = offset(n)+j, where
    offset(n) = sum_{i<n}(2+i); edges j<2 are DOWN (down cell) or NORM/UP
    (up cell, j=0/1); inner edges NORM.
    """

    meta_node_num: int
    double_down: int
    c_in0: int
    c_in1: int
    c_out: int
    cell_type: str
    dtype: Optional[Any] = None
    k: int = 4

    def setup(self):
        M = self.meta_node_num
        if self.cell_type == "down":
            self.preprocess0 = RectifyResample(self.c_in1, "down", dtype=self.dtype)
            c_part = (self.c_out // self.double_down) // self.k
            t0, t1 = OpType.DOWN, OpType.DOWN
        else:
            self.preprocess0 = ShrinkBlock(self.c_in1, dtype=self.dtype)
            c_part = self.c_out // self.k
            t0, t1 = OpType.NORM, OpType.UP
        self._c_part = c_part
        self._t0, self._t1 = t0, t1

        self.group0 = GroupedMixedOp(self.c_in1, c_part, M, t0, dtype=self.dtype)
        self.group1 = GroupedMixedOp(self.c_in1, c_part, M, t1, dtype=self.dtype)
        self.inner = [
            _stacked_mixed_op(c_part, c_part, OpType.NORM, n, dtype=self.dtype,
                              name=f"inner_{n}")
            for n in range(1, M)
        ]
        self.post_process = RectifyBlock(self.c_out, cell_type=self.cell_type,
                                         dtype=self.dtype)

    def __call__(self, in0, in1, weights_norm, weights_chg, betas, train: bool = False):
        M = self.meta_node_num
        in0p = self.preprocess0(in0, train)
        in1p = relu(in1)

        offsets = [sum(2 + i for i in range(n)) for n in range(M)]
        idx0 = jnp.asarray([o + 0 for o in offsets])
        idx1 = jnp.asarray([o + 1 for o in offsets])
        a0 = (weights_norm if self._t0 == OpType.NORM else weights_chg)[idx0]
        a1 = (weights_norm if self._t1 == OpType.NORM else weights_chg)[idx1]

        m0 = self.group0(in0p, a0, train)  # [B,H',W',M,P]
        m1 = self.group1(in1p, a1, train)

        nodes = []
        for n in range(M):
            off = offsets[n]
            acc = (betas[off + 0].astype(m0.dtype) * m0[..., n, :]
                   + betas[off + 1].astype(m1.dtype) * m1[..., n, :])
            if n >= 1:
                xin = jnp.stack(nodes[:n], axis=0)  # [n,B,H',W',P]
                a_in = weights_norm[off + 2: off + 2 + n]
                c_in = weights_chg[off + 2: off + 2 + n]
                inner_out = self.inner[n - 1](xin, a_in, c_in, train)
                bw = betas[off + 2: off + 2 + n].astype(inner_out.dtype)
                acc = acc + jnp.tensordot(bw, inner_out, axes=1)
            nodes.append(relu(acc))

        out = jnp.concatenate(nodes[-M:], axis=-1)
        return self.post_process(out, train)
