"""Supernet search cell: MixedOp + shrink/expand cell DAG.

Semantics follow the reference (/root/reference/search/cell.py): each MixedOp
is a softmax-weighted sum over the candidate-op set; the cell shrinks its
internal width to c_part = c_out/4, runs a meta-node DAG with beta-scaled
edges, then expands back with a 3x3 RectifyBlock over the concatenated nodes.

TPU notes: the weighted branch-sum is left to XLA fusion by default (the
branches are convs XLA schedules onto the MXU; the combine is a cheap VPU
epilogue that fuses into the last op of each branch). The whole supernet is
one traced graph — candidate weights are traced-through array inputs, NOT
Python control flow, so one compilation serves the entire search.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.ops.primitives import (
    OpType,
    RectifyBlock,
    RectifyResample,
    ShrinkBlock,
    make_op,
    relu,
)


class MixedOp(nn.Module):
    """Weighted mixture over the candidate-op set for one edge.

    Reference: search/cell.py:5-43. The reference's partial-channel skip path
    is dead code there (self.k = 1 => c_out == c_part), so it is not
    reproduced; the mixture is a plain weighted sum.
    """

    c_in: int
    c_part: int
    op_type: OpType
    dtype: Optional[Any] = None

    def setup(self):
        self.branches = [
            make_op(name, self.c_in, self.c_part, self.op_type,
                    dtype=self.dtype, module_name=f"branch_{i}_{name}")
            for i, name in enumerate(self.op_type.value["ops"])
        ]

    def __call__(self, x, alpha_normal, alpha_up_dn, train: bool = False):
        w = alpha_normal if self.op_type == OpType.NORM else alpha_up_dn
        outs = [op(x, train) for op in self.branches]
        stacked = jnp.stack(outs, axis=0)
        return jnp.tensordot(w.astype(stacked.dtype), stacked, axes=1)


class SearchCell(nn.Module):
    """Shrink-and-expand supernet cell (search/cell.py:46-110)."""

    meta_node_num: int
    double_down: int
    c_in0: int
    c_in1: int
    c_out: int
    cell_type: str  # 'down' | 'up'
    dtype: Optional[Any] = None

    # internal-channel shrink factor (reference Cell.k = 4)
    k: int = 4

    def setup(self):
        input_num = 2
        if self.cell_type == "down":
            self.preprocess0 = RectifyResample(self.c_in1, "down", dtype=self.dtype)
            c_part = (self.c_out // self.double_down) // self.k
        else:
            self.preprocess0 = ShrinkBlock(self.c_in1, dtype=self.dtype)
            c_part = self.c_out // self.k
        self._c_part = c_part
        self._input_num = input_num

        ops = []
        for i in range(self.meta_node_num):
            for j in range(input_num + i):
                if j < input_num:
                    if self.cell_type == "down":
                        op = MixedOp(self.c_in1, c_part, OpType.DOWN, dtype=self.dtype,
                                     name=f"edge_{len(ops)}")
                    elif j > 0:
                        op = MixedOp(self.c_in1, c_part, OpType.UP, dtype=self.dtype,
                                     name=f"edge_{len(ops)}")
                    else:
                        op = MixedOp(self.c_in1, c_part, OpType.NORM, dtype=self.dtype,
                                     name=f"edge_{len(ops)}")
                else:
                    op = MixedOp(c_part, c_part, OpType.NORM, dtype=self.dtype,
                                 name=f"edge_{len(ops)}")
                ops.append(op)
        self.edges = ops
        self.post_process = RectifyBlock(self.c_out, cell_type=self.cell_type,
                                         dtype=self.dtype)

    def __call__(self, in0, in1, weights_norm, weights_chg, betas, train: bool = False):
        """weights_norm/weights_chg: [k_edges, n_ops]; betas: [k_edges]."""
        in0 = self.preprocess0(in0, train)
        in1 = relu(in1)
        states = [in0, in1]
        offset = 0
        for _ in range(self.meta_node_num):
            node_feature = None
            for j, h in enumerate(states):
                e = offset + j
                edge_feature = betas[e].astype(h.dtype) * self.edges[e](
                    h, weights_norm[e], weights_chg[e], train)
                node_feature = edge_feature if node_feature is None else node_feature + edge_feature
            offset += len(states)
            states.append(relu(node_feature))
        out = jnp.concatenate(states[-self.meta_node_num:], axis=-1)
        return self.post_process(out, train)
