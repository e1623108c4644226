"""Fixed (discrete-genotype) SENAS model, TPU-native.

Mirrors the reference architecture (/root/reference/models/senas_model.py):
stem0 (7x7 ConvBn) + stem1 (maxpool + ResNet BasicBlock), a `depth`-long
encoder column of down cells, a triangular UNet++-style decoder grid of up
cells with gamma-pruned dense skips, and a Head (up cell + 3x3 seg conv).

The genotype is static configuration: the whole network is a fixed DAG traced
once under jit. Gamma-pruned up-cells are simply never constructed
(senas_model.py:123-127), so the compiled XLA program contains no dead
branches.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from senas_tpu.core.genotype import Genotype
from senas_tpu.ops.primitives import (
    BasicBlock,
    ConvBn,
    OpType,
    RectifyBlock,
    RectifyResample,
    ReLUConv,
    ShrinkBlock,
    make_op,
    max_pool_3x3,
    relu,
)


class BuildCell(nn.Module):
    """Discrete cell compiled from a genotype (senas_model.py:4-64)."""

    genotype: Genotype
    double_down: int
    c_in0: int
    c_in1: int
    c_out: int
    cell_type: str  # 'down' | 'up'
    dropout_prob: float = 0.0
    dtype: Optional[Any] = None

    def setup(self):
        if self.cell_type == "down":
            self.preprocess0 = RectifyResample(self.c_in1, "down", dtype=self.dtype)
            c_part = self.c_out // self.double_down
        else:
            self.preprocess0 = ShrinkBlock(self.c_in1, dtype=self.dtype)
            c_part = self.c_out

        if self.cell_type == "up":
            op_names, idx = zip(*self.genotype.up)
            concat = self.genotype.up_concat
        else:
            op_names, idx = zip(*self.genotype.down)
            concat = self.genotype.down_concat

        self._num_meta_node = len(op_names) // 2
        self._concat = list(concat)
        self._indices = list(idx)
        self._input_num = 2

        ops = []
        for i, (name, index) in enumerate(zip(op_names, idx)):
            if index < self._input_num:
                if self.cell_type == "down":
                    op_type = OpType.DOWN
                elif index > 0:
                    op_type = OpType.UP
                else:
                    op_type = OpType.NORM
                c_in = self.c_in1
            else:
                op_type = OpType.NORM
                c_in = c_part
            ops.append(
                make_op(name, c_in, c_part, op_type, dp=self.dropout_prob,
                        dtype=self.dtype, module_name=f"op_{i}")
            )
        self.cell_ops = ops
        self.post_process = RectifyBlock(self.c_out, cell_type=self.cell_type, dtype=self.dtype)

    def __call__(self, in0, in1, train: bool = False):
        in0 = self.preprocess0(in0, train)
        in1 = relu(in1)

        states = [in0, in1]
        for i in range(self._num_meta_node):
            h1 = states[self._indices[2 * i]]
            h2 = states[self._indices[2 * i + 1]]
            h1 = self.cell_ops[2 * i](h1, train)
            h2 = self.cell_ops[2 * i + 1](h2, train)
            states.append(relu(h1 + h2))
        out = jnp.concatenate([states[i] for i in self._concat], axis=-1)
        return self.post_process(out, train)


class Head(nn.Module):
    """Final up cell + 3x3 segmentation conv (senas_model.py:67-75)."""

    genotype: Genotype
    double_down: int
    c_in0: int
    c_in1: int
    nclass: int
    dtype: Optional[Any] = None
    # the (possibly nn.remat-wrapped) cell class — SenasModel passes its own
    # so remat=True really does cover EVERY cell, the head's included
    cell_cls: Any = BuildCell

    def setup(self):
        self.up_cell = self.cell_cls(self.genotype, self.double_down, self.c_in0,
                                     self.c_in1, self.c_in1, "up", dtype=self.dtype)
        self.segmentation_head = ReLUConv(self.nclass, kernel_size=3, dtype=self.dtype)

    def __call__(self, s0, ot, train: bool = False):
        return self.segmentation_head(self.up_cell(s0, ot, train), train)


class SenasModel(nn.Module):
    """Fixed SENAS network (senas_model.py:78-179). NHWC in/out.

    Input  [B, H, W, in_channels]; output list of [B, H, W, nclass] logits
    (singleton unless supervision=True), matching the reference's
    list-of-heads convention.
    """

    nclass: int
    in_channels: int
    c: int = 32
    depth: int = 5
    dropout_prob: float = 0.0
    supervision: bool = False
    genotype: Optional[Genotype] = None
    double_down_channel: bool = False
    dtype: Optional[Any] = None
    # Rematerialize each cell's activations in the backward pass
    # (jax.checkpoint via flax's lifted transform). Identical math and
    # parameter tree; trades ~1 extra forward FLOP per cell for O(depth^2)
    # less live activation memory — the knob that lets big configs
    # (512^2 inputs, hippo batch 256) fit HBM. Config: training.remat.
    remat: bool = False

    def setup(self):
        assert self.depth >= 2, "depth must >= 2"
        genotype = self.genotype
        double_down = 2 if self.double_down_channel else 1
        c_in0 = c_in1 = c_curr = self.c
        self.gamma = list(genotype.gamma)
        # static_argnums counts self as 0: BuildCell.__call__(self, in0, in1, train)
        Cell = nn.remat(BuildCell, static_argnums=(3,)) if self.remat else BuildCell

        self.stem0 = ConvBn(c_in0, kernel_size=7, dtype=self.dtype)
        self.stem1_block = BasicBlock(c_in1, stride=1, dtype=self.dtype)

        num_filters: List[List[List]] = []
        down_f = []
        down_cells = []
        for i in range(self.depth):
            if i == 0:
                down_f.append([1, 1, int(c_in1), "stem1"])
            else:
                c_curr = int(double_down * c_curr)
                down_f.append([c_in0, c_in1, c_curr, "down"])
                down_cells.append(
                    Cell(genotype, double_down, c_in0, c_in1, c_curr, "down",
                         dropout_prob=self.dropout_prob, dtype=self.dtype,
                         name=f"down_{i}")
                )
                c_in0, c_in1 = c_in1, c_curr
        num_filters.append(down_f)
        self.down_cells = down_cells

        up_cells = {}
        for i in range(1, self.depth):
            up_f = []
            for j in range(self.depth - i):
                gamma_idx = sum(range(i + j)) + j
                if i + j < self.depth - 1 and self.gamma[gamma_idx] == 0:
                    up_f.append([0, 0, 0, "None"])
                else:
                    head_curr = num_filters[0][j][2]
                    head_down = num_filters[i - 1][j + 1][2]
                    head_in0 = sum(num_filters[k][j][2] for k in range(i))
                    head_in1 = head_down
                    up_f.append([head_in0, head_in1, head_curr, "up"])
                    up_cells[f"up_{i}_{j}"] = Cell(
                        genotype, double_down, head_in0, head_in1, head_curr, "up",
                        dropout_prob=self.dropout_prob, dtype=self.dtype,
                        name=f"up_{i}_{j}",
                    )
            num_filters.append(up_f)
        self.up_cells = up_cells

        self.head = Head(genotype, double_down, self.c,
                         num_filters[-1][0][2], self.nclass, dtype=self.dtype,
                         cell_cls=Cell)

    def __call__(self, x, train: bool = False):
        # stem0: [B,H,W,in] -> [B,H,W,c]; stem1: -> [B,H/2,W/2,c]
        s0 = self.stem0(x, train)
        ot = max_pool_3x3(relu(s0), stride=2)
        ot = self.stem1_block(ot, train)
        cell_out = [ot]
        for cell in self.down_cells:
            if len(cell_out) == 1:
                ot = cell(s0, cell_out[-1], train)
            else:
                ot = cell(cell_out[-2], cell_out[-1], train)
            cell_out.append(ot)

        for j in reversed(range(self.depth - 1)):
            for i in range(1, self.depth - j):
                gamma_idx = sum(range(i + j)) + j
                if i + j < self.depth - 1 and self.gamma[gamma_idx] == 0:
                    cell_out[i + j] = None
                else:
                    ides = list(range(j, i + j))
                    in0 = jnp.concatenate(
                        [cell_out[idx] for idx in ides if cell_out[idx] is not None],
                        axis=-1,
                    )
                    in1 = cell_out[i + j]
                    cell_out[i + j] = self.up_cells[f"up_{i}_{j}"](in0, in1, train)

        if self.supervision:
            return [self.head(s0, ot, train) for ot in cell_out if ot is not None]
        return [self.head(s0, cell_out[-1], train)]
