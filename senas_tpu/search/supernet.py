"""SENAS supernet: macro network + architecture parameters + discretization.

Mirrors /root/reference/search/senas_search.py, redesigned for JAX:

  * `SenasSearch` is a pure Flax module. Architecture parameters (alpha, beta,
    gamma) are NOT module parameters; they live in a separate pytree managed
    by the caller and are passed through `__call__` as traced inputs. This
    gives the bilevel optimizer two clean optax states (weights vs arch) over
    disjoint pytrees — the JAX equivalent of the reference's two torch
    optimizers over model.parameters() vs model.arch_parameters()
    (experiments/search_arc.py:131-146).
  * `normalize_arch` is the softmax block from NAS.forward (:248-260).
  * `derive_genotype` is NAS.genotype (:203-244) as pure numpy, producing a
    `Genotype` whose repr round-trips with the reference format.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from senas_tpu.core.genotype import DownOps, Genotype, GenoParser, NormOps, UpOps
from senas_tpu.ops.primitives import BasicBlock, ConvBn, ReLUConv, max_pool_3x3, relu
from senas_tpu.search.cell import SearchCell
from senas_tpu.search.fused_cell import FusedSearchCell


def _num_edges(meta_node_num: int) -> int:
    return sum(2 + i for i in range(meta_node_num))


def arch_param_count(meta_node_num: int, depth: int) -> Dict[str, tuple]:
    k = _num_edges(meta_node_num)
    return {
        "alphas_dn": (k, len(DownOps)),
        "alphas_up": (k, len(UpOps)),
        "alphas_dn_nm": (k, len(NormOps)),
        "alphas_up_nm": (k, len(NormOps)),
        "betas_dn": (k,),
        "betas_up": (k,),
        "gamma": (sum(range(depth - 1)), 2),
    }


def init_arch_params(rng: jax.Array, meta_node_num: int, depth: int,
                     use_sharing: bool = True) -> Dict[str, jax.Array]:
    """1e-3 * randn init (NAS._init_alphas, senas_search.py:138-168).

    With use_sharing=True the up-normal table is omitted and aliased to the
    down-normal table at normalization time (reference shares the tensor).
    """
    shapes = arch_param_count(meta_node_num, depth)
    if use_sharing:
        shapes = {k: v for k, v in shapes.items() if k != "alphas_up_nm"}
    keys = jax.random.split(rng, len(shapes))
    return {
        name: 1e-3 * jax.random.normal(key, shape, dtype=jnp.float32)
        for key, (name, shape) in zip(keys, shapes.items())
    }


def _beta_group_start(i: int, mode: str) -> int:
    """Start index of node i's beta softmax group.

    mode="reference" replicates the reference exactly (senas_search.py
    :215-220 and :255-259): `offset = len(betas_dn)` there is the length of
    a list of per-node TENSORS, i.e. the loop index — so the groups are
    [0:2], [1:4], [2:6], ... — overlapping, and the last raw betas are never
    read. mode="grouped" is the evident intent (disjoint per-node groups
    [0:2], [2:5], [5:9], ...). The default preserves reference behavior so
    identical raw arch params produce identical genotypes.
    """
    if mode == "reference":
        return i
    if mode == "grouped":
        return sum(2 + j for j in range(i))
    raise ValueError(f"unknown beta_mode {mode!r}")


def _group_softmax(beta: jax.Array, meta_node_num: int,
                   beta_mode: str = "reference") -> jax.Array:
    """Per-node-group softmax over edge betas (groups of size 2, 3, 4, ...)."""
    parts = []
    for i in range(meta_node_num):
        start = _beta_group_start(i, beta_mode)
        parts.append(jax.nn.softmax(beta[start:start + 2 + i]))
    return jnp.concatenate(parts, axis=0)


def normalize_arch(arch: Dict[str, jax.Array], meta_node_num: int,
                   beta_mode: str = "reference") -> Dict[str, jax.Array]:
    """Softmax all architecture parameters (NAS.forward, :248-260)."""
    alphas_dn_nm = jax.nn.softmax(arch["alphas_dn_nm"], axis=-1)
    alphas_up_nm = (
        jax.nn.softmax(arch["alphas_up_nm"], axis=-1)
        if "alphas_up_nm" in arch else alphas_dn_nm
    )
    return {
        "alphas_dn_nm": alphas_dn_nm,
        "alphas_up_nm": alphas_up_nm,
        "alphas_dn": jax.nn.softmax(arch["alphas_dn"], axis=-1),
        "alphas_up": jax.nn.softmax(arch["alphas_up"], axis=-1),
        "betas_dn": _group_softmax(arch["betas_dn"], meta_node_num, beta_mode),
        "betas_up": _group_softmax(arch["betas_up"], meta_node_num, beta_mode),
        "gamma": jax.nn.softmax(arch["gamma"], axis=-1),
    }


class SearchHead(nn.Module):
    """Up cell + segmentation conv (senas_search.py:5-13)."""

    meta_node_num: int
    double_down: int
    c_in0: int
    c_in1: int
    nclass: int
    dtype: Optional[Any] = None
    fused: bool = True
    # the (possibly nn.remat-wrapped) cell class — SenasSearch passes its
    # own so remat=True covers EVERY cell, the head's included
    cell_cls: Optional[Any] = None

    def setup(self):
        Cell = self.cell_cls or (FusedSearchCell if self.fused else SearchCell)
        self.up_cell = Cell(self.meta_node_num, self.double_down, self.c_in0,
                            self.c_in1, self.c_in1, "up", dtype=self.dtype)
        self.segmentation_head = ReLUConv(self.nclass, kernel_size=3, dtype=self.dtype)

    def __call__(self, s0, ot, w_up_nm, w_up, betas_up, train: bool = False):
        return self.segmentation_head(
            self.up_cell(s0, ot, w_up_nm, w_up, betas_up, train), train)


class SenasSearch(nn.Module):
    """Weight-sharing supernet macro-net (senas_search.py:16-112). NHWC.

    __call__(x, arch_weights, train) where arch_weights is the output of
    `normalize_arch` — already-softmaxed mixing weights.
    """

    in_channels: int
    c: int
    nclass: int
    depth: int
    meta_node_num: int = 3
    double_down_channel: bool = False
    supervision: bool = False
    dtype: Optional[Any] = None
    # fused=True uses the grouped-edge cell (search/fused_cell.py) — same
    # math, ~3x smaller XLA graph and wider convs; False keeps the naive
    # per-edge reference layout for cross-checking.
    fused: bool = True
    # Rematerialize per-cell activations in the backward pass (jax.checkpoint
    # via flax's lifted transform) — identical math/params, O(cells) less live
    # activation memory for the bilevel step. Config: searching.remat.
    remat: bool = False

    def setup(self):
        assert self.depth >= 2, "depth must >= 2"
        Cell = FusedSearchCell if self.fused else SearchCell
        if self.remat:
            # static_argnums counts self as 0:
            # Cell.__call__(self, in0, in1, w_norm, w_chg, betas, train)
            Cell = nn.remat(Cell, static_argnums=(6,))
        double_down = 2 if self.double_down_channel else 1
        c_in0 = c_in1 = c_curr = self.c

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
                    Cell(self.meta_node_num, double_down, c_in0, c_in1, c_curr,
                         "down", dtype=self.dtype, name=f"down_{i}")
                )
                c_in0, c_in1 = c_in1, c_curr
        num_filters.append(down_f)
        self.down_cells = down_cells

        up_cells = {}
        for i in range(1, self.depth):
            up_f = []
            for j in range(self.depth - i):
                head_curr = num_filters[0][j][2]
                head_down = num_filters[i - 1][j + 1][2]
                head_in0 = sum(num_filters[k][j][2] for k in range(i))
                up_f.append([head_in0, head_down, head_curr, "up"])
                up_cells[f"up_{i}_{j}"] = Cell(
                    self.meta_node_num, double_down, head_in0, head_down, head_curr,
                    "up", dtype=self.dtype, name=f"up_{i}_{j}")
            num_filters.append(up_f)
        self.up_cells = up_cells

        self.head = SearchHead(self.meta_node_num, double_down, self.c,
                               num_filters[-1][0][2], self.nclass, dtype=self.dtype,
                               fused=self.fused, cell_cls=Cell)

    def __call__(self, x, aw: Dict[str, jax.Array], train: bool = False):
        a_dn_nm, a_up_nm = aw["alphas_dn_nm"], aw["alphas_up_nm"]
        a_dn, a_up = aw["alphas_dn"], aw["alphas_up"]
        b_dn, b_up, gamma = aw["betas_dn"], aw["betas_up"], aw["gamma"]

        s0 = self.stem0(x, train)
        ot = max_pool_3x3(relu(s0), stride=2)
        ot = self.stem1_block(ot, train)
        cell_out = [ot]
        for cell in self.down_cells:
            if len(cell_out) == 1:
                ot = cell(s0, cell_out[-1], a_dn_nm, a_dn, b_dn, train)
            else:
                ot = cell(cell_out[-2], cell_out[-1], a_dn_nm, a_dn, b_dn, train)
            cell_out.append(ot)

        # decoder grid sweep with gamma-mixed dense skips (:96-107)
        for j in reversed(range(self.depth - 1)):
            for i in range(1, self.depth - j):
                ides = list(range(j, i + j))
                gamma_ides = [sum(range(k + j)) + j for k in range(1, i)]
                in0 = jnp.concatenate(
                    [cell_out[ides[0]]]
                    + [
                        cell_out[ides[k]] * gamma[idx][0].astype(x.dtype)
                        + cell_out[ides[k + 1]] * gamma[idx][1].astype(x.dtype)
                        for k, idx in enumerate(gamma_ides)
                    ],
                    axis=-1,
                )
                in1 = cell_out[i + j]
                cell_out[i + j] = self.up_cells[f"up_{i}_{j}"](
                    in0, in1, a_up_nm, a_up, b_up, train)

        if self.supervision:
            return [self.head(s0, ot, a_up_nm, a_up, b_up, train) for ot in cell_out]
        return [self.head(s0, cell_out[-1], a_up_nm, a_up, b_up, train)]


# ---------------------------------------------------------------------------
# Discretization (NAS.genotype, senas_search.py:203-244)
# ---------------------------------------------------------------------------

def _np_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def derive_genotype(arch: Dict[str, Any], meta_node_num: int, depth: int,
                    beta_mode: str = "reference") -> Genotype:
    """Discretize continuous arch params into a Genotype (host-side numpy)."""
    arch = {k: np.asarray(v, dtype=np.float64) for k, v in arch.items()}
    alphas_dn_nm = _np_softmax(arch["alphas_dn_nm"])
    alphas_up_nm = (
        _np_softmax(arch["alphas_up_nm"]) if "alphas_up_nm" in arch else alphas_dn_nm.copy()
    )
    alphas_dn = _np_softmax(arch["alphas_dn"])
    alphas_up = _np_softmax(arch["alphas_up"])

    betas_dn, betas_up = [], []
    for i in range(meta_node_num):
        start = _beta_group_start(i, beta_mode)
        betas_dn.append(_np_softmax(arch["betas_dn"][start:start + 2 + i], axis=0))
        betas_up.append(_np_softmax(arch["betas_up"][start:start + 2 + i], axis=0))
    betas_dn = np.concatenate(betas_dn)
    betas_up = np.concatenate(betas_up)

    alphas_dn_nm = alphas_dn_nm * betas_dn[:, None]
    alphas_dn = alphas_dn * betas_dn[:, None]
    alphas_up_nm = alphas_up_nm * betas_up[:, None]
    alphas_up = alphas_up * betas_up[:, None]

    parser = GenoParser(meta_node_num)
    gene_down = parser.parse(alphas_dn_nm, alphas_dn, cell_type="down")
    gene_up = parser.parse(alphas_up_nm, alphas_up, cell_type="up")
    concat = range(2, meta_node_num + 2)

    gamma = _np_softmax(arch["gamma"])
    # zero the len//2 weakest gamma[:,1] entries, then argmax each row
    order = np.argsort(gamma[:, 1], kind="stable")
    drop = set(order[: len(gamma) // 2].tolist())
    gamma_bits = gamma.argmax(1).tolist()
    gamma_bits = [g if i not in drop else 0 for i, g in enumerate(gamma_bits)]
    # path-contiguity fix: within each row of the triangular grid, once a 1
    # appears every later entry becomes 1
    rows = [gamma_bits[sum(range(i)): sum(range(i)) + i] for i in range(1, depth - 1)]
    gamma_path: List[int] = []
    for g in rows:
        if 1 in g:
            first = g.index(1)
            g = g[:first] + [1] * (len(g) - first)
        gamma_path.extend(g)

    return Genotype(down=gene_down, down_concat=concat,
                    up=gene_up, up_concat=concat, gamma=gamma_path)
