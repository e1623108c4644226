"""Genotype codec: the serialized architecture format.

Parity notes (vs reference /root/reference/utils/genotype.py):
  * `Genotype` is the same 5-field namedtuple (down, down_concat, up,
    up_concat, gamma); its `repr` round-trips byte-identically with the
    reference strings (README genotype strings, geno_searched.py), because
    namedtuple/list/tuple/range reprs are stable across both codebases.
  * `GenoParser.parse` reproduces the reference discretization
    (utils/genotype.py:13-90) exactly, including weight-rescaling when the
    normal/change op-set sizes differ and the final global top-2 selection.
  * `parse_genotype` replaces the reference's `eval()` of user-supplied
    genotype strings (experiments/train_model.py:117-120) with a restricted
    AST interpreter: only Genotype(...), range(...), tuples, lists, strings
    and numbers are accepted.
"""

from __future__ import annotations

import ast
from collections import namedtuple

import numpy as np

Genotype = namedtuple("Genotype", ["down", "down_concat", "up", "up_concat", "gamma"])

# Candidate-op vocabularies. Order is load-bearing: alpha columns index into
# these lists (reference utils/operations.py:23-48).
DownOps = [
    "avg_pool",
    "se_conv_3",
    "dil_3_conv_5",
    "dil_2_conv_5",
    "dep_sep_conv_3",
    "dep_sep_conv_5",
]

UpOps = [
    "up_sample",
    "se_conv_3",
    "dil_3_conv_5",
    "dil_2_conv_5",
    "dep_sep_conv_3",
    "dep_sep_conv_5",
]

NormOps = [
    "identity",
    "none",
    "dil_3_conv_5",
    "dil_2_conv_5",
    "dep_sep_conv_3",
    "dep_sep_conv_5",
]


class GenoParser:
    """Discretizes continuous architecture weights into a gene list.

    ``parse(weights1, weights2, cell_type)`` consumes the (beta-scaled,
    softmaxed) alpha tables — weights1 for NORM edges, weights2 for the
    DOWN/UP (resolution-changing) edges — and emits, per meta-node, the two
    strongest (op_name, input_index) pairs.
    """

    def __init__(self, meta_node_num: int = 4):
        self._meta_node_num = meta_node_num

    def parse(self, weights1, weights2, cell_type: str):
        weights1 = np.asarray(weights1)
        weights2 = np.asarray(weights2)
        gene = []
        n = 2  # number of candidate inputs for the current meta-node
        start = 0
        inp2changedim = 2 if cell_type == "down" else 1
        nc, _ = weights1.shape
        for _ in range(self._meta_node_num):
            normal_op_end = start + n
            up_or_down_op_end = start + inp2changedim

            mask1 = np.zeros(nc, dtype=bool)
            mask2 = np.zeros(nc, dtype=bool)

            if cell_type == "down":
                # down cell: the first two edges are DOWN ops, the rest NORM
                mask1[up_or_down_op_end:normal_op_end] = True
                mask2[start:up_or_down_op_end] = True
            else:
                # up cell: edge 0 (horizontal input) is NORM, edge 1 is UP,
                # inner edges are NORM
                mask1[up_or_down_op_end + 1 : normal_op_end] = True
                mask1[start:up_or_down_op_end] = True
                mask2[up_or_down_op_end] = True

            W1 = weights1[mask1].copy()  # normal edges
            W2 = weights2[mask2].copy()  # down or up edges
            gene_item1, gene_item2 = [], []

            if len(W2) >= 1:
                cell_primitive = UpOps if cell_type == "up" else DownOps
                edges2 = sorted(
                    range(inp2changedim),
                    key=lambda x: -max(
                        W2[x][k] for k in range(len(W2[x])) if cell_primitive[k] != "none"
                    ),
                )[: min(len(W2), 2)]
                for j in edges2:
                    k_best = None
                    for k in range(len(W2[j])):
                        if cell_primitive[k] != "none":
                            if k_best is None or W2[j][k] > W2[j][k_best]:
                                k_best = k
                    gene_item2.append(
                        (
                            W2[j][k_best],
                            cell_primitive[k_best],
                            j if cell_type == "down" else j + 1,
                        )
                    )

            if len(W1) > 0:
                cell_primitive = NormOps
                edges1 = sorted(
                    range(len(W1)),
                    key=lambda x: -max(
                        W1[x][k] for k in range(len(W1[x])) if cell_primitive[k] != "none"
                    ),
                )[: min(len(W1), 2)]
                for j in edges1:
                    k_best = None
                    for k in range(len(W1[j])):
                        if cell_primitive[k] != "none":
                            if k_best is None or W1[j][k] > W1[j][k_best]:
                                k_best = k
                    gene_item1.append(
                        (
                            W1[j][k_best],
                            cell_primitive[k_best],
                            0 if j == 0 and cell_type == "up" else j + inp2changedim,
                        )
                    )

            # Rescale when the two op-set sizes differ so the strengths are
            # comparable before the global top-2 pick.
            if len(W1) > 0 and len(W2) > 0 and len(W1[0]) != len(W2[0]):
                normalize_scale = min(len(W1[0]), len(W2[0])) / max(len(W1[0]), len(W2[0]))
                if len(W1[0]) > len(W2[0]):
                    gene_item2 = [(w * normalize_scale, po, fid) for (w, po, fid) in gene_item2]
                else:
                    gene_item1 = [(w * normalize_scale, po, fid) for (w, po, fid) in gene_item1]

            gene_item1 += gene_item2
            gene += [(po, fid) for (_, po, fid) in sorted(gene_item1)[-2:]]

            start = normal_op_end
            n += 1
        return gene


# ---------------------------------------------------------------------------
# Safe genotype-string parsing (replacement for the reference's eval()).
# ---------------------------------------------------------------------------

def _eval_node(node):
    if isinstance(node, ast.Expression):
        return _eval_node(node.body)
    if isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name):
            raise ValueError(f"unsupported call in genotype string: {ast.dump(node)}")
        name = node.func.id
        if name == "Genotype":
            kwargs = {kw.arg: _eval_node(kw.value) for kw in node.keywords}
            args = [_eval_node(a) for a in node.args]
            return Genotype(*args, **kwargs)
        if name == "range":
            args = [_eval_node(a) for a in node.args]
            return range(*args)
        raise ValueError(f"unsupported function {name!r} in genotype string")
    if isinstance(node, ast.List):
        return [_eval_node(e) for e in node.elts]
    if isinstance(node, ast.Tuple):
        return tuple(_eval_node(e) for e in node.elts)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (str, int, float)):
            return node.value
        raise ValueError(f"unsupported constant {node.value!r}")
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        v = _eval_node(node.operand)
        if isinstance(v, (int, float)):
            return -v
        raise ValueError("unsupported unary operand")
    raise ValueError(f"unsupported syntax in genotype string: {ast.dump(node)}")


def parse_genotype(text: str) -> Genotype:
    """Parse a genotype repr string (e.g. from geno_searched or a CLI flag).

    Accepts exactly the format produced by ``repr(Genotype(...))``:
    Genotype(down=[('op', idx), ...], down_concat=range(2, 6), ...).
    """
    tree = ast.parse(text.strip(), mode="eval")
    result = _eval_node(tree)
    if not isinstance(result, Genotype):
        raise ValueError("genotype string did not evaluate to a Genotype")
    return result
