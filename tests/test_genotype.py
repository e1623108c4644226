"""Genotype codec: string round-trip + discretization parity."""

import numpy as np
import pytest

from senas_tpu.core.genotype import Genotype, GenoParser, parse_genotype
from senas_tpu.models import geno_searched


SENAS_NODE_4_STR = (
    "Genotype(down=[('se_conv_3', 1), ('avg_pool', 0), ('dil_3_conv_5', 2), "
    "('dep_sep_conv_5', 1), ('dil_3_conv_5', 2), ('avg_pool', 0), ('avg_pool', 1), "
    "('dil_3_conv_5', 3)], down_concat=range(2, 6), up=[('up_sample', 1), "
    "('dil_3_conv_5', 0), ('dil_3_conv_5', 0), ('dil_2_conv_5', 2), ('dil_3_conv_5', 1), "
    "('dil_2_conv_5', 2), ('dep_sep_conv_3', 0), ('dil_2_conv_5', 4)], "
    "up_concat=range(2, 6), gamma=[0, 0, 0, 1, 1, 1])"
)


def test_repr_roundtrip():
    g = geno_searched.senas_node_4
    assert repr(g) == SENAS_NODE_4_STR
    assert parse_genotype(repr(g)) == g


def test_parse_builtin_genotypes():
    for g in [geno_searched.senas_node_2, geno_searched.senas_node_3,
              geno_searched.senas_node_4]:
        g2 = parse_genotype(repr(g))
        assert g2.down == g.down
        assert list(g2.down_concat) == list(g.down_concat)
        assert g2.up == g.up
        assert g2.gamma == g.gamma


def test_parse_rejects_arbitrary_code():
    with pytest.raises(ValueError):
        parse_genotype("__import__('os').system('true')")
    with pytest.raises((ValueError, SyntaxError)):
        parse_genotype("Genotype(down=open('/etc/passwd'))")


def test_geno_parser_shapes():
    """3 meta-nodes => 9 edges; parse returns 2 pairs per meta-node."""
    rng = np.random.RandomState(0)
    k = 9
    w1 = rng.rand(k, 6)
    w2 = rng.rand(k, 6)
    parser = GenoParser(3)
    for cell_type in ["down", "up"]:
        gene = parser.parse(w1, w2, cell_type)
        assert len(gene) == 6
        for op, idx in gene:
            assert isinstance(op, str) and op != "none"
            assert 0 <= idx < 5


def test_geno_parser_matches_reference_semantics():
    """Hand-checkable case: make one op dominate each edge group."""
    k, no = 9, 6
    w1 = np.full((k, no), 0.01)
    w2 = np.full((k, no), 0.01)
    # down cell, meta-node 0: edges 0,1 are DOWN ops; make edge1's op 3
    # ('dil_2_conv_5' in DownOps) dominant, and edge0's op 1 weaker
    w2[1, 3] = 0.9
    w2[0, 1] = 0.5
    gene = GenoParser(3).parse(w1, w2, "down")
    # first meta-node: both DOWN edges picked (no NORM edges exist yet)
    assert ("dil_2_conv_5", 1) in gene[:2]
    assert ("se_conv_3", 0) in gene[:2]
