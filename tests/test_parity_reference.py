"""Differential parity tests against the PyTorch reference.

Loads the reference's GenoParser (utils/genotype.py) directly and checks
that `derive_genotype(beta_mode="reference")` — softmaxes, the overlapping
beta-group quirk (senas_search.py:215-220), alpha*beta products,
discretization, and the gamma top-k/path-contiguity pass — produces
IDENTICAL genotypes from identical random architecture parameters.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from senas_tpu.core.genotype import DownOps, GenoParser, NormOps, UpOps
from senas_tpu.search.supernet import derive_genotype

pytestmark = [pytest.mark.slow, pytest.mark.parity]


@pytest.fixture(scope="module")
def ref_genotype_mod():
    """Import the reference utils/genotype.py with its `from utils import *`
    dependency replaced by the op lists it actually uses."""
    utils_stub = types.ModuleType("utils")
    utils_stub.DownOps = DownOps
    utils_stub.UpOps = UpOps
    utils_stub.NormOps = NormOps
    utils_stub.np = np  # the reference gets numpy via `from utils import *`
    utils_stub.__all__ = ["DownOps", "UpOps", "NormOps", "np"]
    saved = sys.modules.get("utils")
    sys.modules["utils"] = utils_stub
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_genotype", "/root/reference/utils/genotype.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        if saved is not None:
            sys.modules["utils"] = saved
        else:
            sys.modules.pop("utils", None)


def _rand_arch(seed: int, meta: int, depth: int):
    rs = np.random.RandomState(seed)
    k = sum(2 + i for i in range(meta))
    return {
        "alphas_dn": 1e-1 * rs.randn(k, len(DownOps)).astype(np.float32),
        "alphas_up": 1e-1 * rs.randn(k, len(UpOps)).astype(np.float32),
        "alphas_dn_nm": 1e-1 * rs.randn(k, len(NormOps)).astype(np.float32),
        "alphas_up_nm": 1e-1 * rs.randn(k, len(NormOps)).astype(np.float32),
        "betas_dn": 1e-1 * rs.randn(k).astype(np.float32),
        "betas_up": 1e-1 * rs.randn(k).astype(np.float32),
        "gamma": 1e-1 * rs.randn(sum(range(depth - 1)), 2).astype(np.float32),
    }


def _reference_genotype(arch, meta, depth, ref_mod):
    """NAS.genotype() (senas_search.py:203-244) re-run through torch ops and
    the REFERENCE GenoParser, as the ground truth."""
    F = torch.nn.functional
    t = {k: torch.tensor(v) for k, v in arch.items()}
    a_dn_nm = F.softmax(t["alphas_dn_nm"], dim=-1)
    a_dn = F.softmax(t["alphas_dn"], dim=-1)
    a_up_nm = F.softmax(t["alphas_up_nm"], dim=-1)
    a_up = F.softmax(t["alphas_up"], dim=-1)
    betas_dn, betas_up = [], []
    for i in range(meta):
        offset = len(betas_dn)  # the reference's overlapping-group quirk
        betas_dn.append(F.softmax(t["betas_dn"][offset:offset + 2 + i], dim=-1))
        betas_up.append(F.softmax(t["betas_up"][offset:offset + 2 + i], dim=-1))
    betas_dn = torch.cat(betas_dn)
    betas_up = torch.cat(betas_up)
    k = sum(2 + i for i in range(meta))
    for j in range(k):
        a_dn_nm[j] = a_dn_nm[j] * betas_dn[j].item()
        a_dn[j] = a_dn[j] * betas_dn[j].item()
        a_up_nm[j] = a_up_nm[j] * betas_up[j].item()
        a_up[j] = a_up[j] * betas_up[j].item()
    parser = ref_mod.GenoParser(meta)
    gene_down = parser.parse(a_dn_nm.numpy(), a_dn.numpy(), cell_type="down")
    gene_up = parser.parse(a_up_nm.numpy(), a_up.numpy(), cell_type="up")
    gamma = F.softmax(t["gamma"], dim=-1)
    idx = torch.topk(gamma[:, 1], len(gamma) // 2, largest=False).indices
    bits = gamma.argmax(1).tolist()
    bits = [g if i not in idx else 0 for i, g in enumerate(bits)]
    rows = [bits[sum(range(i)): sum(range(i)) + i] for i in range(1, depth - 1)]
    gamma_path = sum([(g[:g.index(1)] + [1] * len(g[g.index(1):]))
                      if (1 in g) else g for g in rows], [])
    return gene_down, gene_up, gamma_path


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_derive_genotype_matches_reference(seed, ref_genotype_mod):
    meta, depth = 3, 5
    arch = _rand_arch(seed, meta, depth)
    ours = derive_genotype(arch, meta, depth, beta_mode="reference")
    ref_down, ref_up, ref_gamma = _reference_genotype(
        arch, meta, depth, ref_genotype_mod)
    assert list(ours.down) == [(op, int(i)) for op, i in ref_down]
    assert list(ours.up) == [(op, int(i)) for op, i in ref_up]
    assert list(ours.gamma) == [int(g) for g in ref_gamma]


@pytest.mark.parametrize("cell_type", ["down", "up"])
@pytest.mark.parametrize("seed", [10, 11, 12, 13])
def test_geno_parser_matches_reference(cell_type, seed, ref_genotype_mod):
    """Our vectorized GenoParser == reference GenoParser on raw tables."""
    meta = 4
    k = sum(2 + i for i in range(meta))
    rs = np.random.RandomState(seed)
    w_norm = rs.rand(k, len(NormOps))
    w_chg = rs.rand(k, len(DownOps if cell_type == "down" else UpOps))
    ours = GenoParser(meta).parse(w_norm, w_chg, cell_type)
    theirs = ref_genotype_mod.GenoParser(meta).parse(
        w_norm.copy(), w_chg.copy(), cell_type)
    assert [(op, int(i)) for op, i in ours] == [(op, int(i)) for op, i in theirs]


def test_beta_modes_differ_on_same_params():
    """The documented deviation: grouped (disjoint) vs reference
    (overlapping) beta softmax can change the derived genotype."""
    meta, depth = 3, 5
    found_diff = False
    for seed in range(20):
        arch = _rand_arch(100 + seed, meta, depth)
        a = derive_genotype(arch, meta, depth, beta_mode="reference")
        b = derive_genotype(arch, meta, depth, beta_mode="grouped")
        if repr(a) != repr(b):
            found_diff = True
            break
    assert found_diff, "expected at least one divergent genotype in 20 seeds"
