"""GroupedMixedOp / FusedSearchCell with SENAS_PALLAS_EPILOGUE=1 must be a
drop-in for the unfused path: same variable tree, same outputs, same updated
running stats, same gradients (f32, interpret-mode kernels on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.ops.primitives import OpType
from senas_tpu.search.fused_cell import FusedSearchCell, GroupedMixedOp

B, HW, C_IN, P, E = 2, 8, 8, 8, 3


def _sorted_leaves(tree):
    return sorted(((jax.tree_util.keystr(p), l) for p, l in
                   jax.tree_util.tree_leaves_with_path(tree)),
                  key=lambda t: t[0])


def _alphas(key, n_ops):
    return jax.nn.softmax(jax.random.normal(key, (E, n_ops)), axis=-1)


def _mk_group(op_type):
    m = GroupedMixedOp(c_in=C_IN, c_part=P, num_edges=E, op_type=op_type)
    n_ops = len(op_type.value["ops"])
    x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, HW, C_IN))
    al = _alphas(jax.random.PRNGKey(1), n_ops)
    return m, x, al


def _apply(m, variables, x, al, train):
    out, mut = m.apply(variables, x, al, train, mutable=["batch_stats"])
    return out, mut["batch_stats"]


@pytest.mark.parametrize("op_type", [OpType.NORM, OpType.DOWN, OpType.UP])
@pytest.mark.parametrize("train", [True, False])
def test_group_equivalence(op_type, train, monkeypatch):
    m, x, al = _mk_group(op_type)
    monkeypatch.delenv("SENAS_PALLAS_EPILOGUE", raising=False)
    variables = m.init(jax.random.PRNGKey(2), x, al, True)
    if not train:
        # advance the stats once so eval mode uses non-trivial running stats
        _, bs = _apply(m, variables, x, al, True)
        variables = {"params": variables["params"], "batch_stats": bs}
    out0, bs0 = _apply(m, variables, x, al, train)
    monkeypatch.setenv("SENAS_PALLAS_EPILOGUE", "1")
    out1, bs1 = _apply(m, variables, x, al, train)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=2e-5, atol=2e-5)
    for (p0, l0), (p1, l1) in zip(_sorted_leaves(bs0), _sorted_leaves(bs1)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"batch_stats {p0}")


def test_variable_tree_identical(monkeypatch):
    """Init under the gate produces the same tree (checkpoint compat)."""
    m, x, al = _mk_group(OpType.DOWN)
    monkeypatch.delenv("SENAS_PALLAS_EPILOGUE", raising=False)
    v0 = m.init(jax.random.PRNGKey(2), x, al, True)
    monkeypatch.setenv("SENAS_PALLAS_EPILOGUE", "1")
    v1 = m.init(jax.random.PRNGKey(2), x, al, True)
    s0 = {jax.tree_util.keystr(p): l.shape
          for p, l in jax.tree_util.tree_leaves_with_path(v0)}
    s1 = {jax.tree_util.keystr(p): l.shape
          for p, l in jax.tree_util.tree_leaves_with_path(v1)}
    assert s0 == s1


@pytest.mark.parametrize("op_type", [OpType.NORM, OpType.DOWN])
def test_group_gradient_equivalence(op_type, monkeypatch):
    m, x, al = _mk_group(op_type)
    monkeypatch.delenv("SENAS_PALLAS_EPILOGUE", raising=False)
    variables = m.init(jax.random.PRNGKey(2), x, al, True)
    out_shape = m.apply(variables, x, al, True,
                        mutable=["batch_stats"])[0].shape
    readout = jax.random.normal(jax.random.PRNGKey(3), out_shape)

    def loss(params, al):
        out, _ = m.apply({"params": params, **{k: v for k, v in
                                               variables.items()
                                               if k != "params"}},
                         x, al, True, mutable=["batch_stats"])
        return jnp.sum(out * readout)

    g0 = jax.grad(loss, argnums=(0, 1))(variables["params"], al)
    monkeypatch.setenv("SENAS_PALLAS_EPILOGUE", "1")
    g1 = jax.grad(loss, argnums=(0, 1))(variables["params"], al)
    for (p0, l0), (p1, l1) in zip(_sorted_leaves(g0), _sorted_leaves(g1)):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l0), rtol=5e-4, atol=5e-5,
            err_msg=f"grad {jax.tree_util.keystr(p0)}")


@pytest.mark.slow
def test_full_cell_equivalence(monkeypatch):
    """A whole FusedSearchCell (groups + inner vmapped edges + pre/post
    blocks) matches with the gate on."""
    M = 3
    cell = FusedSearchCell(meta_node_num=M, double_down=1, c_in0=16,
                           c_in1=16, c_out=32, cell_type="down")
    n_edges = sum(2 + i for i in range(M))
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(0), 5)
    in0 = jax.random.normal(k1, (B, 2 * HW, 2 * HW, 16))
    in1 = jax.random.normal(k2, (B, HW, HW, 16))
    wn = jax.nn.softmax(jax.random.normal(k3, (n_edges, 6)), axis=-1)
    wc = jax.nn.softmax(jax.random.normal(k4, (n_edges, 6)), axis=-1)
    betas = jax.nn.sigmoid(jax.random.normal(k5, (n_edges,)))

    monkeypatch.delenv("SENAS_PALLAS_EPILOGUE", raising=False)
    variables = cell.init(jax.random.PRNGKey(9), in0, in1, wn, wc, betas, True)
    out0, mut0 = cell.apply(variables, in0, in1, wn, wc, betas, True,
                            mutable=["batch_stats"])
    monkeypatch.setenv("SENAS_PALLAS_EPILOGUE", "1")
    out1, mut1 = cell.apply(variables, in0, in1, wn, wc, betas, True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=5e-5, atol=5e-5)
    for (p0, l0), (p1, l1) in zip(_sorted_leaves(mut0["batch_stats"]),
                                  _sorted_leaves(mut1["batch_stats"])):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=2e-5, atol=1e-6)
