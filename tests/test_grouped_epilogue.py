"""Equivalence tests for the Pallas fused GroupedMixedOp epilogue.

Runs the kernels in interpret mode (CPU) against the pure-jnp reference
`group_epilogue_reference`, which mirrors the unfused module path
(fused_cell.py grouped_bn + se_epilogue + alpha einsum). Covers forward,
batch-stat outputs, and gradients w.r.t. every differentiable input, in
train and eval mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.ops.grouped_epilogue import (
    fused_group_epilogue,
    group_epilogue_reference,
)

B, H, W, E, P = 2, 8, 4, 3, 8
C = E * P
N = 4           # branches with tensors
SE_IDX = 1
MID = 1


def _mk(key, dtype=jnp.float32, se=True, none=True):
    ks = jax.random.split(key, 16)
    xs = [jax.random.normal(ks[i], (B, H, W, C), dtype) * (1.0 + i)
          for i in range(N)]
    scales = [1.0 + 0.1 * jax.random.normal(ks[4 + i], (C,)) for i in range(N)]
    biases = [0.1 * jax.random.normal(ks[8 + i], (C,)) for i in range(N)]
    # per-edge alpha broadcast across P channels, like alphas[:, o] repeat
    al_edge = jax.nn.softmax(jax.random.normal(ks[12], (N + 1, E)), axis=0)
    alphas = [jnp.repeat(al_edge[o], P) for o in range(N)]
    kw = {}
    if se:
        kw.update(se_index=SE_IDX,
                  se_w1=jax.random.normal(ks[13], (E, P, MID)) * 0.3,
                  se_w2=jax.random.normal(ks[14], (E, MID, P)) * 0.3,
                  E=E, P=P)
    if none:
        kw.update(none_alpha_col=jnp.repeat(al_edge[N], P),
                  none_bias=0.1 * jax.random.normal(ks[15], (C,)))
    return xs, scales, biases, alphas, kw


@pytest.mark.parametrize("se,none", [(True, True), (False, False),
                                     (True, False), (False, True)])
def test_forward_equivalence_f32(se, none):
    xs, scales, biases, alphas, kw = _mk(jax.random.PRNGKey(0), se=se, none=none)
    want = group_epilogue_reference(xs, scales, biases, alphas, **kw)
    got, (mu, var) = fused_group_epilogue(xs, scales, biases, alphas,
                                          interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # batch stats match the two-pass module computation
    for o in range(N):
        xf = xs[o].astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(mu[o]),
                                   np.asarray(jnp.mean(xf, axis=(0, 1, 2))),
                                   rtol=1e-5, atol=1e-6)
        ref_var = jnp.mean(jnp.square(xf - jnp.mean(xf, axis=(0, 1, 2))),
                           axis=(0, 1, 2))
        np.testing.assert_allclose(np.asarray(var[o]), np.asarray(ref_var),
                                   rtol=1e-4, atol=1e-5)


def test_forward_equivalence_bf16():
    xs, scales, biases, alphas, kw = _mk(jax.random.PRNGKey(1), jnp.bfloat16)
    want = group_epilogue_reference(xs, scales, biases, alphas, **kw)
    got, _ = fused_group_epilogue(xs, scales, biases, alphas,
                                  interpret=True, **kw)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_forward_equivalence_eval_mode():
    xs, scales, biases, alphas, kw = _mk(jax.random.PRNGKey(2))
    rm = [0.05 * jax.random.normal(jax.random.PRNGKey(10 + o), (C,))
          for o in range(N)]
    rv = [1.0 + 0.1 * jax.random.uniform(jax.random.PRNGKey(20 + o), (C,))
          for o in range(N)]
    want = group_epilogue_reference(xs, scales, biases, alphas,
                                    train=False, run_means=rm, run_vars=rv,
                                    **kw)
    got, _ = fused_group_epilogue(xs, scales, biases, alphas,
                                  train=False, run_means=rm, run_vars=rv,
                                  interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _loss_args(fn, readout, train=True, rm=None, rv=None):
    def loss(xs, scales, biases, alphas, se_w1, se_w2, none_a, none_b):
        kw = dict(se_index=SE_IDX, se_w1=se_w1, se_w2=se_w2, E=E, P=P,
                  none_alpha_col=none_a, none_bias=none_b)
        if not train:
            kw.update(train=False, run_means=rm, run_vars=rv)
        out = fn(xs, scales, biases, alphas, **kw)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32) * readout)
    return loss


@pytest.mark.parametrize("train", [True, False])
def test_gradient_equivalence(train):
    xs, scales, biases, alphas, kw = _mk(jax.random.PRNGKey(3))
    readout = jax.random.normal(jax.random.PRNGKey(99), (B, H, W, C))
    rm = [0.05 * jnp.ones((C,)) * (o + 1) for o in range(N)]
    rv = [1.0 + 0.05 * o + jnp.zeros((C,)) for o in range(N)]
    args = (xs, scales, biases, alphas, kw["se_w1"], kw["se_w2"],
            kw["none_alpha_col"], kw["none_bias"])

    import functools
    fused = functools.partial(fused_group_epilogue, interpret=True)
    g_ref = jax.grad(_loss_args(group_epilogue_reference, readout,
                                train=train, rm=rm, rv=rv),
                     argnums=tuple(range(8)))(*args)
    g_fus = jax.grad(_loss_args(fused, readout, train=train, rm=rm, rv=rv),
                     argnums=tuple(range(8)))(*args)
    names = ["xs", "scales", "biases", "alphas", "se_w1", "se_w2",
             "none_alpha", "none_bias"]
    for name, a, b in zip(names, g_ref, g_fus):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        for la, lb in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(lb), np.asarray(la), rtol=2e-4, atol=2e-5,
                err_msg=f"grad mismatch for {name} (train={train})")


def test_jit_and_value_and_grad_compose():
    xs, scales, biases, alphas, kw = _mk(jax.random.PRNGKey(4))

    @jax.jit
    def step(xs, scales, biases, alphas, sw1, sw2, na, nb):
        def loss(xs_):
            out, (mu, var) = fused_group_epilogue(
                xs_, scales, biases, alphas, se_index=SE_IDX, se_w1=sw1,
                se_w2=sw2, E=E, P=P, none_alpha_col=na, none_bias=nb,
                interpret=True)
            return jnp.sum(out ** 2), (mu, var)
        (l, (mu, var)), g = jax.value_and_grad(loss, has_aux=True)(xs)
        return l, g, mu, var

    l, g, mu, var = step(xs, scales, biases, alphas, kw["se_w1"], kw["se_w2"],
                         kw["none_alpha_col"], kw["none_bias"])
    assert np.isfinite(float(l))
    assert len(g) == N and g[0].shape == xs[0].shape
    assert mu.shape == (N, C) and var.shape == (N, C)


def test_odd_height_tile_fallback():
    """H not divisible by 16 exercises the smaller sublane tiles."""
    key = jax.random.PRNGKey(5)
    xs = [jax.random.normal(jax.random.fold_in(key, i), (B, 6, W, C))
          for i in range(2)]
    scales = [jnp.ones((C,))] * 2
    biases = [jnp.zeros((C,))] * 2
    alphas = [jnp.full((C,), 0.5)] * 2
    want = group_epilogue_reference(xs, scales, biases, alphas)
    got, _ = fused_group_epilogue(xs, scales, biases, alphas, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
