"""Real-TPU smoke test for the Pallas grouped-epilogue kernels.

Runs fwd + bwd of fused_group_epilogue at flagship-like shapes on the chip
(no interpret mode) and checks against group_epilogue_reference. This is the
lowering gate the CPU interpret tests cannot provide (Mosaic tiling rules
only apply on hardware).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from senas_tpu.ops.grouped_epilogue import (fused_group_epilogue,
                                            group_epilogue_reference)


def run_case(b, h, w, E, P, n, se_index, train, dtype):
    c = E * P
    ks = jax.random.split(jax.random.PRNGKey(0), n + 4)
    xs = [jax.random.normal(ks[i], (b, h, w, c), dtype) for i in range(n)]
    scales = [1.0 + 0.1 * jax.random.normal(ks[n], (c,)) for _ in range(n)]
    biases = [0.1 * jax.random.normal(ks[n + 1], (c,)) for _ in range(n)]
    alphas = [jnp.full((c,), 1.0 / n) for _ in range(n)]
    mid = P // 16 if P > 16 else 1
    se_w1 = 0.3 * jax.random.normal(ks[n + 2], (E, P, mid))
    se_w2 = 0.3 * jax.random.normal(ks[n + 3], (E, mid, P))
    rm = [jnp.zeros((c,)) for _ in range(n)]
    rv = [jnp.ones((c,)) for _ in range(n)]

    kw = dict(train=train, run_means=rm, run_vars=rv, se_index=se_index,
              se_w1=se_w1, se_w2=se_w2, E=E, P=P, out_dtype=dtype)

    def f_fused(xs, scales):
        y, (mu, var) = fused_group_epilogue(xs, scales, biases, alphas, **kw)
        return jnp.sum(y.astype(jnp.float32) ** 2), (y, mu, var)

    def f_ref(xs, scales):
        y = group_epilogue_reference(xs, scales, biases, alphas, **kw)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    (loss_f, (y_f, mu, var)), grads_f = jax.jit(
        jax.value_and_grad(f_fused, argnums=(0, 1), has_aux=True))(xs, scales)
    (loss_r, y_r), grads_r = jax.jit(
        jax.value_and_grad(f_ref, argnums=(0, 1), has_aux=True))(xs, scales)

    def rel_err(a_list, b_list):
        """max over tensors of max|a-b| / max|b| (gradients sum over up to
        millions of elements, so absolute error scales with the workload)."""
        worst = 0.0
        for a, b_ in zip(a_list, b_list):
            af = jnp.asarray(a, jnp.float32)
            bf = jnp.asarray(b_, jnp.float32)
            sc = float(jnp.max(jnp.abs(bf))) + 1e-6
            worst = max(worst, float(jnp.max(jnp.abs(af - bf))) / sc)
        return worst

    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-4
    rel_y = rel_err([y_f], [y_r])
    rel_gx = rel_err(grads_f[0], grads_r[0])
    rel_gs = rel_err(grads_f[1], grads_r[1])
    ok = rel_y < tol and rel_gx < 10 * tol and rel_gs < 10 * tol
    print(f"b={b} h={h} w={w} E={E} P={P} n={n} se={se_index} "
          f"train={train} {np.dtype(dtype).name}: "
          f"rel_y={rel_y:.2e} gx={rel_gx:.2e} gs={rel_gs:.2e} "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    print("backend:", jax.default_backend(), jax.devices())
    assert jax.default_backend() == "tpu", "must run on the chip"
    ok = True
    # flagship search geometry: E=3 edges x c_part=8, 5 branches + SE
    ok &= run_case(2, 64, 64, 3, 8, 5, 1, True, jnp.bfloat16)
    ok &= run_case(2, 64, 64, 3, 8, 5, 1, True, jnp.float32)
    ok &= run_case(2, 32, 32, 3, 8, 5, None, False, jnp.bfloat16)
    # BN path shape (n=1, C=32 fixed-model-like)
    ok &= run_case(4, 128, 128, 1, 32, 1, None, True, jnp.bfloat16)
    # odd H (tile fallback) + small W*C
    ok &= run_case(2, 24, 16, 2, 8, 3, None, True, jnp.float32)
    print("ALL OK" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
