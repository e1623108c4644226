"""primitives.BatchNorm with SENAS_PALLAS_BN=1 must match the XLA path
exactly: forward (train + eval), running-stat updates, gradients, vmapped
use (the fused cell's inner MixedOps are nn.vmap'd), and a whole fixed
SenasModel training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.ops.primitives import BatchNorm

B, H, W, C = 3, 8, 6, 24


def _bn_apply(variables, x, train, dtype=None):
    m = BatchNorm(dtype=dtype)
    out, mut = m.apply(variables, x, not train, mutable=["batch_stats"])
    return out, mut["batch_stats"]


@pytest.fixture
def bn_vars():
    m = BatchNorm()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
    v = m.init(jax.random.PRNGKey(1), x, False)
    # non-trivial scale/bias/running stats
    v = {
        "params": {"scale": 1.0 + 0.1 * jnp.arange(C, dtype=jnp.float32),
                   "bias": 0.05 * jnp.arange(C, dtype=jnp.float32)},
        "batch_stats": {"mean": 0.02 * jnp.arange(C, dtype=jnp.float32),
                        "var": 1.0 + 0.03 * jnp.arange(C, dtype=jnp.float32)},
    }
    return v, x


@pytest.mark.parametrize("train", [True, False])
def test_forward_and_stats(bn_vars, train, monkeypatch):
    v, x = bn_vars
    monkeypatch.delenv("SENAS_PALLAS_BN", raising=False)
    out0, bs0 = _bn_apply(v, x, train)
    monkeypatch.setenv("SENAS_PALLAS_BN", "1")
    out1, bs1 = _bn_apply(v, x, train)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(bs1[k]), np.asarray(bs0[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_gradients(bn_vars, monkeypatch):
    v, x = bn_vars
    readout = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C))

    def loss(params, x):
        out, _ = BatchNorm().apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, False,
            mutable=["batch_stats"])
        return jnp.sum(out * readout)

    monkeypatch.delenv("SENAS_PALLAS_BN", raising=False)
    g0 = jax.grad(loss, argnums=(0, 1))(v["params"], x)
    monkeypatch.setenv("SENAS_PALLAS_BN", "1")
    g1 = jax.grad(loss, argnums=(0, 1))(v["params"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_bf16_output_dtype(bn_vars, monkeypatch):
    v, x = bn_vars
    xb = x.astype(jnp.bfloat16)
    monkeypatch.delenv("SENAS_PALLAS_BN", raising=False)
    out0, _ = _bn_apply(v, xb, True, dtype=jnp.bfloat16)
    monkeypatch.setenv("SENAS_PALLAS_BN", "1")
    out1, _ = _bn_apply(v, xb, True, dtype=jnp.bfloat16)
    assert out1.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               np.asarray(out0, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_non4d_falls_back(bn_vars, monkeypatch):
    monkeypatch.setenv("SENAS_PALLAS_BN", "1")
    m = BatchNorm()
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C))
    v = m.init(jax.random.PRNGKey(1), x, False)
    out, _ = m.apply(v, x, False, mutable=["batch_stats"])
    assert out.shape == (B, C)


def test_vmapped_bn(monkeypatch):
    """nn.vmap'd modules (fused-cell inner MixedOps) wrap BN in a vmap —
    the pallas path must batch correctly."""
    from flax import linen as nn

    Vm = nn.vmap(BatchNorm, in_axes=(0, None), out_axes=0,
                 variable_axes={"params": 0, "batch_stats": 0},
                 split_rngs={"params": True})
    x = jax.random.normal(jax.random.PRNGKey(0), (4, B, H, W, C))
    m = Vm()
    monkeypatch.delenv("SENAS_PALLAS_BN", raising=False)
    v = m.init(jax.random.PRNGKey(1), x, False)
    out0, bs0 = m.apply(v, x, False, mutable=["batch_stats"])
    monkeypatch.setenv("SENAS_PALLAS_BN", "1")
    out1, bs1 = m.apply(v, x, False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs0),
                    jax.tree_util.tree_leaves(bs1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fixed_model_train_step_equivalence(monkeypatch):
    """One jitted fixed-train step on SenasModel: loss and grads match with
    the BN gate on."""
    from senas_tpu.models.geno_searched import senas_node_4
    from senas_tpu.models.senas_model import SenasModel
    from senas_tpu.train.loss import build_loss

    monkeypatch.delenv("SENAS_PALLAS_BN", raising=False)
    model = SenasModel(nclass=2, in_channels=1, c=8, depth=3,
                       genotype=senas_node_4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 1))
    yl = jax.random.randint(jax.random.PRNGKey(1), (2, 32, 32), 0, 2)
    variables = model.init({"params": jax.random.PRNGKey(2)}, x, False)
    loss_fn = build_loss("dice_ce")

    def step(params):
        def loss(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return loss_fn(logits[0], yl), mut["batch_stats"]
        (l, bs), g = jax.value_and_grad(loss, has_aux=True)(params)
        return l, g, bs

    l0, g0, bs0 = step(variables["params"])
    monkeypatch.setenv("SENAS_PALLAS_BN", "1")
    l1, g1, bs1 = step(variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(bs0),
                    jax.tree_util.tree_leaves(bs1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
