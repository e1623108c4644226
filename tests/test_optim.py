"""Optimizers / schedulers: torch-parity numerics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from senas_tpu.train.optim import (build_optimizer, build_scheduler,
                                   get_learning_rate, set_learning_rate)


def _run_steps(tx, params, grads_seq):
    state = tx.init(params)
    out = params
    for g in grads_seq:
        updates, state = tx.update(g, state, out)
        out = optax.apply_updates(out, updates)
    return out, state


class TestOptimizers:
    def test_sgd_matches_torch(self):
        import torch
        p0 = np.array([1.0, -2.0, 3.0], np.float32)
        grads = [np.array([0.1, 0.2, -0.3], np.float32),
                 np.array([-0.05, 0.1, 0.2], np.float32)]
        lr, mom, wd = 0.1, 0.9, 0.01

        tx = build_optimizer({"name": "sgd", "lr": lr, "momentum": mom,
                              "weight_decay": wd})
        ours, _ = _run_steps(tx, {"w": jnp.asarray(p0)},
                             [{"w": jnp.asarray(g)} for g in grads])

        tp = torch.tensor(p0, requires_grad=True)
        opt = torch.optim.SGD([tp], lr=lr, momentum=mom, weight_decay=wd)
        for g in grads:
            opt.zero_grad()
            tp.grad = torch.tensor(g)
            opt.step()
        np.testing.assert_allclose(np.asarray(ours["w"]), tp.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_adam_matches_torch(self):
        import torch
        p0 = np.array([0.5, -1.5], np.float32)
        grads = [np.array([0.3, -0.2], np.float32)] * 3
        lr, wd, betas = 1e-3, 1e-3, (0.5, 0.999)

        tx = build_optimizer({"name": "adam", "lr": lr, "weight_decay": wd,
                              "betas": betas})
        ours, _ = _run_steps(tx, {"w": jnp.asarray(p0)},
                             [{"w": jnp.asarray(g)} for g in grads])

        tp = torch.tensor(p0, requires_grad=True)
        opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd, betas=betas)
        for g in grads:
            opt.zero_grad()
            tp.grad = torch.tensor(g)
            opt.step()
        np.testing.assert_allclose(np.asarray(ours["w"]), tp.detach().numpy(),
                                   rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("name", ["adamax", "adadelta", "adagrad", "rmsprop",
                                      "asgd", "adabound"])
    def test_all_optimizers_step(self, name):
        tx = build_optimizer({"name": name, "lr": 1e-2})
        p = {"w": jnp.ones(3)}
        out, _ = _run_steps(tx, p, [{"w": jnp.ones(3) * 0.1}])
        assert np.all(np.isfinite(np.asarray(out["w"])))
        assert float(jnp.abs(out["w"] - p["w"]).max()) > 0

    def test_lr_injection(self):
        tx = build_optimizer({"name": "sgd", "lr": 0.1})
        state = tx.init({"w": jnp.ones(2)})
        assert get_learning_rate(state) == pytest.approx(0.1)
        set_learning_rate(state, 0.05)
        updates, _ = tx.update({"w": jnp.ones(2)}, state, {"w": jnp.ones(2)})
        np.testing.assert_allclose(np.asarray(updates["w"]), -0.05, rtol=1e-6)


class TestSchedulers:
    def test_cosine_matches_formula(self):
        sched = build_scheduler(0.1, {"name": "cos", "T_max": 100})
        for e in [0, 25, 50, 100]:
            expected = 0.5 * 0.1 * (1 + math.cos(math.pi * e / 100))
            assert sched(e) == pytest.approx(expected)

    def test_step_multistep_exp(self):
        s = build_scheduler(1.0, {"name": "step_lr", "step_size": 10, "gamma": 0.5})
        assert s(0) == 1.0 and s(10) == 0.5 and s(25) == 0.25
        s = build_scheduler(1.0, {"name": "multi_step", "milestones": [5, 15],
                                  "gamma": 0.1})
        assert s(0) == 1.0 and s(5) == pytest.approx(0.1) and s(20) == pytest.approx(0.01)
        s = build_scheduler(1.0, {"name": "exp_lr", "gamma": 0.9})
        assert s(2) == pytest.approx(0.81)

    def test_warmup(self):
        s = build_scheduler(1.0, {"name": "constant_lr", "warmup_iters": 10,
                                  "warmup_factor": 0.2})
        assert s(0) == pytest.approx(0.2)
        assert s(5) == pytest.approx(0.2 * 0.5 + 0.5)
        assert s(10) == 1.0

    def test_none_gives_constant(self):
        s = build_scheduler(0.3, None)
        assert s(7) == 0.3
