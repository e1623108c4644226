"""Jit-compiled train/eval steps and train states.

Design (TPU-first, SURVEY.md §7):
  * One jitted step per workload; the host loop does epochs/early-stopping/
    logging only. No data-dependent Python control flow inside jit.
  * Fixed-model training: `FixedTrainState` + `make_train_step` /
    `make_eval_step`. The step donates its state buffers, so params/opt-state
    live device-resident across the whole run.
  * Supernet search: `SearchTrainState` carries net weights + batch stats +
    arch params + two optimizer states. `make_search_step` fuses the
    reference's per-batch sequence — arch step on a val batch, then weight
    step on a train batch (experiments/search_arc.py:268-293) — into ONE
    compiled program (two traces: with/without the arch update, selected by
    the static `do_arch` flag that the host flips at epoch `alpha_begin`).
  * Gradient clipping matches clip_grad_norm_(max_norm=5) on the weight
    gradients only (search_arc.py:282, train_model.py's equivalent).
  * Learning-rate schedules are injected via optax.inject_hyperparams
    (see optim.py) and reassigned between epochs on the host.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax
from flax import struct

from senas_tpu.train.metrics import confusion_counts, mean_pix_accuracy


def global_norm(tree) -> jax.Array:
    # (A raveled single-reduction variant was tried; measured no device-time
    # win on the chip — the per-param reduce kernels were not the bottleneck
    # — and the ravel/unravel copies slowed the search step. Keep tree form.)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(tree)))


def clip_by_global_norm(tree, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics (clip, do not normalize)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda x: x * scale, tree), norm


# ---------------------------------------------------------------------------
# Fixed-model training
# ---------------------------------------------------------------------------

class FixedTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array  # dropout rng chain, split per step

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation,
               rng: Optional[jax.Array] = None):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros([], jnp.int32),
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )


def make_train_step(apply_fn: Callable, loss_fn: Callable,
                    tx: optax.GradientTransformation, grad_clip: float = 0.0,
                    donate: bool = True):
    """Returns jitted step(state, batch) -> (state, metrics).

    batch: dict with 'image' [B,H,W,C_in] and 'label' [B,H,W] int.
    apply_fn(variables, x, train, mutable) must return (outputs, mutated).
    """

    def step(state: FixedTrainState, batch):
        next_rng, dropout_rng = jax.random.split(state.rng)

        def loss_and_aux(params):
            outputs, mutated = apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            loss = loss_fn(outputs, batch["label"])
            return loss, (outputs, mutated["batch_stats"])

        (loss, (outputs, new_stats)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        if grad_clip and grad_clip > 0:
            grads, gnorm = clip_by_global_norm(grads, grad_clip)
        else:
            gnorm = global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        last = outputs[-1] if isinstance(outputs, (list, tuple)) else outputs
        tp, fp, fn = confusion_counts(last, batch["label"])
        metrics = {
            "loss": loss, "grad_norm": gnorm,
            "tp": tp, "fp": fp, "fn": fn,
            "acc": mean_pix_accuracy(last, batch["label"]),
        }
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt, step=state.step + 1,
                                  rng=next_rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, loss_fn: Callable):
    """Jitted eval step: no-grad forward with running BN stats."""

    def step(params, batch_stats, batch):
        outputs = apply_fn({"params": params, "batch_stats": batch_stats},
                           batch["image"], False, mutable=False)
        loss = loss_fn(outputs, batch["label"])
        last = outputs[-1] if isinstance(outputs, (list, tuple)) else outputs
        tp, fp, fn = confusion_counts(last, batch["label"])
        return {
            "loss": loss, "tp": tp, "fp": fp, "fn": fn,
            "acc": mean_pix_accuracy(last, batch["label"]),
            # serving path: class ids fit in uint8 (<=255 classes) — packing
            # on-device cuts the host transfer 4x vs int32 argmax
            # (testing_model.py:172-178 consumes these as PNG masks)
            "pred": jnp.argmax(last, axis=-1).astype(jnp.uint8),
        }

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Supernet bilevel search
# ---------------------------------------------------------------------------

class SearchTrainState(struct.PyTreeNode):
    params: Any           # supernet weights
    batch_stats: Any
    arch: Any             # dict of alpha/beta/gamma tables
    w_opt_state: Any
    a_opt_state: Any
    step: jax.Array
    rng: jax.Array  # dropout rng chain, split per step

    @classmethod
    def create(cls, variables, arch, w_tx, a_tx, rng: Optional[jax.Array] = None,
               arch_in_weight_step: bool = True):
        """arch_in_weight_step must match the make_search_step flag: the
        reference's model_optimizer is built over model.parameters(), which
        INCLUDES the seven arch tables (search_arc.py:135,
        senas_search.py:145-154 nn.Parameter), so the weight optimizer state
        spans (params, arch) jointly in the default reference mode."""
        params = variables["params"]
        w_target = (params, arch) if arch_in_weight_step else params
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            arch=arch,
            w_opt_state=w_tx.init(w_target),
            a_opt_state=a_tx.init(arch),
            step=jnp.zeros([], jnp.int32),
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )


def make_search_step(apply_fn: Callable, normalize_fn: Callable, loss_fn: Callable,
                     w_tx: optax.GradientTransformation,
                     a_tx: optax.GradientTransformation,
                     grad_clip: float = 5.0, donate: bool = True,
                     arch_in_weight_step: bool = True):
    """Returns jitted step(state, train_batch, val_batch, do_arch) where
    do_arch is STATIC (two cached traces; host flips it at alpha_begin).

    Order matches the reference hot loop (search_arc.py:252-293):
      1. (if do_arch) first-order DARTS arch update on the val batch —
         forward in train mode, so BN running stats advance, like torch.
      2. weight update on the train batch with the UPDATED arch params.

    arch_in_weight_step=True reproduces a load-bearing reference quirk: its
    model_optimizer is constructed over model.parameters()
    (search_arc.py:135), which INCLUDES the seven arch nn.Parameter tables
    (senas_search.py:145-154) — so every weight step ALSO applies
    SGD+momentum+weight-decay to the arch params (even before alpha_begin),
    and clip_grad_norm_ (search_arc.py:282) computes the global norm over
    weight AND arch gradients jointly. Set False for the "pure" DARTS
    variant that touches arch only via the Adam step.
    """

    def forward_loss(params, batch_stats, arch, batch, dropout_rng):
        aw = normalize_fn(arch)
        outputs, mutated = apply_fn(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], aw, True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng})
        return loss_fn(outputs, batch["label"]), (outputs, mutated["batch_stats"])

    def step(state: SearchTrainState, train_batch, val_batch, do_arch: bool):
        arch = state.arch
        a_opt_state = state.a_opt_state
        batch_stats = state.batch_stats
        next_rng, a_rng, w_rng = jax.random.split(state.rng, 3)

        if do_arch:
            (a_loss, (_, batch_stats)), a_grads = jax.value_and_grad(
                lambda a: forward_loss(state.params, state.batch_stats, a,
                                       val_batch, a_rng),
                has_aux=True)(arch)
            a_updates, a_opt_state = a_tx.update(a_grads, a_opt_state, arch)
            arch = optax.apply_updates(arch, a_updates)
        else:
            a_loss = jnp.zeros([], jnp.float32)

        if arch_in_weight_step:
            w_target = (state.params, arch)
            (w_loss, (outputs, batch_stats)), w_grads = jax.value_and_grad(
                lambda pa: forward_loss(pa[0], batch_stats, pa[1],
                                        train_batch, w_rng),
                has_aux=True)(w_target)
        else:
            w_target = state.params
            (w_loss, (outputs, batch_stats)), w_grads = jax.value_and_grad(
                lambda p: forward_loss(p, batch_stats, arch, train_batch, w_rng),
                has_aux=True)(w_target)
        if grad_clip and grad_clip > 0:
            w_grads, gnorm = clip_by_global_norm(w_grads, grad_clip)
        else:
            gnorm = global_norm(w_grads)
        w_updates, w_opt_state = w_tx.update(w_grads, state.w_opt_state, w_target)
        if arch_in_weight_step:
            params, arch = optax.apply_updates(w_target, w_updates)
        else:
            params = optax.apply_updates(state.params, w_updates)

        last = outputs[-1] if isinstance(outputs, (list, tuple)) else outputs
        tp, fp, fn = confusion_counts(last, train_batch["label"])
        metrics = {
            "loss": w_loss, "arch_loss": a_loss, "grad_norm": gnorm,
            "tp": tp, "fp": fp, "fn": fn,
            "acc": mean_pix_accuracy(last, train_batch["label"]),
        }
        new_state = SearchTrainState(
            params=params, batch_stats=batch_stats, arch=arch,
            w_opt_state=w_opt_state, a_opt_state=a_opt_state,
            step=state.step + 1, rng=next_rng)
        return new_state, metrics

    return jax.jit(step, static_argnums=(3,), donate_argnums=(0,) if donate else ())


def make_search_eval_step(apply_fn: Callable, normalize_fn: Callable, loss_fn: Callable):
    def step(params, batch_stats, arch, batch):
        aw = normalize_fn(arch)
        outputs = apply_fn({"params": params, "batch_stats": batch_stats},
                           batch["image"], aw, False, mutable=False)
        loss = loss_fn(outputs, batch["label"])
        last = outputs[-1] if isinstance(outputs, (list, tuple)) else outputs
        tp, fp, fn = confusion_counts(last, batch["label"])
        return {"loss": loss, "tp": tp, "fp": fp, "fn": fn,
                "acc": mean_pix_accuracy(last, batch["label"])}

    return jax.jit(step)
