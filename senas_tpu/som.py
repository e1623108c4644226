"""Kohonen Self-Organising Map, TPU-native.

Parity target: the reference's orphan SOM module
(/root/reference/kohonen/productionized_kohonen.py:17-175) — same public
API (fit / predict / quantization_error / topographic_error / save / load,
exponential radius+lr decay, online per-sample updates, history recording)
— re-designed for JAX: the whole training loop is ONE jitted
`lax.scan` over (iteration, sample) steps, so training runs device-resident
with no per-sample host round trips. numpy in/out at the API boundary.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("width", "height", "n_iterations",
                                   "record_history"))
def _train(weights, data, coords, *, width: int, height: int,
           n_iterations: int, initial_radius: float, time_constant: float,
           initial_lr: float, record_history: bool):
    """scan over iterations; inner scan over samples (online SOM update)."""
    n = data.shape[0]

    def sample_step(w, inputs):
        vector, radius, lr = inputs
        sq = jnp.sum((w - vector) ** 2, axis=-1)          # (W, H)
        flat_idx = jnp.argmin(sq)
        bx, by = flat_idx // height, flat_idx % height
        grid_sq = (coords[0] - bx) ** 2 + (coords[1] - by) ** 2
        influence = jnp.exp(-grid_sq / (2.0 * radius ** 2))
        w = w + lr * influence[..., None] * (vector - w)
        return w, None

    def qe(w):
        flat = w.reshape(-1, w.shape[-1])
        d = jnp.linalg.norm(data[:, None, :] - flat[None], axis=2)
        return d.min(axis=1).mean()

    def iter_step(w, t):
        radius = initial_radius * jnp.exp(-t / time_constant)
        lr = initial_lr * jnp.exp(-t / time_constant)
        w, _ = jax.lax.scan(
            sample_step, w,
            (data, jnp.full((n,), radius), jnp.full((n,), lr)))
        hist = qe(w) if record_history else jnp.zeros(())
        return w, hist

    weights, history = jax.lax.scan(iter_step, weights,
                                    jnp.arange(n_iterations, dtype=jnp.float32))
    return weights, history


class KohonenSOM:
    """Self-organising map on a width x height grid.

    Same constructor contract as the reference (validation, radius/time
    constant with the small-grid log guard, seeded init).
    """

    def __init__(self, width: int, height: int, n_iterations: int = 100,
                 initial_learning_rate: float = 0.1,
                 random_state: Optional[int] = None) -> None:
        if width < 1 or height < 1:
            raise ValueError("width and height must be >= 1")
        if n_iterations < 1:
            raise ValueError("n_iterations must be >= 1")
        self.width = width
        self.height = height
        self.n_iterations = n_iterations
        self.initial_learning_rate = initial_learning_rate
        self.random_state = random_state

        self.initial_radius = max(width, height) / 2.0
        log_radius = (np.log(self.initial_radius)
                      if self.initial_radius > 1 else 1.0)
        self.time_constant = n_iterations / log_radius

        self.weights: Optional[np.ndarray] = None
        self.quantization_error_history_: List[float] = []

    # ------------------------------------------------------------------
    def _check_fitted(self) -> None:
        if self.weights is None:
            raise RuntimeError("SOM is not trained yet -- call fit() first.")

    def _validate(self, data) -> np.ndarray:
        data = np.asarray(data, dtype=float)
        if data.ndim != 2 or data.shape[0] == 0:
            raise ValueError(
                "data must be a non-empty 2D array (n_samples, n_features)")
        return data

    def _best_matching_unit(self, vector: np.ndarray) -> Tuple[int, int]:
        self._check_fitted()
        sq = np.sum((self.weights - np.asarray(vector)) ** 2, axis=-1)
        return tuple(np.unravel_index(np.argmin(sq), sq.shape))

    def _distances_to_nodes(self, data: np.ndarray) -> np.ndarray:
        flat = self.weights.reshape(-1, self.weights.shape[-1])
        return np.linalg.norm(np.asarray(data)[:, None, :] - flat[None], axis=2)

    # ------------------------------------------------------------------
    def fit(self, data, record_history: bool = False) -> "KohonenSOM":
        data = self._validate(data)
        n_features = data.shape[1]
        rng = np.random.default_rng(self.random_state)
        init = rng.random((self.width, self.height, n_features))
        coords = jnp.stack(jnp.meshgrid(jnp.arange(self.width),
                                        jnp.arange(self.height),
                                        indexing="ij")).astype(jnp.float32)
        logger.info("Training SOM: grid=%dx%d iters=%d n=%d d=%d",
                    self.width, self.height, self.n_iterations,
                    data.shape[0], n_features)
        weights, history = _train(
            jnp.asarray(init), jnp.asarray(data, jnp.float32), coords,
            width=self.width, height=self.height,
            n_iterations=self.n_iterations,
            initial_radius=float(self.initial_radius),
            time_constant=float(self.time_constant),
            initial_lr=float(self.initial_learning_rate),
            record_history=record_history)
        self.weights = np.asarray(weights, dtype=float)
        self.quantization_error_history_ = (
            [float(v) for v in np.asarray(history)] if record_history else [])
        return self

    def predict(self, data) -> np.ndarray:
        self._check_fitted()
        data = self._validate(data)
        nearest = self._distances_to_nodes(data).argmin(axis=1)
        xs, ys = np.unravel_index(nearest, (self.width, self.height))
        return np.stack([xs, ys], axis=1)

    def quantization_error(self, data) -> float:
        self._check_fitted()
        data = self._validate(data)
        return float(self._distances_to_nodes(data).min(axis=1).mean())

    def topographic_error(self, data) -> float:
        self._check_fitted()
        data = self._validate(data)
        nearest_two = np.argsort(self._distances_to_nodes(data), axis=1)[:, :2]
        xs, ys = np.unravel_index(nearest_two, (self.width, self.height))
        non_adjacent = ((np.abs(xs[:, 0] - xs[:, 1]) > 1)
                        | (np.abs(ys[:, 0] - ys[:, 1]) > 1))
        return float(np.mean(non_adjacent))

    def save(self, path: str) -> None:
        np.save(path, self.weights)

    def load(self, path: str) -> "KohonenSOM":
        if not str(path).endswith(".npy"):
            path = str(path) + ".npy"
        self.weights = np.load(path)
        return self
