"""Infra utilities (device info, seeding, parameter counting, class weights).

TPU-native equivalents of utils/utils.py helpers: device memory via
jax.Device.memory_stats() instead of nvidia-smi parsing (utils.py:146-152,
313-320), parameter count over a params pytree (utils.py:155), log-scaled
class weights (utils.py:302-310)."""

from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np


def set_seed(seed: int):
    """Seed host-side RNGs (numpy + python). JAX keys are explicit."""
    np.random.seed(seed)
    random.seed(seed)


def calc_parameters_count(params) -> float:
    """Parameter count in M (utils.py:155)."""
    return sum(x.size for x in jax.tree.leaves(params)) / 1e6


def get_gpus_memory_info() -> Tuple[int, Dict]:
    """Pick the accelerator with most free memory; returns (index, stats).

    Replaces the nvidia-smi parse (utils.py:146-152). On TPU/CPU backends
    without memory_stats this degrades to device 0."""
    best, best_free, stats = 0, -1, {}
    for i, d in enumerate(jax.devices()):
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        stats[i] = s
        free = s.get("bytes_limit", 0) - s.get("bytes_in_use", 0)
        if free > best_free:
            best, best_free = i, free
    return best, stats


def device_memory_log(logger=None, top_k: int = 20) -> Dict:
    """Log per-device memory plus the largest live device arrays by shape —
    the equivalent of the reference's gc-walk of live CUDA tensors
    (utils/gpu_memory_log.py:35-79), via jax.live_arrays()."""
    emit = logger.info if logger else print
    _, stats = get_gpus_memory_info()
    for i, s in stats.items():
        emit(f"device {i}: in_use={s.get('bytes_in_use', 0)/2**20:.1f}MiB "
             f"limit={s.get('bytes_limit', 0)/2**20:.1f}MiB "
             f"peak={s.get('peak_bytes_in_use', 0)/2**20:.1f}MiB")
    by_shape: Dict[Tuple, Tuple[int, int]] = {}
    try:
        live = jax.live_arrays()
    except Exception:
        live = []
    for arr in live:
        key = (tuple(arr.shape), str(arr.dtype))
        count, size = by_shape.get(key, (0, 0))
        by_shape[key] = (count + 1, size + arr.nbytes)
    rows = sorted(by_shape.items(), key=lambda kv: -kv[1][1])[:top_k]
    total = sum(size for _, (_, size) in by_shape.items())
    emit(f"live arrays: {len(live)} ({total/2**20:.1f}MiB)")
    for (shape, dtype), (count, size) in rows:
        emit(f"  {count:4d} x {dtype}{list(shape)} = {size/2**20:.2f}MiB")
    return stats


def one_hot_encoding(labels: np.ndarray, nclass: int) -> np.ndarray:
    """[B,H,W] int -> [B,nclass,H,W] one-hot (utils.py:216-230 layout)."""
    out = np.zeros((labels.shape[0], nclass) + labels.shape[1:], np.float32)
    for c in range(nclass):
        out[:, c] = labels == c
    return out


def create_class_weight(labels_dict: Dict[int, float], mu: float = 0.15) -> List[float]:
    """Log-scaled class weights (utils.py:302-310)."""
    total = sum(labels_dict.values())
    weights = []
    for key in sorted(labels_dict):
        score = math.log(mu * total / float(labels_dict[key]))
        weights.append(score if score > 1.0 else 1.0)
    return weights


class StepTimer:
    """Wall-clock step timing with jax.profiler trace capture.

    Replaces the reference's ad-hoc dur_time bookkeeping
    (utils/utils.py:106-110) with device-accurate step stats and an
    optional XLA trace: set trace_dir (or SENAS_TRACE_DIR) to capture a
    TensorBoard-compatible profile of steps [trace_start, trace_start+
    trace_steps) — view with `tensorboard --logdir <dir>`.
    """

    def __init__(self, trace_dir: Optional[str] = None, trace_start: int = 5,
                 trace_steps: int = 3):
        import os
        self.trace_dir = trace_dir or os.environ.get("SENAS_TRACE_DIR")
        self.trace_start = trace_start
        self.trace_steps = trace_steps
        self._step = 0
        self._t0 = None
        self._times: List[float] = []
        self._tracing = False

    def __enter__(self):
        import time
        if (self.trace_dir and self._step == self.trace_start
                and not self._tracing):
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import time
        self._times.append(time.perf_counter() - self._t0)
        self._step += 1
        if self._tracing and self._step >= self.trace_start + self.trace_steps:
            jax.profiler.stop_trace()
            self._tracing = False
        return False

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        recent = self._times[max(1, len(self._times) // 2):] or self._times
        return 1.0 / (sum(recent) / len(recent))


def flops_params_info(apply_fn, variables, example_input) -> Dict[str, float]:
    """Static cost analysis via XLA (replaces ptflops/torchstat,
    utils.py:323-330): returns analyzed FLOPs and parameter count."""
    lowered = jax.jit(lambda v, x: apply_fn(v, x, False)).lower(variables, example_input)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float((cost or {}).get("flops", -1.0)),
        "params_m": calc_parameters_count(variables.get("params", variables)),
    }
