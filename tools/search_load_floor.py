"""Decompose the flagship search executable's warm-load floor (VERDICT r4 #7).

BASELINE.md round-4 close measured `compile_s` = 611 s for the bilevel
search step even on a persistent-cache HIT: the floor is deserialize +
tunnel upload of the ~144 MB serialized executable, repeated every process,
against an observed driver kill window of ~300 s. This tool separates the
contributors so the floor is attributable (and, where possible, shrinkable):

  1. tunnel data-path bandwidth — timed `jax.device_put` of large arrays
     (upper-bounds how fast ANY executable bytes could ship to the device);
  2. the flagship search-step compile/load itself — wall time of
     `lower().compile()`, split by whether the persistent cache hit;
  3. executable size breakdown — `compiled.memory_analysis()`
     (generated-code / argument / output / temp bytes) plus the raw
     serialized size (`jax.experimental.serialize_executable`) and the
     on-disk (compressed) persistent-cache entry size;
  4. optionally (--gate-compare) the same with SENAS_PALLAS_EPILOGUE=0 to
     see how much of the size/floor is the Pallas epilogue's Mosaic blobs.

Reference workload: the bilevel step of search/senas_search.py:282-303 at
the configs/senas/senas_promise12.yml geometry (batch 8 @ 256², c=32, d=5,
meta 3) — the same program bench.py's search stage times.

Usage: python tools/search_load_floor.py [--skip-bandwidth] [--gate-compare]
Results append to stdout as one JSON line per section; paste into
BASELINE.md.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from senas_tpu.utils import compile_cache

CACHE_DIR = compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def emit(section: str, payload: dict) -> None:
    print(json.dumps({"section": section, **payload}), flush=True)


def bench_bandwidth() -> dict:
    """Timed host->device transfers. The executable upload rides the same
    tunnel; this upper-bounds the bytes/s any 144 MB blob could achieve."""
    out = {}
    for mb in (16, 64, 128):
        arr = np.random.RandomState(0).randn(mb * 1024 * 1024 // 4) \
            .astype(np.float32)
        # warm the path once at the smallest size only (first transfer pays
        # one-time setup)
        t0 = time.perf_counter()
        dev = jax.device_put(arr)
        float(dev[0])  # force completion (block_until_ready unreliable here)
        dt = time.perf_counter() - t0
        out[f"device_put_{mb}mb_s"] = round(dt, 2)
        out[f"device_put_{mb}mb_mbps"] = round(mb / dt, 1)
        del dev
    return out


def build_search_step():
    from senas_tpu.search.supernet import (SenasSearch, init_arch_params,
                                           normalize_arch)
    from senas_tpu.train.loss import build_loss
    from senas_tpu.train.optim import build_optimizer
    from senas_tpu.train.trainer import SearchTrainState, make_search_step

    batch, hw, meta, depth = 8, 256, 3, 5
    net = SenasSearch(in_channels=1, c=32, nclass=2, depth=depth,
                      meta_node_num=meta, fused=True, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    arch = init_arch_params(jax.random.split(rng)[1], meta, depth)
    x0 = jnp.zeros((batch, hw, hw, 1), jnp.float32)
    aw = normalize_arch(arch, meta)
    variables = net.init({"params": rng}, x0, aw, False)
    loss_fn = build_loss("dice_ce")
    w_tx = build_optimizer({"name": "sgd", "lr": 5e-3, "momentum": 0.9,
                            "weight_decay": 1e-4})
    a_tx = build_optimizer({"name": "adam", "lr": 1e-4, "weight_decay": 5e-4})
    step = make_search_step(net.apply, lambda a: normalize_arch(a, meta),
                            loss_fn, w_tx, a_tx, grad_clip=5.0, donate=True)
    rs = np.random.RandomState(0)

    def mk():
        return {"image": jax.device_put(
                    rs.randn(batch, hw, hw, 1).astype(np.float32)),
                "label": jax.device_put(
                    rs.randint(0, 2, (batch, hw, hw)).astype(np.int32))}

    state = SearchTrainState.create(variables, arch, w_tx, a_tx)
    return step, state, mk(), mk()


def _cache_entry_sizes(before: set) -> list:
    entries = []
    for p in glob.glob(os.path.join(CACHE_DIR, "*")):
        if p not in before and os.path.isfile(p):
            entries.append((os.path.getsize(p), os.path.basename(p)))
    return sorted(entries, reverse=True)


def measure_search_load(tag: str) -> dict:
    before = set(glob.glob(os.path.join(CACHE_DIR, "*")))
    step, state, tb, vb = build_search_step()

    t0 = time.perf_counter()
    lowered = step.lower(state, tb, vb, True)
    lower_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, metrics = compiled(state, tb, vb)
    loss0 = float(metrics["loss"])
    first_exec_s = time.perf_counter() - t0

    out = {"tag": tag, "lower_s": round(lower_s, 1),
           "compile_s": round(compile_s, 1),
           "first_exec_s": round(first_exec_s, 1),
           "loss_first_step": loss0}

    new_entries = _cache_entry_sizes(before)
    if new_entries:
        out["new_cache_entries"] = [
            {"bytes": b, "mb": round(b / 1e6, 1)} for b, _ in new_entries[:3]]
        out["cache_was_cold"] = True
    else:
        out["cache_was_cold"] = False

    try:
        ma = compiled.memory_analysis()
        for field in ("generated_code_size_in_bytes",
                      "argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "alias_size_in_bytes",
                      "serialized_size_in_bytes"):
            v = getattr(ma, field, None)
            if v is not None:
                out[field.replace("_in_bytes", "_mb")] = round(v / 1e6, 1)
    except Exception as e:
        out["memory_analysis_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        from jax.experimental import serialize_executable
        t0 = time.perf_counter()
        blob, _, _ = serialize_executable.serialize(compiled)
        out["serialize_s"] = round(time.perf_counter() - t0, 1)
        out["serialized_mb"] = round(len(blob) / 1e6, 1)
    except Exception as e:
        out["serialize_error"] = f"{type(e).__name__}: {e}"[:200]

    # a second step to confirm the executable is healthy post-analysis
    state, metrics = compiled(state, tb, vb)
    out["loss_second_step"] = float(metrics["loss"])
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bandwidth", action="store_true")
    ap.add_argument("--gate-compare", action="store_true",
                    help="also measure with SENAS_PALLAS_EPILOGUE=0 "
                         "(a second full compile/load)")
    args = ap.parse_args()

    log(f"cache dir: {CACHE_DIR}; device: {jax.devices()[0]}")
    if not args.skip_bandwidth:
        emit("tunnel_bandwidth", bench_bandwidth())

    emit("search_load_default", measure_search_load("epilogue_default"))

    if args.gate_compare:
        os.environ["SENAS_PALLAS_EPILOGUE"] = "0"
        try:
            emit("search_load_epilogue_off", measure_search_load("epilogue_0"))
        finally:
            os.environ.pop("SENAS_PALLAS_EPILOGUE", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
