"""Benchmark harness — fills BASELINE.md's "to measure" column.

Runs the two reference headline workloads (configs/senas/senas_promise12.yml
shapes) on whatever accelerator this process gets (the real TPU chip under
the driver; CPU as a labeled fallback):

  1. Fixed-model training  — SenasModel(senas_node_4, c=32, depth=5),
     batch 12, 256x256x1, dice_ce + SGD(momentum, wd) + grad-clip 5.
     Matches the reference train hot loop (train_model.py:264-305).
  2. Supernet bilevel search — SenasSearch(c=32, depth=5, meta=3), batch 8,
     arch step on a val batch + weight step on a train batch per step.
     Matches the reference search hot loop (search_arc.py:252-293).

Prints ONE machine-parsable JSON line on stdout (the headline metric);
full details go to bench_results.json and stderr.

vs_baseline: ratio vs the PyTorch reference running the SAME fixed-train
workload on this host (measured: 0.31 img/s on the 1-core CPU of this
machine, see BASELINE.md). The reference repo publishes no GPU numbers, so
this host-local measurement is the only reproducible baseline available.

Usage: python bench.py [--quick] [--with-naive-search] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

# Measured on this host (1-core CPU, torch 2.13.0+cpu, reference
# models/senas_model.py, batch 12 @ 256^2): 0.31 images/sec. See BASELINE.md.
TORCH_REFERENCE_TRAIN_IMG_PER_SEC = 0.31
# Reference bilevel search step (search/senas_search.py NAS, dice_ce, exact
# senas_promise12.yml searching optimizers, batch 8 @ 256^2), same host:
# 111.35 s/step median of 3. See BASELINE.md.
TORCH_REFERENCE_SEARCH_STEPS_PER_SEC = 1.0 / 111.35
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 on the MXU.
V5E_PEAK_FLOPS = 197e12


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _time_steps(step_once, n_steps: int) -> float:
    """Median-of-runs seconds/step; step_once() must block until ready."""
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        step_once()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _time_steps_pipelined(dispatch_once, sync, n_steps: int) -> float:
    """Amortized seconds/step with async dispatch and ONE final sync.

    This is how the runners execute since DeferredMetrics (runner/common.py):
    steps stream without per-step readbacks, metrics drain every ~16 steps.
    A per-step sync adds ~30 ms of tunnel latency at PROMISE12 shapes, so
    this is the number the training loop actually achieves."""
    t0 = time.perf_counter()
    for _ in range(n_steps):
        dispatch_once()
    sync()
    return (time.perf_counter() - t0) / n_steps


def bench_fixed_train(batch: int, hw: int, steps: int, dtype=None):
    from senas_tpu.models.geno_searched import senas_node_4
    from senas_tpu.models.senas_model import SenasModel
    from senas_tpu.train.loss import build_loss
    from senas_tpu.train.optim import build_optimizer
    from senas_tpu.train.trainer import FixedTrainState, make_train_step

    model = SenasModel(nclass=2, in_channels=1, c=32, depth=5,
                       genotype=senas_node_4, dtype=dtype)
    x0 = jnp.zeros((batch, hw, hw, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, False)
    tx = build_optimizer({"name": "sgd", "lr": 6e-3, "momentum": 0.9,
                          "weight_decay": 1e-4})
    step = make_train_step(model.apply, build_loss("dice_ce"), tx, grad_clip=5.0,
                           donate=True)

    rs = np.random.RandomState(0)
    batch_d = {
        "image": jax.device_put(rs.randn(batch, hw, hw, 1).astype(np.float32)),
        "label": jax.device_put(rs.randint(0, 2, (batch, hw, hw)).astype(np.int32)),
    }
    state = FixedTrainState.create(variables, tx)

    t0 = time.perf_counter()
    state, metrics = step(state, batch_d)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0
    loss0 = float(metrics["loss"])

    holder = {"state": state}

    def once():
        holder["state"], m = step(holder["state"], batch_d)
        float(m["loss"])  # forced host readback: block_until_ready proved
        # unreliable as a sync through the axon tunnel for some programs

    sec_sync = _time_steps(once, steps)

    def dispatch():
        holder["state"], holder["m"] = step(holder["state"], batch_d)

    sec = _time_steps_pipelined(dispatch, lambda: float(holder["m"]["loss"]),
                                max(steps, 10))
    # analyzed forward+backward+update flops of the whole compiled step
    try:
        cost = step.lower(holder["state"], batch_d).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float((cost or {}).get("flops", 0.0)) or None
    except Exception:
        flops = None
    return {
        "sec_per_step": sec,
        "sec_per_step_syncmode": sec_sync,
        "images_per_sec": batch / sec,
        "compile_s": compile_s,
        "loss_first_step": loss0,
        "flops_per_step": flops,
        "mfu": (flops / sec / V5E_PEAK_FLOPS) if flops else None,
    }


def bench_inference(hw: int, steps: int, dtype=None):
    """Serving path: jitted eval-mode forward (no grad, running BN stats).

    Reports batch-1 latency (p50 over `steps` synced calls) and batch-12 /
    batch-64 pipelined throughput — the testing_model.py workload."""
    from senas_tpu.models.geno_searched import senas_node_4
    from senas_tpu.models.senas_model import SenasModel

    model = SenasModel(nclass=2, in_channels=1, c=32, depth=5,
                       genotype=senas_node_4, dtype=dtype)
    rs = np.random.RandomState(0)
    out = {}
    for batch in (1, 12, 64):
        x0 = jnp.zeros((batch, hw, hw, 1), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x0, False)

        @jax.jit
        def fwd(variables, x):
            logits = model.apply(variables, x, False)
            last = logits[-1] if isinstance(logits, (list, tuple)) else logits
            return jnp.argmax(last, axis=-1)

        x = jax.device_put(rs.randn(batch, hw, hw, 1).astype(np.float32))
        pred = fwd(variables, x)
        jax.block_until_ready(pred)
        if batch == 1:
            times = []
            for _ in range(max(steps, 10)):
                t0 = time.perf_counter()
                np.asarray(fwd(variables, x))  # synced: true request latency
                times.append(time.perf_counter() - t0)
            out["batch1_p50_ms"] = float(np.median(times)) * 1e3
        else:
            n = max(steps, 20)
            t0 = time.perf_counter()
            for _ in range(n):
                pred = fwd(variables, x)
            jax.block_until_ready(pred)
            sec = (time.perf_counter() - t0) / n
            out[f"batch{batch}_images_per_sec"] = batch / sec
    return out


def bench_search(batch: int, hw: int, steps: int, fused: bool, dtype=None):
    from senas_tpu.search.supernet import (SenasSearch, init_arch_params,
                                           normalize_arch)
    from senas_tpu.train.loss import build_loss
    from senas_tpu.train.optim import build_optimizer
    from senas_tpu.train.trainer import SearchTrainState, make_search_step

    meta, depth = 3, 5
    net = SenasSearch(in_channels=1, c=32, nclass=2, depth=depth,
                      meta_node_num=meta, fused=fused, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    arch = init_arch_params(jax.random.split(rng)[1], meta, depth)
    x0 = jnp.zeros((batch, hw, hw, 1), jnp.float32)
    aw = normalize_arch(arch, meta)
    variables = net.init({"params": rng}, x0, aw, False)

    loss_fn = build_loss("dice_ce")
    w_tx = build_optimizer({"name": "sgd", "lr": 5e-3, "momentum": 0.9,
                            "weight_decay": 1e-4})
    a_tx = build_optimizer({"name": "adam", "lr": 1e-4, "weight_decay": 5e-4})
    normalize = lambda a: normalize_arch(a, meta)
    step = make_search_step(net.apply, normalize, loss_fn, w_tx, a_tx,
                            grad_clip=5.0, donate=True)

    rs = np.random.RandomState(0)
    def mk():
        return {
            "image": jax.device_put(rs.randn(batch, hw, hw, 1).astype(np.float32)),
            "label": jax.device_put(
                rs.randint(0, 2, (batch, hw, hw)).astype(np.int32)),
        }
    tb, vb = mk(), mk()
    state = SearchTrainState.create(variables, arch, w_tx, a_tx)

    t0 = time.perf_counter()
    state, metrics = step(state, tb, vb, True)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t0
    holder = {"state": state}

    def once():
        holder["state"], m = step(holder["state"], tb, vb, True)
        float(m["loss"])  # forced host readback (see bench_fixed_train)

    sec_sync = _time_steps(once, steps)

    def dispatch():
        holder["state"], holder["m"] = step(holder["state"], tb, vb, True)

    sec = _time_steps_pipelined(dispatch, lambda: float(holder["m"]["loss"]),
                                max(steps, 10))
    return {
        "sec_per_step": sec,
        "sec_per_step_syncmode": sec_sync,
        "steps_per_sec": 1.0 / sec,
        "images_per_sec": batch / sec,
        "compile_s": compile_s,
        "loss_first_step": float(metrics["loss"]),
    }


def bench_pallas_norm_convs(steps: int, chain: int = 10):
    """§7.6 prototype: the fused 3-branch NORM conv kernel vs three XLA
    convs at supernet first-cell shapes. `chain` iterations run inside one
    jit so the tunnel dispatch overhead (~30ms/call on this setup) doesn't
    mask the kernel time; sync is a scalar readback.

    Measured 2026-08-16 on the v5e chip (b=64, 128^2, c=32, n=24):
    XLA 15.4 TFLOP/s vs Pallas tap-loop 5.4 TFLOP/s -> XLA kept as the
    default path (its conv tiling uses the MXU far better than per-tap
    [rows*W, 32] x [32, 24] matmuls at these channel widths)."""
    from senas_tpu.ops.pallas_kernels import fused_norm_convs, xla_norm_convs

    rs = np.random.RandomState(0)
    b, hw, c, n = 64, 128, 32, 24
    x = jax.device_put(rs.randn(b, hw, hw, c).astype(np.float32))
    k3 = jax.device_put(0.1 * rs.randn(3, 3, c, n).astype(np.float32))
    k52 = jax.device_put(0.1 * rs.randn(5, 5, c, n).astype(np.float32))
    k53 = jax.device_put(0.1 * rs.randn(5, 5, c, n).astype(np.float32))

    max_err = float(jnp.max(jnp.abs(
        xla_norm_convs(x, k3, k52, k53)
        - fused_norm_convs(x, k3, k52, k53))))

    def chained(conv_fn):
        @jax.jit
        def run(x, k3, k52, k53):
            y = x
            for _ in range(chain):
                o = conv_fn(y, k3, k52, k53)
                y = y + 0.001 * o[..., : x.shape[-1]]
            return jnp.sum(y)
        return run

    flops = chain * b * hw * hw * c * n * (9 + 25 + 25) * 2
    out = {}
    for key, fn in [("xla", chained(xla_norm_convs)),
                    ("pallas", chained(fused_norm_convs))]:
        float(fn(x, k3, k52, k53))  # compile + warm
        t = _time_steps(lambda: float(fn(x, k3, k52, k53)), max(steps // 2, 5))
        out[f"{key}_ms"] = t * 1e3
        out[f"{key}_tflops"] = flops / t / 1e12
    out["speedup"] = out["xla_ms"] / out["pallas_ms"]
    out["max_abs_err"] = max_err
    out["shape"] = f"b{b} {hw}x{hw} c{c} n{n} chain{chain}"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes / few steps (CI smoke)")
    ap.add_argument("--with-naive-search", action="store_true",
                    help="also time the naive per-edge search cell")
    ap.add_argument("--with-pallas", action="store_true",
                    help="benchmark the Pallas fused NORM-conv prototype")
    ap.add_argument("--pallas-only", action="store_true",
                    help="run ONLY the pallas-vs-XLA comparison")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-sweep", type=str, default=None,
                    help="comma list of batch sizes: also time fixed-train "
                         "bf16 at each (throughput scaling table)")
    args = ap.parse_args()

    if args.pallas_only:
        steps = args.steps or 20
        res = bench_pallas_norm_convs(steps)
        log(f"pallas {res['pallas_ms']:.3f} ms vs xla {res['xla_ms']:.3f} ms "
            f"({res['speedup']:.2f}x, max err {res['max_abs_err']:.2e}) "
            f"@ {res['shape']}")
        print(json.dumps({"metric": "pallas_norm_convs_speedup_vs_xla",
                          "value": round(res["speedup"], 3), "unit": "x",
                          "vs_baseline": round(res["speedup"], 3)}))
        return

    platform = jax.devices()[0].platform
    quick = args.quick or platform == "cpu"
    hw = 64 if quick else 256
    steps = args.steps or (3 if quick else 20)
    train_bs, search_bs = 12, 8

    log(f"bench: platform={platform} device={jax.devices()[0]} hw={hw} steps={steps}")
    results = {"platform": platform, "device": str(jax.devices()[0]), "hw": hw,
               "steps_timed": steps}

    log("fixed-train fp32 ...")
    results["train_f32"] = bench_fixed_train(train_bs, hw, steps, dtype=None)
    log(f"  {results['train_f32']['images_per_sec']:.2f} img/s "
        f"({results['train_f32']['sec_per_step']*1e3:.1f} ms/step, "
        f"compile {results['train_f32']['compile_s']:.1f}s)")

    log("fixed-train bf16 ...")
    results["train_bf16"] = bench_fixed_train(train_bs, hw, steps,
                                              dtype=jnp.bfloat16)
    log(f"  {results['train_bf16']['images_per_sec']:.2f} img/s "
        f"({results['train_bf16']['sec_per_step']*1e3:.1f} ms/step)")

    # Emit the headline + persist NOW: the search stage compiles for
    # ~7 minutes; a harness-side timeout must not lose the train numbers.
    headline = results["train_bf16"] if (
        results["train_bf16"]["images_per_sec"]
        > results["train_f32"]["images_per_sec"]) else results["train_f32"]
    results["headline"] = {
        "metric": "senas_fixed_train_images_per_sec",
        "value": round(headline["images_per_sec"], 3),
        "unit": "images/sec/chip",
        "workload": f"senas_node_4 c=32 depth=5 batch={train_bs} {hw}x{hw} dice_ce+sgd",
        "baseline": TORCH_REFERENCE_TRAIN_IMG_PER_SEC,
        "baseline_desc": "torch reference, same workload, this host's CPU "
                         "(no reference-published numbers exist; BASELINE.md)",
    }
    _write_results(results)
    vs = (headline["images_per_sec"] / TORCH_REFERENCE_TRAIN_IMG_PER_SEC
          if hw == 256 else None)  # only comparable at the real workload shape
    print(json.dumps({
        "metric": "senas_fixed_train_images_per_sec",
        "value": round(headline["images_per_sec"], 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }), flush=True)

    log("inference (eval forward, bf16) ...")
    try:
        results["inference_bf16"] = bench_inference(hw, steps,
                                                    dtype=jnp.bfloat16)
        log(f"  {results['inference_bf16']}")
    except Exception as e:
        results["inference_bf16"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        log(f"  inference FAILED: {e}")
    _write_results(results)

    log("supernet search (fused cell, bf16) ...")
    results["search_fused"] = bench_search(search_bs, hw, steps, fused=True,
                                           dtype=jnp.bfloat16)
    if hw == 256:
        results["search_fused"]["vs_torch_cpu_baseline"] = round(
            results["search_fused"]["steps_per_sec"]
            / TORCH_REFERENCE_SEARCH_STEPS_PER_SEC, 1)
    log(f"  {results['search_fused']['steps_per_sec']:.3f} steps/s "
        f"(compile {results['search_fused']['compile_s']:.1f}s)")

    if args.with_naive_search:
        log("supernet search (naive cell) ...")
        try:
            results["search_naive"] = bench_search(search_bs, hw, steps,
                                                   fused=False)
            results["fused_speedup"] = (
                results["search_naive"]["sec_per_step"]
                / results["search_fused"]["sec_per_step"])
            log(f"  fused speedup: {results['fused_speedup']:.2f}x")
        except Exception as e:  # the naive graph can exceed compiler limits
            results["search_naive"] = {"error": f"{type(e).__name__}: {e}"[:500]}
            log(f"  naive cell FAILED: {results['search_naive']['error'][:160]}")

    if args.batch_sweep:
        results["batch_sweep"] = {}
        for b in [int(s) for s in args.batch_sweep.split(",")]:
            log(f"fixed-train bf16 batch {b} ...")
            try:
                r = bench_fixed_train(b, hw, steps, dtype=jnp.bfloat16)
                results["batch_sweep"][str(b)] = r
                log(f"  {r['images_per_sec']:.1f} img/s "
                    f"({r['sec_per_step']*1e3:.1f} ms/step)")
            except Exception as e:
                results["batch_sweep"][str(b)] = {
                    "error": f"{type(e).__name__}: {e}"[:300]}
                log(f"  batch {b} FAILED: {e}")
            _write_results(results)

    if args.with_pallas:
        log("pallas fused NORM convs vs XLA ...")
        try:
            results["pallas_norm_convs"] = bench_pallas_norm_convs(steps)
            log(f"  pallas {results['pallas_norm_convs']['pallas_ms']:.2f} ms "
                f"vs xla {results['pallas_norm_convs']['xla_ms']:.2f} ms "
                f"({results['pallas_norm_convs']['speedup']:.2f}x, max err "
                f"{results['pallas_norm_convs']['max_abs_err']:.2e})")
        except Exception as e:
            results["pallas_norm_convs"] = {
                "error": f"{type(e).__name__}: {e}"[:500]}
            log(f"  pallas FAILED: {results['pallas_norm_convs']['error'][:160]}")

    _write_results(results)
    log("bench complete")


def _write_results(results):
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    log(f"details -> {out_path}")


if __name__ == "__main__":
    main()
