"""On-chip geometry smoke for every shipped reference config.

Compiles and steps BOTH reference workloads — the bilevel supernet search
step (experiments/search_arc.py:252-299) and the fixed-model train step
(experiments/train_model.py:264-305) — at each config's EXACT geometry:
crop size, depth, init_channels, batch size, optimizers and loss straight
from configs/senas/*.yml, with the dataset constants (num_class,
in_channels, crop) from the spec registry (reference BaseDataset class
attrs, utils/datasets/base.py:18-67).

Configs that trace to the identical program (same geometry + hyperparams)
are deduped and run once, listing every member — e.g. promise12 / chaos /
spleen / pancreas share the 256x256 2-class depth-5 program; heart is the
non-square 256x320 variant; hippo is the 32x48 depth-3 big-batch variant.

Rows are persisted incrementally to config_matrix_results.json so a killed
run keeps its completed rows; re-running skips finished rows (delete the
file for a fresh sweep).

Usage:  python tools/config_matrix_smoke.py [--steps 5] [--fp32]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from senas_tpu.utils import compile_cache

# env-var cache config is dead on this host (axon sitecustomize imports jax
# first); the config.update path is the only one that works — without it
# every row recompiles cold and the repo .jax_cache never warms
compile_cache.enable()

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "config_matrix_results.json")


def log(msg: str) -> None:
    print(f"[matrix +{time.monotonic() - T0:7.1f}s] {msg}", flush=True)


T0 = time.monotonic()


def _load_rows() -> dict:
    if os.path.exists(RESULTS):
        with open(RESULTS) as fp:
            return json.load(fp)
    return {}


def _save_rows(rows: dict) -> None:
    tmp = RESULTS + ".tmp"
    with open(tmp, "w") as fp:
        json.dump(rows, fp, indent=1, sort_keys=True)
    os.replace(tmp, RESULTS)


def _sync_time(step_once, n: int) -> float:
    """Median sec/step over n synced steps (float() readback forces
    completion; block_until_ready is unreliable through the axon tunnel)."""
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        step_once()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def run_search_row(spec, s_cfg: dict, steps: int, dtype) -> dict:
    from senas_tpu.search.supernet import (SenasSearch, init_arch_params,
                                           normalize_arch)
    from senas_tpu.train.loss import build_loss
    from senas_tpu.train.optim import build_optimizer
    from senas_tpu.train.trainer import SearchTrainState, make_search_step

    meta = s_cfg["meta_node_num"]
    depth = s_cfg["depth"]
    batch = s_cfg["batch_size"]
    h, w = spec.crop_size
    net = SenasSearch(in_channels=spec.in_channels, c=s_cfg["init_channels"],
                      nclass=spec.num_class, depth=depth, meta_node_num=meta,
                      double_down_channel=s_cfg.get("double_down_channel", False),
                      supervision=s_cfg.get("deep_supervision", False),
                      dtype=dtype)
    rng = jax.random.PRNGKey(0)
    arch = init_arch_params(jax.random.split(rng)[1], meta, depth,
                            use_sharing=s_cfg.get("sharing_normal", True))
    x0 = jnp.zeros((batch, h, w, spec.in_channels), jnp.float32)
    aw = normalize_arch(arch, meta)
    variables = net.init({"params": rng}, x0, aw, False)

    loss_fn = build_loss(s_cfg["loss"]["name"],
                         supervision=s_cfg.get("deep_supervision", False))
    w_tx = build_optimizer(s_cfg["model_optimizer"])
    a_tx = build_optimizer(s_cfg["arch_optimizer"])
    normalize = lambda a: normalize_arch(a, meta)
    step = make_search_step(net.apply, normalize, loss_fn, w_tx, a_tx,
                            grad_clip=s_cfg.get("grad_clip", 5.0), donate=True)

    rs = np.random.RandomState(0)

    def mk():
        return {
            "image": jax.device_put(
                rs.randn(batch, h, w, spec.in_channels).astype(np.float32)),
            "label": jax.device_put(
                rs.randint(0, spec.num_class, (batch, h, w)).astype(np.int32)),
        }

    tb, vb = mk(), mk()
    state = SearchTrainState.create(variables, arch, w_tx, a_tx)

    t0 = time.perf_counter()
    state, metrics = step(state, tb, vb, True)
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    holder = {"state": state}

    def once():
        holder["state"], m = step(holder["state"], tb, vb, True)
        float(m["loss"])

    sec = _sync_time(once, steps)
    return {"sec_per_step": sec, "steps_per_sec": 1.0 / sec,
            "compile_s": compile_s, "loss_first_step": loss0}


def run_train_row(spec, t_cfg: dict, steps: int, dtype) -> dict:
    from senas_tpu.models import geno_searched
    from senas_tpu.models.senas_model import SenasModel
    from senas_tpu.train.loss import build_loss
    from senas_tpu.train.optim import build_optimizer
    from senas_tpu.train.trainer import FixedTrainState, make_train_step

    genotype = getattr(geno_searched, t_cfg.get("geno_type", "senas"))
    batch = t_cfg["batch_size"]
    h, w = spec.crop_size
    model = SenasModel(nclass=spec.num_class, in_channels=spec.in_channels,
                       c=t_cfg["init_channels"], depth=t_cfg["depth"],
                       genotype=genotype,
                       double_down_channel=t_cfg.get("double_down_channel", False),
                       supervision=t_cfg.get("deep_supervision", False),
                       dtype=dtype)
    x0 = jnp.zeros((batch, h, w, spec.in_channels), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, False)
    tx = build_optimizer(t_cfg["model_optimizer"])
    loss_fn = build_loss(t_cfg["loss"]["name"],
                         supervision=t_cfg.get("deep_supervision", False))
    step = make_train_step(model.apply, loss_fn, tx,
                           grad_clip=t_cfg.get("grad_clip", 5.0), donate=True)

    rs = np.random.RandomState(0)
    batch_d = {
        "image": jax.device_put(
            rs.randn(batch, h, w, spec.in_channels).astype(np.float32)),
        "label": jax.device_put(
            rs.randint(0, spec.num_class, (batch, h, w)).astype(np.int32)),
    }
    state = FixedTrainState.create(variables, tx)

    t0 = time.perf_counter()
    state, metrics = step(state, batch_d)
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    holder = {"state": state}

    def once():
        holder["state"], m = step(holder["state"], batch_d)
        float(m["loss"])

    sec = _sync_time(once, steps)
    return {"sec_per_step": sec, "images_per_sec": batch / sec,
            "compile_s": compile_s, "loss_first_step": loss0}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 weights instead of the bf16 default")
    ap.add_argument("--configs", default="configs/senas/senas_*.yml")
    ap.add_argument("--only", default="",
                    help="comma list of config stems to restrict to")
    args = ap.parse_args()

    from senas_tpu.core.config import load_config
    from senas_tpu.data.base import SPECS

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    only = {s for s in args.only.split(",") if s}

    # group configs by identical traced program
    groups: dict = {}
    for path in sorted(glob.glob(args.configs)):
        stem = os.path.splitext(os.path.basename(path))[0].replace("senas_", "")
        if stem == "synthetic" or (only and stem not in only):
            continue
        cfg = load_config(path)
        spec = SPECS[cfg["data"]["dataset"]]
        for phase in ("searching", "training"):
            p = cfg[phase]
            key_parts = [phase, spec.crop_size, spec.num_class,
                         spec.in_channels, p["depth"], p["init_channels"],
                         p["batch_size"], p.get("meta_node_num"),
                         p["loss"]["name"], p.get("double_down_channel", False),
                         p.get("deep_supervision", False),
                         json.dumps(p.get("model_optimizer"), sort_keys=True),
                         json.dumps(p.get("arch_optimizer"), sort_keys=True),
                         p.get("geno_type")]
            key = repr(key_parts)
            groups.setdefault(key, {"phase": phase, "spec": spec, "cfg": p,
                                    "members": []})["members"].append(stem)

    rows = _load_rows()
    failures = 0
    for key, g in sorted(groups.items(), key=lambda kv: kv[1]["phase"]):
        spec, p = g["spec"], g["cfg"]
        name = (f"{g['phase'][:-3]}:{'+'.join(g['members'])}"
                f" {spec.crop_size[0]}x{spec.crop_size[1]}"
                f" nc{spec.num_class} d{p['depth']} b{p['batch_size']}")
        if name in rows and "error" not in rows[name]:
            log(f"skip (done): {name}")
            continue
        log(f"running: {name}")
        try:
            fn = run_search_row if g["phase"] == "searching" else run_train_row
            r = fn(spec, p, args.steps, dtype)
            r["members"] = g["members"]
            r["dtype"] = "fp32" if args.fp32 else "bf16"
            rows[name] = r
            log(f"  -> {json.dumps(r)}")
        except Exception as e:  # keep sweeping; the row records the failure
            failures += 1
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:400],
                          "members": g["members"]}
            log(f"  -> FAILED {rows[name]['error']}")
        _save_rows(rows)
    log(f"done: {len(rows)} rows, {failures} failures -> {RESULTS}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
