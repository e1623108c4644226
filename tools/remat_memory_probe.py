"""Measure what the remat knob buys on the compiled fixed-train step.

Compiles the SenasModel train step (senas_node_4, c=32, depth=5 — the
parity workload of bench.py) with `remat` off and on at the given geometry
and reports XLA's own memory analysis (temp = live activation/workspace
bytes) plus, optionally, measured step time. Run on the TPU chip:

    python tools/remat_memory_probe.py --batch 12 --hw 256 --dtype bf16 --steps 10

Evidence lands in BASELINE.md. No reference equivalent (torch has
`checkpoint_sequential`; the reference never uses it).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe(remat: bool, batch: int, hw: int, dtype, steps: int):
    from senas_tpu.models.geno_searched import senas_node_4
    from senas_tpu.models.senas_model import SenasModel
    from senas_tpu.train.loss import build_loss
    from senas_tpu.train.optim import build_optimizer
    from senas_tpu.train.trainer import FixedTrainState, make_train_step

    model = SenasModel(nclass=2, in_channels=1, c=32, depth=5,
                       genotype=senas_node_4, dtype=dtype, remat=remat)
    x0 = jnp.zeros((batch, hw, hw, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, False)
    tx = build_optimizer({"name": "sgd", "lr": 6e-3, "momentum": 0.9,
                          "weight_decay": 1e-4})
    step = make_train_step(model.apply, build_loss("dice_ce"), tx,
                           grad_clip=5.0, donate=True)
    state = FixedTrainState.create(variables, tx)
    rs = np.random.RandomState(0)
    batch_d = {
        "image": jax.device_put(rs.randn(batch, hw, hw, 1).astype(np.float32)),
        "label": jax.device_put(rs.randint(0, 2, (batch, hw, hw)).astype(np.int32)),
    }

    t0 = time.perf_counter()
    compiled = step.lower(state, batch_d).compile()
    compile_s = time.perf_counter() - t0
    out = {"remat": remat, "compile_s": round(compile_s, 1)}
    try:
        ma = compiled.memory_analysis()
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                out[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 1)
    except Exception as e:  # remote backends may not expose it
        out["memory_analysis_error"] = repr(e)

    if steps > 0:
        state, m = step(state, batch_d)
        float(m["loss"])  # sync (block_until_ready is a no-op through axon)
        holder = {"state": state}
        t0 = time.perf_counter()
        for _ in range(steps):
            holder["state"], m = step(holder["state"], batch_d)
        float(m["loss"])
        sec = (time.perf_counter() - t0) / steps
        out["sec_per_step"] = round(sec, 4)
        out["images_per_sec"] = round(batch / sec, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (functional check only)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from senas_tpu.utils.compile_cache import enable as enable_cache
    enable_cache(".jax_cache")

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    for remat in (False, True):
        res = probe(remat, args.batch, args.hw, dtype, args.steps)
        print(res, flush=True)


if __name__ == "__main__":
    main()
