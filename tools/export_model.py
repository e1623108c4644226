#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained StableHLO serving
artifact (senas_tpu/serve.py).

The artifact bakes the weights in as constants with a symbolic batch
dimension — a serving process loads it with `senas_tpu.serve.Predictor`
(or raw `jax.export.deserialize`) and runs it on any JAX backend without
the model code, genotype, or checkpoint tree.

Usage:
  python tools/export_model.py --config configs/senas/senas_promise12.yml \
      --resume <ckpt_dir> --out <artifact_dir> [--model senas]
      [--genotype "..."] [--name best|last] [--check]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--resume", required=True,
                    help="checkpoint directory (CheckpointManager layout)")
    ap.add_argument("--out", required=True, help="artifact output directory")
    ap.add_argument("--model", default="senas")
    ap.add_argument("--genotype", default="")
    ap.add_argument("--name", default="", choices=["", "best", "last"],
                    help="which checkpoint to export (default: best if "
                         "present, else last)")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and verify logits match the "
                         "in-process model on a random batch")
    ap.add_argument("--f32", action="store_true",
                    help="force float32 matmul precision inside the "
                         "artifact (f32-faithful serving; TPU default is "
                         "bf16 MXU inputs)")
    args = ap.parse_args()

    from senas_tpu.core.config import load_config
    from senas_tpu.core.genotype import parse_genotype
    from senas_tpu.data import get_dataset_spec
    from senas_tpu.models import geno_searched
    from senas_tpu.models.factory import get_segmentation_model
    from senas_tpu.serve import Predictor, export_predict_fn, save_artifact
    from senas_tpu.train.checkpoint import CheckpointManager

    cfg = load_config(args.config)
    t = cfg["training"]
    spec = get_dataset_spec(cfg["data"]["dataset"])
    hw = spec.crop_size

    genotype = (parse_genotype(args.genotype) if args.genotype
                else getattr(geno_searched, t.get("geno_type", "senas")))
    model = get_segmentation_model(
        args.model, dataset=cfg["data"]["dataset"],
        c=t.get("init_channels", 32), depth=t.get("depth", 5),
        supervision=False, genotype=genotype,
        double_down_channel=t.get("double_down_channel", False))

    mgr = CheckpointManager(args.resume)
    name = args.name or ("best" if mgr.exists("best") else "last")
    restored = mgr.restore_raw(name)
    if restored is None:
        raise SystemExit(f"checkpoint {name!r} not found in {args.resume}")
    raw = restored["state"]
    variables = {"params": raw["params"]}
    if raw.get("batch_stats"):
        variables["batch_stats"] = raw["batch_stats"]

    in_shape = (hw[0], hw[1], spec.in_channels)
    exported = export_predict_fn(
        model.apply, variables, in_shape,
        matmul_precision="float32" if args.f32 else None)
    meta = {
        "model": args.model,
        "dataset": cfg["data"]["dataset"],
        "input_hw": list(hw),
        "in_channels": spec.in_channels,
        "num_classes": spec.num_class,
        "checkpoint": os.path.abspath(args.resume),
        "checkpoint_name": name,
        "checkpoint_meta": restored.get("meta", {}),
        "matmul_precision": "float32" if args.f32 else "backend-default",
    }
    save_artifact(exported, meta, args.out)
    size = os.path.getsize(os.path.join(args.out, "model.stablehlo"))
    print(f"exported {args.model} ({name}) -> {args.out} "
          f"({size / 1e6:.1f} MB, input [b,{hw[0]},{hw[1]},"
          f"{spec.in_channels}])")

    if args.check:
        pred = Predictor(args.out)
        rs = np.random.RandomState(0)
        x = rs.randn(2, hw[0], hw[1], spec.in_channels).astype(np.float32)
        got = np.asarray(pred.logits(x))
        vars_j = jax.tree.map(jnp.asarray, variables)
        out = model.apply(vars_j, jnp.asarray(x), False)
        if isinstance(out, tuple):
            out = out[0]
        want = np.asarray(out[-1] if isinstance(out, (list, tuple)) else out)
        # separate compilations (artifact vs in-process jit) fuse
        # differently; float-noise-level divergence is expected
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        masks = pred.predict_masks(x)
        assert masks.shape == (2, hw[0], hw[1]) and masks.dtype == np.uint8
        print(f"check OK: artifact logits match in-process model "
              f"(max |err| {np.abs(got - want).max():.2e})")


if __name__ == "__main__":
    main()
