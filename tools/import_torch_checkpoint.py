#!/usr/bin/env python
"""Convert a PyTorch reference checkpoint into a senas_tpu Orbax
checkpoint directory that the train/search/test runners accept via
``--resume`` / ``searching.resume`` / ``training.resume``.

Reference checkpoint formats: train CLI (experiments/train_model.py:220-233)
and search CLI (experiments/search_arc.py:227-238); both are produced by
save_checkpoint (utils/utils.py:138-143) as ``checkpint.pth.tar`` /
``model_best.pth.tar``. Optimizer slot state is NOT translated — optax
state is re-initialized from the config's optimizer section and the run
meta (epoch, best metrics, patience, geno_type) is carried over, so a
resumed run continues at the right epoch with fresh momentum.

Usage:
  python tools/import_torch_checkpoint.py CKPT --config configs/senas/senas_promise12.yml \
      --out /path/to/ckpt_dir [--kind auto|train|search] [--genotype "..."]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Honor JAX_PLATFORMS even where a sitecustomize hook (e.g. a TPU plugin
# registration) rewrites it after env binding: the config update takes
# final precedence. Translation is host work — a JAX_PLATFORMS=cpu run
# must never initialize an accelerator backend.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def _check_structure(template, built, what):
    t_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
               jax.tree_util.tree_leaves_with_path(template)}
    b_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
               jax.tree_util.tree_leaves_with_path(built)}
    missing = sorted(set(t_paths) - set(b_paths))
    extra = sorted(set(b_paths) - set(t_paths))
    if missing or extra:
        raise SystemExit(
            f"{what}: translated tree does not match the model "
            f"(missing {missing[:5]}{'...' if len(missing) > 5 else ''}, "
            f"extra {extra[:5]}{'...' if len(extra) > 5 else ''}) — check "
            f"--depth/--meta_node_num/--genotype against the torch run")
    bad = [k for k in t_paths if t_paths[k] != b_paths[k]]
    if bad:
        k = bad[0]
        raise SystemExit(f"{what}: shape mismatch at {k}: model "
                         f"{t_paths[k]} vs checkpoint {b_paths[k]} "
                         f"(+{len(bad) - 1} more)")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="torch .pth.tar checkpoint path")
    ap.add_argument("--config", required=True, help="the run's YAML config")
    ap.add_argument("--out", required=True,
                    help="output Orbax checkpoint directory")
    ap.add_argument("--kind", default="auto",
                    choices=["auto", "train", "search"])
    ap.add_argument("--model", default="senas",
                    help="model the checkpoint was trained with (train "
                         "kind): senas or any reference baseline name "
                         "(unet, unet_plus_plus, manet, linknet, fpn, "
                         "pspnet, deeplab_v3_plus, pan, nasunet)")
    ap.add_argument("--genotype", default="",
                    help="genotype string (train kind; default: the "
                         "config's training.geno_type)")
    ap.add_argument("--depth", type=int, default=-1)
    ap.add_argument("--meta_node_num", type=int, default=-1)
    args = ap.parse_args()

    from senas_tpu.compat import (classify_checkpoint,
                                  import_fixed_checkpoint,
                                  import_search_checkpoint,
                                  load_torch_checkpoint)
    from senas_tpu.core.config import load_config
    from senas_tpu.data import get_dataset_spec
    from senas_tpu.train.checkpoint import CheckpointManager
    from senas_tpu.train.optim import build_optimizer

    cfg = load_config(args.config)
    ckpt = load_torch_checkpoint(args.checkpoint)
    kind = classify_checkpoint(ckpt) if args.kind == "auto" else args.kind
    if kind == "state_dict":
        kind = "train"  # bare SenasModel state_dict
    spec = get_dataset_spec(cfg["data"]["dataset"])
    hw = spec.crop_size
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    x0 = jnp.zeros((1, hw[0], hw[1], spec.in_channels), jnp.float32)

    if kind == "train":
        from senas_tpu.compat import ZOO_MODEL_NAMES, import_zoo_checkpoint
        from senas_tpu.models.factory import get_segmentation_model
        from senas_tpu.runner.train import resolve_genotype
        from senas_tpu.train.trainer import FixedTrainState

        t = cfg["training"]
        depth = args.depth if args.depth > 0 else t.get("depth", 5)
        genotype = resolve_genotype(cfg, args.genotype)
        model = get_segmentation_model(
            args.model, dataset=cfg["data"]["dataset"],
            c=t.get("init_channels", 32), depth=depth,
            supervision=t.get("deep_supervision", False), genotype=genotype,
            double_down_channel=t.get("double_down_channel", False))
        template = model.init({"params": rng}, x0, False)
        if args.model == "senas":
            variables, meta = import_fixed_checkpoint(ckpt, genotype, depth)
        elif args.model in ZOO_MODEL_NAMES:
            variables, meta = import_zoo_checkpoint(ckpt, args.model)
        else:
            raise SystemExit(
                f"--model {args.model!r} has no torch translator (supported: "
                f"senas, {', '.join(ZOO_MODEL_NAMES)})")
        _check_structure(template, variables, args.model)
        tx = build_optimizer(t.get("model_optimizer"))
        state = FixedTrainState.create(
            jax.tree.map(jnp.asarray, variables), tx)
    else:
        from senas_tpu.search.supernet import (SenasSearch, init_arch_params,
                                               normalize_arch)
        from senas_tpu.train.trainer import SearchTrainState

        s = cfg["searching"]
        depth = args.depth if args.depth > 0 else s.get("depth", 5)
        meta_nodes = (args.meta_node_num if args.meta_node_num > 0
                      else s.get("meta_node_num", 3))
        use_sharing = s.get("sharing_normal", True)
        net = SenasSearch(
            in_channels=spec.in_channels, c=s.get("init_channels", 32),
            nclass=spec.num_class, depth=depth, meta_node_num=meta_nodes,
            double_down_channel=s.get("double_down_channel", False),
            supervision=s.get("deep_supervision", False))
        arch0 = init_arch_params(jax.random.split(rng)[1], meta_nodes, depth,
                                 use_sharing=use_sharing)
        aw = normalize_arch(arch0, meta_nodes)
        template = net.init({"params": rng}, x0, aw, False)
        variables, arch, meta = import_search_checkpoint(
            ckpt, depth, meta_nodes, use_sharing=use_sharing, fused=True)
        _check_structure(template, variables, "supernet")
        _check_structure(arch0, arch, "arch params")
        w_tx = build_optimizer(s.get("model_optimizer"))
        a_tx = build_optimizer(s.get("arch_optimizer"))
        aiws = bool(s.get("arch_in_weight_step", True))
        state = SearchTrainState.create(
            jax.tree.map(jnp.asarray, variables),
            jax.tree.map(jnp.asarray, arch), w_tx, a_tx,
            arch_in_weight_step=aiws)

    mgr = CheckpointManager(args.out)
    mgr.save(state, meta, is_best=True, name="last")
    print(f"imported {kind} checkpoint -> {args.out} "
          f"(epoch {meta.get('epoch', 0)}); resume with "
          f"{'training' if kind == 'train' else 'searching'}.resume: "
          f"{args.out}")


if __name__ == "__main__":
    main()
