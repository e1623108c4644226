#!/usr/bin/env python
"""PROMISE12 Dice-parity rehearsal on phantom data (VERDICT r2 missing #3).

Trains BOTH frameworks' FULL pipelines on an identical synthetic
PROMISE12-format dataset (tools/phantom_promise12.py) and compares val Dice:

  * ours:      senas_tpu TrainRunner — the real promise12 loader
               (CLAHE -> curvature flow -> npy cache -> joint augmentation),
               real trainer/scheduler/metrics.
  * reference: the torch reference's own data layer
               (utils/datasets/promise12.py data_to_array + Promise12 with
               its Compose/RandomTranslate/Flip/Elastic), its
               SegmentationLosses('dice_ce'), SegmentationMetric, SGD +
               CosineAnnealingLR, and the train()/val() epoch semantics of
               experiments/train_model.py:266-357 — run on host CPU with
               shims for packages absent in this environment (SimpleITK /
               skimage / torchvision; the curvature-flow + CLAHE shims are
               backed by senas_tpu.data.augment's parity-tested
               re-implementations, documented deviation).

This exercises the one seam the differential parity suite skips: the real
data layer feeding the real training loop end to end. The two runs use
independent RNG streams — the comparison is converged val Dice (target:
within 0.5 pt), not trajectory equality.

Usage:
  python tools/phantom_promise12.py --dest /tmp/phantom
  python tools/dice_rehearsal.py --side ours      --data-root /tmp/phantom
  python tools/dice_rehearsal.py --side reference --data-root /tmp/phantom
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# ours
# ---------------------------------------------------------------------------

def run_ours(data_root: str, epochs: int, channels: int, depth: int,
             batch: int, log_root: str, seed: int = 0):
    from senas_tpu.runner.train import TrainRunner

    cfg = {
        "seed": seed,
        "model": {"arch": "senas"},
        "data": {"dataset": "promise12", "train_split": "train",
                 "split": "val"},
        "training": {
            "geno_type": "senas_node_4",
            "init_channels": channels, "depth": depth, "epoch": epochs,
            "batch_size": batch, "report_freq": 10, "n_workers": 2,
            "multi_gpus": False, "double_down_channel": False,
            "deep_supervision": False, "grad_clip": 5, "max_patience": 10000,
            "model_optimizer": {"name": "sgd", "lr": 6.0e-3,
                                "weight_decay": 5.0e-4, "momentum": 0.9},
            "loss": {"name": "dice_ce"},
            "lr_schedule": {"name": "cos", "T_max": epochs},
            "resume": None,
        },
    }
    runner = TrainRunner(cfg, model_name="senas", data_root=data_root,
                         log_root=log_root)
    result = runner.run()
    return {"side": "ours", "best_dice": result["best_dice"],
            "best_miou": result["best_miou"]}


# ---------------------------------------------------------------------------
# reference (torch CPU, shimmed third-party packages)
# ---------------------------------------------------------------------------

def _install_reference_shims():
    """Stub the packages the reference data layer imports but which are not
    installed here. SimpleITK's CurvatureFlow and skimage's
    equalize_adapthist are backed by senas_tpu.data.augment's
    re-implementations (differential-tested vs published semantics);
    torchvision.transforms.functional gets exact PIL/numpy equivalents of
    the three ops the reference augmentations use (crop/pad/affine)."""
    import types

    from PIL import Image

    from senas_tpu.data import augment as A
    from senas_tpu.data.io import read_mhd

    def stub(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    # ---- SimpleITK ----
    class _SitkImg:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    def _curvature_flow(image1, timeStep, numberOfIterations):
        out = A.smooth_images(np.asarray(image1.arr, np.float32)[None].copy(),
                              t_step=timeStep, n_iter=numberOfIterations)
        return _SitkImg(out[0])

    stub("SimpleITK",
         ReadImage=lambda path: read_mhd(path),
         GetArrayFromImage=lambda o: o.arr if isinstance(o, _SitkImg)
         else np.asarray(o.array),
         GetImageFromArray=_SitkImg,
         CurvatureFlow=_curvature_flow)

    # ---- skimage ----
    expo = stub("skimage.exposure", equalize_adapthist=A.equalize_adapthist)
    stub("skimage", exposure=expo)

    # ---- torchvision (functional subset used by utils/augmentations) ----
    import torch

    def _crop(img, top, left, height, width):
        return img.crop((left, top, left + width, top + height))

    def _pad(img, padding, fill=0, padding_mode="constant"):
        left, top, right, bottom = padding
        arr = np.array(img)
        mode = "reflect" if padding_mode == "reflect" else "constant"
        pads = ((top, bottom), (left, right)) + ((0, 0),) * (arr.ndim - 2)
        kw = {} if mode == "reflect" else {"constant_values": fill}
        return Image.fromarray(np.pad(arr, pads, mode=mode, **kw),
                               mode=img.mode)

    def _affine(img, angle=0.0, translate=(0, 0), scale=1.0, shear=0.0,
                fillcolor=0, **kw):
        assert angle == 0.0 and scale == 1.0 and shear == 0.0, \
            "shim supports pure translation only (the reference uses only that)"
        tx, ty = int(translate[0]), int(translate[1])
        arr = np.array(img)
        out = np.full_like(arr, fillcolor)
        h, w = arr.shape[:2]
        # output(y, x) = input(y - ty, x - tx)  (torchvision convention:
        # positive translate shifts content right/down)
        out[max(0, ty):h - max(0, -ty), max(0, tx):w - max(0, -tx)] = \
            arr[max(0, -ty):h - max(0, ty), max(0, -tx):w - max(0, tx)]
        return Image.fromarray(out, mode=img.mode)

    class _ToTensor:
        def __call__(self, pic):
            arr = np.array(pic)
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            arr = arr[None] if arr.ndim == 2 else arr.transpose(2, 0, 1)
            return torch.from_numpy(np.ascontiguousarray(
                arr.astype(np.float32)))

    class _Passthrough:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tvf = stub("torchvision.transforms.functional",
               crop=_crop, pad=_pad, affine=_affine)
    tvt = stub("torchvision.transforms", ToTensor=_ToTensor,
               Normalize=_Passthrough, Resize=_Passthrough,
               # names referenced by utils/augmentations/__init__.py's
               # key2aug table (none are exercised by the PROMISE12 path)
               RandomCrop=_Passthrough, RandomHorizontalFlip=_Passthrough,
               RandomVerticalFlip=_Passthrough, Scale=_Passthrough,
               RandomSizedCrop=_Passthrough, RandomRotation=_Passthrough,
               RandomResizedCrop=_Passthrough, CenterCrop=_Passthrough,
               ColorJitter=_Passthrough, Compose=_Passthrough,
               functional=tvf)
    tvt.transforms = tvt  # `from torchvision.transforms import transforms`
    tvu = stub("torchvision.utils", make_grid=lambda *a, **k: None)
    stub("torchvision", transforms=tvt, utils=tvu, functional=tvf,
         datasets=stub("torchvision.datasets"))

    # ---- misc unavailable packages referenced by utils/utils.py etc. ----
    stub("pynvml")
    stub("graphviz", Digraph=object)
    stub("ptflops", get_model_complexity_info=lambda *a, **k: (0, 0))
    stub("torchstat", stat=lambda *a, **k: None)
    stub("adabound", AdaBound=object)
    stub("tensorboardX", SummaryWriter=object)


def _load_reference_modules():
    """Import the reference data/loss/metrics/model modules without running
    the heavyweight package __init__ files (utils/datasets/__init__.py pulls
    in COCO/torchvision datasets)."""
    import importlib
    import importlib.util
    import types

    _install_reference_shims()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    # package contexts so `from .base import BaseDataset` resolves without
    # executing utils/datasets/__init__.py
    for pkg_name, pkg_path in [
            ("utils", os.path.join(REFERENCE, "utils")),
            ("utils.datasets", os.path.join(REFERENCE, "utils", "datasets")),
            ("utils.loss", os.path.join(REFERENCE, "utils", "loss")),
            ("utils.augmentations",
             os.path.join(REFERENCE, "utils", "augmentations"))]:
        if pkg_name not in sys.modules:
            init = os.path.join(pkg_path, "__init__.py")
            if pkg_name == "utils.augmentations" and os.path.isfile(init):
                continue  # light real __init__ (imported below via machinery)
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [pkg_path]
            sys.modules[pkg_name] = pkg

    prom = importlib.import_module("utils.datasets.promise12")
    loss = importlib.import_module("utils.loss.loss")
    metrics = importlib.import_module("utils.metrics")

    spec = importlib.util.spec_from_file_location(
        "ref_senas_model", os.path.join(REFERENCE, "models", "senas_model.py"))
    model_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(model_mod)

    spec_g = importlib.util.spec_from_file_location(
        "ref_geno", os.path.join(REFERENCE, "models", "geno_searched.py"))
    geno_mod = importlib.util.module_from_spec(spec_g)
    spec_g.loader.exec_module(geno_mod)

    from utils.utils import weights_init  # noqa: E402
    return prom, loss, metrics, model_mod, geno_mod, weights_init


def run_reference(data_root: str, epochs: int, channels: int, depth: int,
                  batch: int, seed: int = 0):
    """Faithful CPU re-run of experiments/train_model.py's epoch semantics
    (train: criterion -> backward -> clip(5) -> SGD step; per-epoch cosine
    scheduler step; val: eval + SegmentationMetric best-dice tracking) on
    the reference's own data/loss/metric/model modules."""
    import torch
    from torch.utils import data as tdata

    prom, loss_mod, metrics_mod, model_mod, geno_mod, weights_init = \
        _load_reference_modules()

    torch.manual_seed(seed)
    np.random.seed(seed)
    import random
    random.seed(seed)

    trainset = prom.Promise12(data_root, split="train", mode="train")
    valset = prom.Promise12(data_root, split="val", mode="val")
    train_queue = tdata.DataLoader(trainset, batch_size=batch,
                                   drop_last=True, shuffle=True,
                                   num_workers=0)
    valid_queue = tdata.DataLoader(valset, batch_size=batch,
                                   drop_last=False, shuffle=False,
                                   num_workers=0)

    genotype = geno_mod.senas_node_4
    model = model_mod.SenasModel(2, 1, c=channels, depth=depth,
                                 supervision=False, genotype=genotype,
                                 double_down_channel=False)
    model.apply(weights_init)
    criterion = loss_mod.SegmentationLosses("dice_ce")
    optimizer = torch.optim.SGD(model.parameters(), lr=6.0e-3,
                                momentum=0.9, weight_decay=5.0e-4)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(optimizer,
                                                           T_max=epochs)

    best_dice = best_miou = 0.0
    for epoch in range(epochs):
        model.train()
        metric = metrics_mod.SegmentationMetric(2)
        for inp, tgt in train_queue:
            optimizer.zero_grad()
            predicts = model(inp)
            train_loss = criterion(predicts, tgt)
            metric.update(tgt, predicts[-1])
            train_loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 5)
            optimizer.step()
        scheduler.step()
        _, _, train_dice = metric.get()

        model.eval()
        vmetric = metrics_mod.SegmentationMetric(2)
        vloss_sum = n = 0
        with torch.no_grad():
            for inp, tgt in valid_queue:
                predicts = model(inp)
                vloss_sum += float(criterion(predicts, tgt))
                n += 1
                vmetric.update(tgt, predicts[-1])
        pixacc, miou, dice = vmetric.get()
        if dice > best_dice or miou > best_miou:
            best_dice = max(best_dice, dice)
            best_miou = max(best_miou, miou)
        print(f"[reference] epoch {epoch}: train dice {train_dice:.3f} "
              f"val loss {vloss_sum / max(n, 1):.4f} val dice {dice:.3f} "
              f"mIoU {miou:.3f}", flush=True)
    return {"side": "reference", "best_dice": best_dice,
            "best_miou": best_miou}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ours", "reference"], required=True)
    ap.add_argument("--data-root", default="/tmp/phantom")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX CPU backend (ours side)")
    ap.add_argument("--log-root", default="/tmp/rehearsal_logs")
    ap.add_argument("--out", default=None, help="append result JSON here")
    args = ap.parse_args()

    if args.side == "ours":
        if args.cpu:
            import jax
            jax.config.update("jax_platforms", "cpu")
        res = run_ours(args.data_root, args.epochs, args.channels,
                       args.depth, args.batch, args.log_root, args.seed)
    else:
        res = run_reference(args.data_root, args.epochs, args.channels,
                            args.depth, args.batch, args.seed)
    res.update(epochs=args.epochs, channels=args.channels, depth=args.depth,
               batch=args.batch, seed=args.seed)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
