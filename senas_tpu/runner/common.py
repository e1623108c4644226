"""Shared runner plumbing: config resolution, loaders, eval loop."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from senas_tpu.data import DataLoader, get_dataset, get_dataset_spec
from senas_tpu.train.metrics import SegmentationMetric, AverageMeter


DEFAULT_DATA_ROOT = os.environ.get("SENAS_DATA_ROOT", "../data/imgseg/")
DEFAULT_LOG_ROOT = os.environ.get("SENAS_LOG_ROOT", "../logs")


def to_device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {"image": jnp.asarray(batch["image"]),
            "label": jnp.asarray(batch["label"])}


def run_eval_loop(eval_step_fn, loader: DataLoader, nclass: int):
    """Evaluation epoch: returns (metric, loss_meter). A trailing partial
    batch triggers one extra jit trace (static shapes kept exact)."""
    metric = SegmentationMetric(nclass)
    loss_meter = AverageMeter()
    for batch in loader:
        n = batch["image"].shape[0]
        out = eval_step_fn(to_device_batch(batch))
        metric.update_counts(np.asarray(out["tp"]), np.asarray(out["fp"]),
                             np.asarray(out["fn"]), float(out["acc"]))
        loss_meter.update(float(out["loss"]), n=n)
    return metric, loss_meter


def resolve_precision(name):
    """Config `precision:` -> module compute dtype. bf16 is the TPU-native
    choice (params stay f32 masters); default (None/f32) keeps reference
    numerics."""
    if name in (None, "", "f32", "fp32", "float32"):
        return None
    if name in ("bf16", "bfloat16"):
        import jax.numpy as jnp
        return jnp.bfloat16
    raise ValueError(f"unknown precision {name!r} (use f32 or bf16)")


def resolve_dataset_kwargs(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Dataset-specific constructor kwargs from config (synthetic knobs)."""
    name = cfg["data"]["dataset"].lower()
    if name == "synthetic":
        kw = {}
        for key in ("hw", "size", "num_class", "in_channels"):
            if key in cfg["data"]:
                kw[key] = cfg["data"][key]
        return kw
    return {}
