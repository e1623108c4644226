"""Shared runner plumbing: config resolution, loaders, eval loop."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from senas_tpu.data import DataLoader, get_dataset, get_dataset_spec
from senas_tpu.train.metrics import SegmentationMetric, AverageMeter
from senas_tpu.utils.compile_cache import enable as _enable_compile_cache

# All runner CLIs share the persistent compile cache: the search-step
# executable is ~100 MB / 6-15 min of XLA time; resume/re-runs hit the disk
# cache instead (jax.config path — env vars don't work here, see the module).
_enable_compile_cache()

DEFAULT_DATA_ROOT = os.environ.get("SENAS_DATA_ROOT", "../data/imgseg/")
DEFAULT_LOG_ROOT = os.environ.get("SENAS_LOG_ROOT", "../logs")


def to_device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {"image": jnp.asarray(batch["image"]),
            "label": jnp.asarray(batch["label"])}


def setup_mesh(section: Dict[str, Any], logger=None):
    """CLI mesh wiring — the pjit generalization of the reference's
    `multi_gpus` flag (experiments/train_model.py:135-137,
    experiments/search_arc.py:119-121 nn.DataParallel; plus the hand-rolled
    supernet replica path search/senas_search.py:262-279).

    Config section keys:
      multi_gpus:   bool — shard over all visible devices (default false).
      mesh_spatial: int  — optional spatial (image-H) axis size; the
                    remaining devices form the data axis. GSPMD inserts the
                    conv halo exchanges automatically.

    Returns a Mesh, or None when disabled / only one device is visible
    (DataParallel over one GPU is a no-op in the reference too).
    """
    from senas_tpu.parallel.mesh import (MeshSpec, initialize_distributed,
                                         make_mesh)
    if not section.get("multi_gpus", False):
        return None
    initialize_distributed()
    devices = jax.devices()
    n = len(devices)
    if n < 2:
        if logger:
            logger.info("multi_gpus requested but only %d device visible — "
                        "running single-device", n)
        return None
    spatial = int(section.get("mesh_spatial", 1))
    if spatial < 1 or n % spatial != 0:
        raise ValueError(
            f"mesh_spatial={spatial} does not divide {n} devices")
    mesh = make_mesh(devices, MeshSpec(data=n // spatial, spatial=spatial))
    if logger:
        logger.info("mesh: %s over %d %s devices",
                    dict(zip(mesh.axis_names, mesh.devices.shape)), n,
                    devices[0].platform)
    return mesh


def check_global_batch(mesh, batch_size: int, what: str = "batch_size"):
    """The config batch size is the GLOBAL batch (reference semantics:
    DataParallel splits the loader batch across GPUs)."""
    if mesh is None:
        return
    data = mesh.shape["data"]
    if batch_size % data != 0:
        raise ValueError(
            f"{what}={batch_size} is not divisible by the mesh data axis "
            f"({data}); pick a multiple so every device gets equal work")


def make_batch_placer(mesh, spatial: bool = False):
    """Returns place(batch)->device batch for the runner hot loops.

    With a mesh: shard B over 'data' (and H over 'spatial') — the jitted
    steps are sharding-agnostic; GSPMD propagates these input shardings and
    inserts the gradient psum / halo collectives. Trailing partial eval
    batches that don't divide the mesh are placed replicated (correct, just
    not parallel — mirrors DataParallel's uneven-last-batch behavior).
    Without a mesh this is `to_device_batch`.
    """
    if mesh is None:
        return to_device_batch
    from senas_tpu.parallel.mesh import replicate, shard_batch
    data = mesh.shape["data"]
    sp = mesh.shape["spatial"]

    def place(batch):
        b, h = batch["image"].shape[0], batch["image"].shape[1]
        use_spatial = spatial and sp > 1 and h % sp == 0
        if b % data == 0:
            return shard_batch(mesh, {"image": np.asarray(batch["image"]),
                                      "label": np.asarray(batch["label"])},
                               spatial=use_spatial)
        rep = replicate(mesh)
        return {"image": jax.device_put(np.asarray(batch["image"]), rep),
                "label": jax.device_put(np.asarray(batch["label"]), rep)}

    return place


class DeferredMetrics:
    """Batches device->host metric readbacks so the step stream stays async.

    A per-step `float(m["loss"])` forces a full dispatch-pipeline sync —
    measured ~30 ms/step through the TPU tunnel at PROMISE12 shapes
    (172 -> 143 ms/step when removed). Device metric dicts queue here and
    are materialized in ONE `jax.device_get` every `drain_every` pushes
    (and at report/epoch boundaries via an explicit `drain()`)."""

    _KEYS = ("loss", "tp", "fp", "fn", "acc")

    def __init__(self, metric: SegmentationMetric, loss_meter: AverageMeter,
                 drain_every: int = 16):
        self.metric = metric
        self.loss_meter = loss_meter
        self.drain_every = drain_every
        self._pending: List[Dict[str, Any]] = []
        self._sizes: List[int] = []

    def push(self, m: Dict[str, Any], n: int = 1) -> None:
        self._pending.append({k: m[k] for k in self._KEYS if k in m})
        self._sizes.append(n)
        if len(self._pending) >= self.drain_every:
            self.drain()

    def drain(self) -> None:
        if not self._pending:
            return
        for m, n in zip(jax.device_get(self._pending), self._sizes):
            self.loss_meter.update(float(m["loss"]), n=n)
            self.metric.update_counts(m["tp"], m["fp"], m["fn"],
                                      float(m["acc"]))
        self._pending.clear()
        self._sizes.clear()


def run_eval_loop(eval_step_fn, loader: DataLoader, nclass: int,
                  place_fn=to_device_batch):
    """Evaluation epoch: returns (metric, loss_meter). A trailing partial
    batch triggers one extra jit trace (static shapes kept exact)."""
    metric = SegmentationMetric(nclass)
    loss_meter = AverageMeter()
    acc = DeferredMetrics(metric, loss_meter)
    for batch in loader:
        out = eval_step_fn(place_fn(batch))
        acc.push(out, n=batch["image"].shape[0])
    acc.drain()
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
