"""Device-mesh / sharding layer — the distributed backend of the framework.

The reference's only parallelism is single-host nn.DataParallel plus a
hand-rolled scatter/replicate path for the supernet (SURVEY.md §2.2;
reference experiments/train_model.py:135-137, search/senas_search.py:262-279).
Here the equivalent — and its generalization — is ONE abstraction:
a `jax.sharding.Mesh` with named axes, jit with sharding annotations, and
XLA-inserted collectives over ICI.

Axes:
  * "data"    — batch sharding (the DataParallel equivalent). Gradients are
                reduced by XLA `psum` automatically (GSPMD), replacing NCCL
                broadcast/gather.
  * "spatial" — optional spatial partitioning of the image H axis. XLA GSPMD
                inserts halo exchanges for the convs; this is the TPU-native
                scaling axis for large medical volumes where batch is small
                (the reference's analogous axis is crop/resize at data time,
                SURVEY.md §5 "long-context").

Model/arch parameters are replicated: the supernet's arch tables are k×6
scalars tables, and the CNN weights are small relative to activations — the
bandwidth-optimal layout for this family is pure data+spatial sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: call once per process before any jax use.

    On a multi-host TPU slice (or with SENAS_COORDINATOR/JAX_COORDINATOR
    env set), runs `jax.distributed.initialize` so `jax.devices()` returns
    the GLOBAL device set and the mesh layer below works unchanged —
    `make_mesh()` then spans all hosts and GSPMD rides ICI/DCN for the
    collectives. Single-process (this environment, and the reference's
    single-host scope) is a no-op.

    Explicit args override the environment. On Cloud TPU the arguments can
    all be None (JAX autodetects via the metadata server).
    """
    import os

    coord = coordinator_address or os.environ.get(
        "SENAS_COORDINATOR") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else (
        int(os.environ["SENAS_NUM_PROCESSES"])
        if "SENAS_NUM_PROCESSES" in os.environ else None)
    pid = process_id if process_id is not None else (
        int(os.environ["SENAS_PROCESS_ID"])
        if "SENAS_PROCESS_ID" in os.environ else None)
    if coord is None and nproc is None:
        return  # single-process
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)


def assemble_global_batch(mesh: Mesh, host_batch: Dict[str, Any],
                          spatial: bool = True) -> Dict[str, Any]:
    """Per-process batch assembly for multi-host data loading.

    Each process loads only its local shard of the global batch (global
    batch size = local batch size x process_count); this stitches the local
    numpy arrays into global jax.Arrays with the standard data(+spatial)
    sharding via `jax.make_array_from_process_local_data`. Single-process
    it is equivalent to `shard_batch`.
    """
    nproc = jax.process_count()
    out = {}
    for k, v in host_batch.items():
        if v.ndim >= 4:
            s = batch_sharding(mesh, spatial)
        elif v.ndim == 3:
            s = label_sharding(mesh, spatial)
        else:
            s = NamedSharding(mesh, P("data"))
        global_shape = (v.shape[0] * nproc,) + tuple(v.shape[1:])
        out[k] = jax.make_array_from_process_local_data(s, v, global_shape)
    return out


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh description. data*spatial must equal the device count."""

    data: int
    spatial: int = 1

    @property
    def axis_names(self):
        return ("data", "spatial")


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              spec: Optional[MeshSpec] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spec is None:
        spec = MeshSpec(data=n, spatial=1)
    assert spec.data * spec.spatial == n, (
        f"mesh {spec} does not match {n} devices")
    arr = np.array(devices).reshape(spec.data, spec.spatial)
    return Mesh(arr, spec.axis_names)


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for [B, H, W, C] batches: B over data, H over spatial."""
    return NamedSharding(mesh, P("data", "spatial" if spatial else None, None, None))


def label_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for [B, H, W] integer label maps."""
    return NamedSharding(mesh, P("data", "spatial" if spatial else None, None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any], spatial: bool = True) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh with data(+spatial) sharding."""
    out = {}
    for k, v in batch.items():
        if v.ndim >= 4:
            s = batch_sharding(mesh, spatial)
        elif v.ndim == 3:
            s = label_sharding(mesh, spatial)
        else:
            s = NamedSharding(mesh, P("data"))
        out[k] = jax.device_put(v, s)
    return out


def place_state(mesh: Mesh, state):
    """Replicate a train state pytree across the mesh (committed)."""
    rep = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def shard_train_step(step_fn, mesh: Mesh, donate_state: bool = True,
                     static_argnums=()):
    """Jit a train step for the mesh.

    The caller places the state with `place_state` (replicated) and batches
    with `shard_batch` (data+spatial). jit respects those committed
    shardings; GSPMD propagates them through the step and inserts the
    gradient psum over "data" / halo exchanges over "spatial" automatically.
    """
    return jax.jit(
        step_fn,
        donate_argnums=(0,) if donate_state else (),
        static_argnums=static_argnums,
    )
