"""Serving export: package a trained model as a portable StableHLO artifact.

The reference framework's only "deployment" path is re-running
experiments/testing_model.py inside the full training codebase. For
production serving a TPU-native framework can do better: `jax.export`
serializes the jitted eval-mode forward — weights baked in as constants,
batch dimension symbolic — into a self-contained StableHLO artifact that a
serving process can load WITHOUT the model code, the genotype, or the
checkpoint tree, and run on any JAX backend (TPU/CPU).

Artifact layout (a directory):
    model.stablehlo   — jax.export serialized bytes
    meta.json         — input spec (hw, channels), nclass, dtype, notes

Surface:
- ``export_predict_fn(apply_fn, variables, in_shape)`` -> ``Exported``
- ``save_artifact(exported, meta, out_dir)`` / ``load_artifact(out_dir)``
- ``Predictor`` — loaded artifact + argmax mask helper, batch-polymorphic.

CLI: ``tools/export_model.py`` (checkpoint dir -> artifact, with a
round-trip numeric check).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_predict_fn(apply_fn: Callable, variables: Dict[str, Any],
                      in_shape: Tuple[int, int, int],
                      platforms=("tpu", "cpu"),
                      matmul_precision: Optional[str] = None,
                      ) -> "jax_export.Exported":
    """Export eval-mode logits with a symbolic batch dimension.

    ``apply_fn(variables, x, train)`` must return the deep-supervision
    list; the exported function returns only the final logits (the
    testing_model.py serving output). Weights are closed over — the
    artifact is self-contained.

    ``matmul_precision``: None keeps the backend default — on TPU that is
    bf16 MXU inputs, measured ~2 absolute logit error vs a CPU f32
    reference on a random-init c=8 net (direct apply shows the SAME
    divergence; it is platform noise, not an export artifact).
    Pass "float32" for f32-faithful serving (measured 3e-4 vs CPU on the
    same net) at ~1.3-2x the matmul cost.
    """
    h, w, c = in_shape
    frozen = jax.tree.map(jnp.asarray, variables)

    def predict(x):
        out = apply_fn(frozen, x, False)
        if isinstance(out, tuple):  # aux_params models: (masks, labels)
            out = out[0]
        return out[-1] if isinstance(out, (list, tuple)) else out

    if matmul_precision:
        inner = predict

        def predict(x):  # noqa: F811 — precision-wrapped variant
            with jax.default_matmul_precision(matmul_precision):
                return inner(x)

    (b,) = jax_export.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)
    return jax_export.export(jax.jit(predict),
                             platforms=list(platforms))(x_spec)


def save_artifact(exported: "jax_export.Exported", meta: Dict[str, Any],
                  out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(blob)
    meta = dict(meta)
    meta.setdefault("format", "jax.export/stablehlo")
    meta.setdefault("calling_convention_version",
                    int(exported.calling_convention_version))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def load_artifact(out_dir: str) -> Tuple["jax_export.Exported", Dict[str, Any]]:
    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta_path = os.path.join(out_dir, "meta.json")
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return exported, meta


class Predictor:
    """Loaded serving artifact. Batch-polymorphic: any leading batch size
    runs without re-export (XLA compiles per concrete shape and caches).

    ``data_parallel=True`` shards the request batch over every visible
    device (a 1-D ``jax.sharding.Mesh`` on the batch axis; GSPMD runs the
    exported program SPMD — the multi-chip serving path, e.g. a v5e-8
    pod slice serving 8x the batch). Requests whose batch is not a
    multiple of the device count are zero-padded to the next multiple and
    sliced back after — callers see identical semantics either way.
    """

    def __init__(self, out_dir: str, data_parallel: bool = False,
                 devices=None):
        self.exported, self.meta = load_artifact(out_dir)
        self._n_shard = 1
        if data_parallel:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            # Devices must be addressable by THIS process: logits() feeds
            # host numpy arrays, which cannot be laid out onto another
            # host's chips. Default is therefore local_devices(), not the
            # global devices() (identical in single-process serving); a
            # multi-host serving fleet runs one Predictor per host.
            devs = list(devices if devices is not None
                        else jax.local_devices())
            if not devs:
                raise ValueError("Predictor(data_parallel=True): no "
                                 "addressable devices (pass devices=...)")
            mesh = Mesh(np.asarray(devs), ("data",))
            self._n_shard = len(devs)
            self.mesh = mesh
            self._call = jax.jit(
                self.exported.call,
                in_shardings=NamedSharding(mesh, P("data")),
                out_shardings=NamedSharding(mesh, P("data")))
        else:
            self._call = jax.jit(self.exported.call)

    def logits(self, x: np.ndarray) -> jax.Array:
        x = jnp.asarray(x, jnp.float32)
        pad = (-x.shape[0]) % self._n_shard
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            return self._call(x)[: x.shape[0] - pad]
        return self._call(x)

    def predict_masks(self, x: np.ndarray) -> np.ndarray:
        """[B,H,W,C_in] float input -> [B,H,W] uint8 class masks (the
        testing_model.py mask-PNG payload, uint8 for tunnel-cheap
        host readback)."""
        masks = jnp.argmax(self.logits(x), axis=-1).astype(jnp.uint8)
        return np.asarray(jax.device_get(masks))
