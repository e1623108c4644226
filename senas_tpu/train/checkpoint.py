"""Checkpoint / resume (Orbax): every-epoch save + best-copy semantics.

Parity with the reference (utils/utils.py:138-143, search_arc.py:227-238,
train_model.py:220-233): a rolling "last" checkpoint each epoch plus a
"best" copy when the tracked metric improves; search checkpoints carry the
arch params and BOTH optimizer states. Metadata (epoch, dur_time, patience,
genotype string, best metrics) is NOT part of the array tree — Orbax's
StandardCheckpointer rejects strings/None — it lives in a JSON sidecar
(<name>.meta.json) written atomically next to the checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _mask_empty(tree):
    """Orbax rejects zero-size arrays (e.g. the depth-2 supernet's empty
    gamma table); swap them for 1-element placeholders on save."""
    return jax.tree.map(
        lambda a: np.zeros((1,), a.dtype) if getattr(a, "size", 1) == 0 else a,
        tree)


def _unmask_empty(tree, abstract):
    """Rebuild zero-size leaves from the abstract state's shapes/dtypes."""
    return jax.tree.map(
        lambda restored, orig: (jnp.zeros(orig.shape, orig.dtype)
                                if getattr(orig, "size", 1) == 0 else restored),
        tree, abstract)


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.directory, f"{name}.meta.json")

    def _write_meta(self, name: str, meta: Dict[str, Any]):
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(name))

    def save(self, state: Any, meta: Dict[str, Any], is_best: bool = False,
             name: str = "last"):
        payload = _mask_empty(jax.device_get(state))
        self._ckptr.save(self._path(name), payload, force=True)
        self._ckptr.wait_until_finished()
        self._write_meta(name, meta)
        if is_best:
            self._ckptr.save(self._path("best"), payload, force=True)
            self._ckptr.wait_until_finished()
            self._write_meta("best", meta)

    def restore(self, abstract_state: Any, name: str = "last") -> Optional[Dict[str, Any]]:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        abstract = jax.device_get(abstract_state)
        state = self._ckptr.restore(path, _mask_empty(abstract))
        state = _unmask_empty(state, abstract)
        meta: Dict[str, Any] = {}
        if os.path.exists(self._meta_path(name)):
            with open(self._meta_path(name)) as f:
                meta = json.load(f)
        return {"state": state, "meta": meta}

    def restore_raw(self, name: str = "last") -> Optional[Dict[str, Any]]:
        """Restore without a target pytree: returns the checkpoint as nested
        dicts/lists of arrays plus the meta sidecar. Use when only a subset
        of the state is needed (e.g. eval wants params/batch_stats and must
        not depend on the training run's optimizer structure)."""
        path = self._path(name)
        if not os.path.exists(path):
            return None
        with ocp.PyTreeCheckpointer() as ckptr:
            state = ckptr.restore(path)
        meta: Dict[str, Any] = {}
        if os.path.exists(self._meta_path(name)):
            with open(self._meta_path(name)) as f:
                meta = json.load(f)
        return {"state": state, "meta": meta}

    def exists(self, name: str = "last") -> bool:
        return os.path.exists(self._path(name))
