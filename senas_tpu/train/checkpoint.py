"""Checkpoint / resume (Orbax): every-epoch save + best-copy semantics.

Parity with the reference (utils/utils.py:138-143, search_arc.py:227-238,
train_model.py:220-233): a rolling "last" checkpoint each epoch plus a
"best" copy when the tracked metric improves; search checkpoints carry the
arch params and BOTH optimizer states; metadata (epoch, dur_time, patience,
genotype string, best metrics) rides along as a JSON-serializable dict.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: Any, meta: Dict[str, Any], is_best: bool = False,
             name: str = "last"):
        payload = {"state": jax.device_get(state), "meta": meta}
        path = self._path(name)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        if is_best:
            self._ckptr.save(self._path("best"), payload, force=True)
            self._ckptr.wait_until_finished()

    def restore(self, abstract_state: Any, name: str = "last") -> Optional[Dict[str, Any]]:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        target = {"state": jax.device_get(abstract_state), "meta": None}
        restored = self._ckptr.restore(path, target)
        return restored

    def exists(self, name: str = "last") -> bool:
        return os.path.exists(self._path(name))
