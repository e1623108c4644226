"""File helpers (reference utils/files.py parity): checkpoint save with a
best-copy, checksum-verified download, mkdir.

`save_checkpoint` here is the thin legacy-layout shim (runs/<dataset>/
<model>/<checkname>/); the framework's real checkpointing is
senas_tpu.train.checkpoint.CheckpointManager (Orbax). `download` keeps the
reference's semantics (skip when present unless overwrite/hash-mismatch,
streaming fetch, sha1 verify) using urllib — note this build environment
is zero-egress, so fetches fail fast with a clear error there.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Optional

__all__ = ["save_checkpoint", "download", "mkdir", "check_sha1"]


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def check_sha1(filename: str, sha1_hash: str) -> bool:
    """True iff the file's sha1 matches (files.py:check_sha1)."""
    sha1 = hashlib.sha1()
    with open(filename, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            sha1.update(chunk)
    return sha1.hexdigest() == sha1_hash


def save_checkpoint(state, dataset: str, model: str, checkname: str,
                    is_best: bool = False,
                    filename: str = "checkpoint.msgpack",
                    root: str = "runs") -> str:
    """Legacy runs/<dataset>/<model>/<checkname>/ layout with a best copy
    (files.py:save_checkpoint). `state` is any pytree; serialized with
    flax.serialization."""
    from flax import serialization

    directory = os.path.join(root, dataset, model, checkname)
    mkdir(directory)
    path = os.path.join(directory, filename)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    if is_best:
        shutil.copyfile(path, os.path.join(directory, "model_best.msgpack"))
    return path


def download(url: str, path: Optional[str] = None, overwrite: bool = False,
             sha1_hash: Optional[str] = None) -> str:
    """Download `url` to `path` (defaults to the URL basename), skipping the
    fetch when the file exists unless overwrite or a hash mismatch."""
    fname = (os.path.join(path, url.split("/")[-1])
             if path and os.path.isdir(path)
             else (path or url.split("/")[-1]))
    if (os.path.exists(fname) and not overwrite
            and (sha1_hash is None or check_sha1(fname, sha1_hash))):
        return fname
    d = os.path.dirname(os.path.abspath(fname))
    if d:
        mkdir(d)
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=30) as resp, \
                open(fname, "wb") as out:
            shutil.copyfileobj(resp, out)
    except OSError as e:
        raise OSError(
            f"download of {url} failed ({e}); note this environment is "
            "zero-egress — place the file at the destination manually") from e
    if sha1_hash and not check_sha1(fname, sha1_hash):
        raise UserWarning(f"corrupted download: sha1 mismatch for {fname}")
    return fname
