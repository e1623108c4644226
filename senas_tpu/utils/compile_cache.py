"""Persistent XLA compile-cache setup.

The supernet bilevel step takes 6-15 minutes to compile on the TPU; the
persistent cache makes reruns near-instant — IF it is actually enabled.
Setting JAX_COMPILATION_CACHE_DIR in `os.environ` at script top does NOT
work on this machine: the axon `sitecustomize` imports jax before user code
runs, and jax binds env-backed config values at import time, so the env var
is silently ignored ("cache is disabled/not initialized"). The reliable
path is `jax.config.update` after import — which is what this helper does.
Call it from every entry point (bench, CLIs, graft entry, conftest).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable(cache_dir: str | None = None, min_compile_secs: float = 1.0) -> str:
    """Enable the persistent compilation cache via jax.config (robust against
    pre-imported jax). Returns the cache dir in use."""
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
