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


def enable(cache_dir: str | None = None, min_compile_secs: float = 1.0,
           verbose: bool | None = None) -> str:
    """Enable the persistent compilation cache via jax.config (robust against
    pre-imported jax). Returns the cache dir in use.

    verbose (or SENAS_CACHE_LOG=1): stream per-compile persistent-cache
    hit/miss lines to stderr (VERDICT r3 #7 — the driver's bench capture
    must record WHY a compile was cold, not leave it to guesswork). The
    jax._src.compiler module logs "Persistent compilation cache hit/miss
    for '<fingerprint>'" at DEBUG level per lowered computation.
    """
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if verbose is None:
        verbose = os.environ.get("SENAS_CACHE_LOG", "0") == "1"
    if verbose:
        import logging
        import sys
        for name in ("jax._src.compiler", "jax._src.compilation_cache"):
            lg = logging.getLogger(name)
            lg.setLevel(logging.DEBUG)
            # stop root-logger propagation: without this every cache event
            # printed TWICE (the [cache] handler + the root handler), which
            # doubled the stdout flood that nulled the round-4 driver
            # capture (VERDICT r4 weak #2)
            lg.propagate = False
            if not any(getattr(h, "_senas_cache_log", False)
                       for h in lg.handlers):
                h = logging.StreamHandler(sys.stderr)
                h.setFormatter(logging.Formatter("[cache] %(message)s"))
                h._senas_cache_log = True
                lg.addHandler(h)
    return cache_dir
