"""Test config: force the JAX CPU backend with 8 virtual devices so the
multi-device sharding paths are exercised without TPU hardware (the standard
JAX fake-backend trick; see SURVEY.md §4)."""

import os

# Force the CPU backend. The env var alone is NOT enough on this machine:
# a sitecustomize hook registers the axon TPU plugin in every interpreter
# and overwrites jax_platforms to "axon,cpu" — so tests would silently
# compete for the single TPU chip (the round-1 "hangs"). The config update
# below takes final precedence; it must happen before any backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the supernet graphs are large; caching makes
# repeat test runs near-instant. Must go through jax.config — env vars are
# bound before user code runs on this machine (utils/compile_cache.py).
from senas_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache(os.environ.get("JAX_COMPILATION_CACHE_DIR",
                             "/tmp/jax_compile_cache"), min_compile_secs=5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
