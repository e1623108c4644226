"""Test config: force the JAX CPU backend with 8 virtual devices so the
multi-device sharding paths are exercised without TPU hardware (the standard
JAX fake-backend trick; see SURVEY.md §4)."""

import os

# Must run before jax is imported anywhere. Force (not setdefault): the
# machine profile sets JAX_PLATFORMS=axon (the TPU tunnel) and tests must
# never compete for the single TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: the supernet graphs are large; caching makes
# repeat test runs near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
