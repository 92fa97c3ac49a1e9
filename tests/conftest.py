"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup (axon TPU
plugin), so env vars set here are too late for jax's import-time config read.
Backend selection is lazy though: updating ``jax_platforms`` via jax.config
before the first backend use reliably forces CPU, and XLA_FLAGS is read at
backend init, which also hasn't happened yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
