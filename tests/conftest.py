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
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# repo-local persistent compile cache: /tmp gets wiped between sessions,
# which costs a full recompile of every model fixture.  Env vars would be
# ignored here (jax already imported, see module docstring) -- use config.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
