"""Persistent XLA compile cache for the entry points.

First compile of the full fused frame program is minutes (the one-hot DCN
lowering alone is ~6 min on this host); the persistent cache makes every
subsequent process start in seconds.  Called explicitly by bench.py /
train.py / test.py / train_prediction.py -- never at import time.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = ""):
    import jax

    path = path or os.environ.get(
        "DEFT_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
