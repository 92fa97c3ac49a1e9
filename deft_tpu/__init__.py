"""DEFT-TPU: a TPU-native joint detection + tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MedChaabane/DEFT (arXiv:2102.02267): CenterNet-style detection with
per-detection appearance embeddings, a learned pairwise affinity head, LSTM /
Kalman motion gating, and Hungarian track association -- redesigned around a
single jitted per-frame program with fixed shapes, NHWC layout, and
`jax.sharding` data parallelism.
"""

import os
import sys

__version__ = "0.1.0"

# Framework numerics policy: with float32 inputs, matmuls/convs run in true
# float32 (JAX's "default" precision lowers them to bfloat16 passes on TPU,
# which breaks parity targets by ~1e-3).  Performance-critical paths opt into
# bfloat16 explicitly by casting their inputs, which keeps "fast" a visible
# choice instead of a silent default.  Override with DEFT_MATMUL_PRECISION.
#
# Set via environment rather than `jax.config.update` so that importing the
# package does NOT import jax: data-loader worker processes import only the
# numpy/cv2 half of the package, and dragging jax (~15 s on this host) into
# every worker made pool startup scale with worker count.  jax reads
# JAX_DEFAULT_MATMUL_PRECISION at import; if jax is somehow already imported
# (env var too late), fall through to config.update with the same value.
# Host-side allocation policy: numpy madvises MADV_HUGEPAGE on buffers
# >=4 MB, and with kernel THP defrag in `madvise` mode every fault on such a
# buffer can enter SYNCHRONOUS page compaction.  Measured here: intermittent
# 30-70x stalls (8 ms -> 700 ms) on plain elementwise ops over 6 MB image
# arrays, worsening as memory fragments -- a 3.7x data-loader slowdown.
# Huge pages buy a few percent of TLB reach on this workload; compaction
# stalls cost orders of magnitude more, so default them off (overridable).
if os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0") == "0" \
        and "numpy" in sys.modules:
    # numpy read the env at an earlier import; flip it at runtime
    try:
        sys.modules["numpy"]._core.multiarray._set_madvise_hugepage(False)
    except AttributeError:  # numpy<2 layout
        sys.modules["numpy"].core.multiarray._set_madvise_hugepage(False)

_prec = os.environ.get(
    "DEFT_MATMUL_PRECISION",
    os.environ.get("JAX_DEFAULT_MATMUL_PRECISION", "float32"),
)
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = _prec
if "jax" in sys.modules:
    sys.modules["jax"].config.update("jax_default_matmul_precision", _prec)
del _prec
