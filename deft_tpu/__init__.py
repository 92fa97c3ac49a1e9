"""DEFT-TPU: a TPU-native joint detection + tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MedChaabane/DEFT (arXiv:2102.02267): CenterNet-style detection with
per-detection appearance embeddings, a learned pairwise affinity head, LSTM /
Kalman motion gating, and Hungarian track association -- redesigned around a
single jitted per-frame program with fixed shapes, NHWC layout, and
`jax.sharding` data parallelism.
"""

import os

import jax

__version__ = "0.1.0"

# Framework numerics policy: with float32 inputs, matmuls/convs run in true
# float32 (JAX's "default" precision lowers them to bfloat16 passes on TPU,
# which breaks parity targets by ~1e-3).  Performance-critical paths opt into
# bfloat16 explicitly by casting their inputs, which keeps "fast" a visible
# choice instead of a silent default.  Override with DEFT_MATMUL_PRECISION.
jax.config.update(
    "jax_default_matmul_precision",
    os.environ.get("DEFT_MATMUL_PRECISION", "float32"),
)
