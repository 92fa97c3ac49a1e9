"""DEFT-TPU: a TPU-native joint detection + tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MedChaabane/DEFT (arXiv:2102.02267): CenterNet-style detection with
per-detection appearance embeddings, a learned pairwise affinity head, LSTM /
Kalman motion gating, and Hungarian track association -- redesigned around a
single jitted per-frame program with fixed shapes, NHWC layout, and
`jax.sharding` data parallelism.
"""

__version__ = "0.1.0"
