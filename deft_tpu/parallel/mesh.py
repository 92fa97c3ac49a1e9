"""Device-mesh construction and sharding specs.

Replaces the reference's single-process multi-GPU DataParallel machinery
(``/root/reference/src/lib/model/data_parallel.py`` + ``scatter_gather.py``,
including the uneven ``chunk_sizes`` logic of opts.py:455-464) with the JAX
SPMD model: one logical program, batch sharded over a ``data`` mesh axis; XLA
emits the gradient all-reduce over ICI from the sharding specs.  Uneven chunks
are unnecessary on homogeneous TPU cores.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and the
same code spans hosts (DCN between slices is handled by the runtime).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Tuple[int, ...] = (), axis_names: Tuple[str, ...] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; default: all local devices on one 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = (len(devices),)
        axis_names = axis_names[:1]
    arr = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input pytrees."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree of [B, ...] arrays onto the mesh, batch-sharded."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
