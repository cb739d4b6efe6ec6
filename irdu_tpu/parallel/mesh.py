"""Device mesh and sharding helpers.

The flagship model is 13.28 M params — data parallelism over the batch
axis is the right decomposition (SURVEY.md §2.9): params replicated,
batch sharded over a 1-D "data" mesh, gradients all-reduced over ICI by
XLA-inserted psums. Spatial (halo-exchange) sharding for huge-image
inference lives in `parallel.spatial`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the mesh; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch (pytree of arrays, leading batch axis) onto the
    mesh, batch-sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
