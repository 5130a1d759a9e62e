"""Device-mesh sharding layer.

The reference's only parallelism is single-host nn.DataParallel
(lib_shape_prior/core/models/model_base.py:221-227). Here parallelism is
SPMD over a `jax.sharding.Mesh`:

* axis "dp" — data parallelism over scenes / object instances / training
  batch (replaces DataParallel scatter-gather; gradient psum is inserted
  by XLA from the sharding annotations).
* axis "qp" — query-point parallelism for SDF grid evaluation (replaces
  the reference's host-side chunk loops, mesh_extractor2.py:141-156).

Collectives ride ICI when the mesh follows the physical torus; a second
mesh dimension can map "dp" across DCN for multi-pod training.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("dp",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the available devices (default: 1-D "dp")."""
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a host batch dict onto the mesh, leading axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate params / optimizer state on every device."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
