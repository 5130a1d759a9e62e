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

Multi-host stance: the north-star deployment is a single v5e-8 host —
the model is ~7M params and every workload axis (scenes, instances,
query points, train batch) shards data-parallel with zero collectives,
so one host's ICI domain is the natural scaling unit and nothing in the
design requires DCN. For larger fleets, `initialize_distributed()` below
wires `jax.distributed.initialize` so `jax.devices()` spans all hosts;
`make_mesh` then builds a global mesh and every sharded program in this
repo works unchanged (each host feeds its addressable shard of the
batch). This path is provided and guarded but intentionally untested
here: the environment has one host (SURVEY.md §2.7 DCN remark).
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

log = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Guarded multi-host initialization (DCN / multi-process JAX).

    Call once before any jax op on each host of a multi-host fleet; on a
    single host (or if already initialized) this is a logged no-op and
    returns False. With TPU pod metadata available, argument-free
    `jax.distributed.initialize()` auto-discovers the topology.
    """
    try:
        if jax.process_count() > 1:
            return True  # already initialized
    except Exception:
        pass
    if coordinator_address is None and num_processes is None:
        # Auto-discovery only makes sense on real multi-host TPU pods
        # (TPU_WORKER_HOSTNAMES lists >1 workers there).
        import os

        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([h for h in hosts.split(",") if h]) <= 1:
            log.info(
                "single-host environment: skipping "
                "jax.distributed.initialize"
            )
            return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except Exception as e:  # pragma: no cover - depends on fleet env
        log.warning("jax.distributed.initialize failed: %s", e)
        return False


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
