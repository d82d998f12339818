"""Device mesh + sharding helpers.

The reference's complete parallelism inventory is NCCL data parallelism
(DDP gradient allreduce + loss-center/metric allreduce, SURVEY.md §2.7/§5).
The TPU-native equivalent: one 1-D ``Mesh(('data',))`` over all chips,
batch-sharded inputs and replicated params under ``jax.jit`` — XLA/GSPMD
inserts the gradient psum over ICI, the DINO-center sum and BatchNorm batch
statistics become global reductions automatically, and multi-host (DCN) is
handled by the same collectives after ``jax.distributed.initialize()``.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put every array in a batch pytree with dim-0 sharding."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_stacked_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put (K, B, ...) multi-step batches: dim 1 (batch) sharded,
    dim 0 (the scan/step axis) replicated."""
    sharding = NamedSharding(mesh, P(None, axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
