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


def _shard_local(batch: Any, sharding: NamedSharding) -> Any:
    """Assemble global sharded arrays from per-process local batches.

    Single process: a plain ``device_put``. Multi-process (after
    ``jax.distributed.initialize``): each process holds only its OWN shard of
    the global batch (the DataLoader's rank-strided split), so the global
    array must be assembled with ``make_array_from_process_local_data`` —
    global batch = local batch x process_count. A bare ``device_put`` there
    would treat each process's local batch as the whole global array
    (dropping (P-1)/P of the loaded data and shrinking the real global
    batch), which is exactly the DDP-semantics bug the reference avoids via
    DistributedSampler + per-rank batches (train.py:435).
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Global (B*P, ...) arrays with dim-0 sharding from per-process
    (B, ...) batches."""
    return _shard_local(batch, batch_sharding(mesh, axis_name))


def shard_stacked_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """(K, B, ...) multi-step batches: dim 1 (batch) sharded over processes
    and devices, dim 0 (the scan/step axis) replicated."""
    return _shard_local(batch, NamedSharding(mesh, P(None, axis_name)))
