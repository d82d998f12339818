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


def _take_devices(num_devices: Optional[int]):
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"num_devices={num_devices} > available {len(devices)}")
        devices = devices[:num_devices]
    return devices


def data_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    return Mesh(np.array(_take_devices(num_devices)), (axis_name,))


def pretrain_mesh(num_devices: Optional[int] = None,
                  model_parallel: int = 1) -> Mesh:
    """2-D ``(data, model)`` mesh for Megatron-style tensor parallelism of
    the 65536-wide DINO head (the only layer in CCD big enough to shard).

    The reference is pure DDP — every rank holds the full (256, 65536)
    ``weight_v`` plus its AdamW moments and all-reduces their gradients.
    On TPU the wide head shards cleanly instead: ``last_layer_v``/``g``,
    the (1, 65536) DINO center, and their optimizer moments live
    column-sharded over the ``model`` axis, GSPMD turns the head matmul
    into a per-shard matmul + the 65536-way softmax/center reductions
    into ``psum`` over ICI, and batch stays sharded over ``data``.

    ``model_parallel=1`` degrades to the plain 1-D data mesh so every
    existing call site keeps its layout.

    The ``(n // mp, mp)`` reshape assumes ``jax.devices()`` enumerates
    ICI-adjacent chips consecutively (true for TPU slices, where the default
    device order walks the torus) so each model group stays on neighboring
    chips; model groups are also assumed NOT to span hosts (checkpoint
    save/restore gathers state with ``jax.device_get``, which requires
    fully-addressable arrays — see train.py).
    """
    mp = max(int(model_parallel or 1), 1)
    if mp == 1:
        return data_mesh(num_devices)
    devices = _take_devices(num_devices)
    n = len(devices)
    if n % mp != 0:
        raise ValueError(f"model_parallel={mp} must divide device count {n}")
    if jax.process_count() > 1:
        per_host = n // jax.process_count()
        if per_host % mp != 0:
            raise ValueError(
                f"model_parallel={mp} would span hosts ({per_host} local "
                "devices per process): state gathering (jax.device_get in "
                "the checkpoint path) needs fully-addressable model groups")
    return Mesh(np.array(devices).reshape(n // mp, mp), ("data", "model"))


# parameter leaves column-sharded over the 'model' axis: the DINO head's
# weight-normed final linear (bottleneck 256 -> out_dim 65536) and its gain
_MODEL_SHARDED_KEYS = frozenset({"last_layer_v", "last_layer_g"})


def pretrain_state_shardings(state: Any, mesh: Mesh) -> Any:
    """Per-leaf NamedSharding pytree for a ``PretrainState`` on ``mesh``.

    On a 1-D data mesh everything is replicated (the round-1/2 layout). On
    a ``(data, model)`` mesh, every 2-D leaf named ``last_layer_v``/``g``
    (student params, teacher params, and their AdamW ``mu``/``nu`` moments,
    whose pytrees mirror the param dict) plus the (1, out_dim) DINO
    ``center`` buffer shard their last axis over ``model``; everything else
    replicates. GSPMD propagates the rest: head logits come out
    column-sharded, loss softmaxes/center sums become ICI ``psum``s.
    """
    if "model" not in mesh.axis_names:
        rep = replicated_sharding(mesh)
        return jax.tree.map(lambda _: rep, state)
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, "model"))
    mp = mesh.shape["model"]

    def rule(path, leaf):
        names = [getattr(e, "key", None) or getattr(e, "name", None)
                 for e in path]
        # qualified match: last_layer_{v,g} only under a module named
        # 'head' (student/teacher params and their mirrored AdamW moments);
        # 'center' only as the top-level PretrainState buffer — a future
        # coincidentally-named leaf elsewhere must NOT silently column-shard
        is_head_ll = (names and names[-1] in _MODEL_SHARDED_KEYS
                      and "head" in names[:-1])
        is_center = names == ["center"]
        if getattr(leaf, "ndim", 0) == 2 and (is_head_ll or is_center):
            if leaf.shape[-1] % mp != 0:
                raise ValueError(
                    f"cannot column-shard {'/'.join(map(str, names))} "
                    f"{leaf.shape} over model_parallel={mp}: last dim not "
                    "divisible")
            return col
        return rep

    return jax.tree_util.tree_map_with_path(rule, state)


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
