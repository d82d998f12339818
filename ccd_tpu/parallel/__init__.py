from ccd_tpu.parallel.mesh import (
    batch_sharding, data_mesh, pretrain_mesh, pretrain_state_shardings,
    replicated_sharding, shard_batch, shard_stacked_batch,
)

__all__ = ["data_mesh", "pretrain_mesh", "pretrain_state_shardings",
           "batch_sharding", "replicated_sharding", "shard_batch",
           "shard_stacked_batch"]
