from ccd_tpu.parallel.mesh import (
    batch_sharding, data_mesh, replicated_sharding, shard_batch,
    shard_stacked_batch,
)

__all__ = ["data_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "shard_stacked_batch"]
