from esrganplus_tpu.parallel.mesh import (
    data_sharding,
    local_batch_size,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
    shard_local_batch,
)

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "shard_local_batch", "replicate_tree", "local_batch_size"]
