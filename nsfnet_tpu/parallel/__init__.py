from nsfnet_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    initialize_distributed,
    pad_rows,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "initialize_distributed",
    "pad_rows",
    "replicated_sharding",
    "shard_batch",
]
