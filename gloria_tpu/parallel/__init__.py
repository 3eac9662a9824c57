from .mesh import (
    batch_sharding, create_mesh, replicate, shard_batch, shard_batch_per_host,
    shard_params,
)
