from .mesh import (
    make_mesh,
    batch_sharding,
    ray_sharding,
    replicated,
    shard_batch,
)
