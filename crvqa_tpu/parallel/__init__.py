from .mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    host_all_gather,
    initialize_multihost,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "host_all_gather",
    "initialize_multihost",
]
