from .tp import param_partition_spec, shard_params_tp, shard_scores_tp
from .zero import shard_opt_state, constrain_opt_state
from .mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    host_all_gather,
    host_all_gather_local,
    is_main_process,
    process_local_slice,
    initialize_multihost,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "host_all_gather",
    "host_all_gather_local",
    "is_main_process",
    "process_local_slice",
    "initialize_multihost",
    "param_partition_spec", "shard_params_tp", "shard_scores_tp",
    "shard_opt_state", "constrain_opt_state",
]
