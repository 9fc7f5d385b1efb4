from .mesh import create_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    local_gather,
    local_scatter,
    shard_act_pool,
    shard_aligned_batches,
    batch_spec,
    param_specs,
    shard_batch,
    shard_params,
    shard_state,
)
