"""Device-mesh parallelism: sharded aggregation, mesh helpers."""
from coma_tpu.parallel.flagship import (
    data_parallel_generate,
    pad_ragged_batch,
    resolve_mesh,
)
from coma_tpu.parallel.sharding import (
    default_mesh,
    pad_batch,
    shard_state_over_h,
    sharded_contact_aggregate,
    sharded_occupancy_aggregate,
)

__all__ = [
    "data_parallel_generate",
    "default_mesh",
    "pad_batch",
    "pad_ragged_batch",
    "resolve_mesh",
    "shard_state_over_h",
    "sharded_contact_aggregate",
    "sharded_occupancy_aggregate",
]
