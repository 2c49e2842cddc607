"""Device-mesh parallelism: sharded aggregation, mesh helpers."""
from coma_tpu.parallel.sharding import (
    default_mesh,
    pad_batch,
    shard_state_over_h,
    sharded_contact_aggregate,
    sharded_occupancy_aggregate,
)

__all__ = [
    "default_mesh",
    "pad_batch",
    "shard_state_over_h",
    "sharded_contact_aggregate",
    "sharded_occupancy_aggregate",
]
