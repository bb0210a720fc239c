"""Device-mesh parallelism: mesh construction and shard_map data parallelism."""

from sake_tpu.parallel.mesh import (
    make_mesh,
    initialize_distributed,
    replicated,
    batch_sharded,
)
from sake_tpu.parallel.data_parallel import (
    make_dp_step,
    make_dp_epoch,
    shard_batch,
    replicate_state,
)

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "replicated",
    "batch_sharded",
    "make_dp_step",
    "make_dp_epoch",
    "shard_batch",
    "replicate_state",
]
