"""Device-mesh parallelism: mesh construction, shard_map data parallelism,
coefficient-axis tensor parallelism, and depth pipeline parallelism."""

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
from sake_tpu.parallel.tensor_parallel import (
    tp_model_forward,
)
from sake_tpu.parallel.pipeline import (
    pp_model_forward,
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
    "tp_model_forward",
    "pp_model_forward",
]
