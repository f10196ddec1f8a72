from fastspeech2_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    replicated,
)
from fastspeech2_tpu.parallel.sharding import (
    param_partition_spec,
    shard_variables,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharding",
    "make_mesh",
    "replicated",
    "param_partition_spec",
    "shard_variables",
]
