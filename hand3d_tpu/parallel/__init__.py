from hand3d_tpu.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    batch_sharding,
    param_sharding,
    replicate,
    shard_params,
)

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "batch_sharding",
    "param_sharding",
    "replicate",
    "shard_params",
]
