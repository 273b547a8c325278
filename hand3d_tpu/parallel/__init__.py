from hand3d_tpu.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    batch_sharding,
    param_sharding,
    replicate,
    shard_params,
)
from hand3d_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    posenet_pipeline_loss,
    stack_refinement_params,
    unstack_refinement_params,
)

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "make_pipeline_mesh",
    "batch_sharding",
    "param_sharding",
    "posenet_pipeline_loss",
    "replicate",
    "shard_params",
    "stack_refinement_params",
    "unstack_refinement_params",
]
