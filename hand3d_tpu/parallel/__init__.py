from hand3d_tpu.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    init_distributed,
    batch_sharding,
    param_sharding,
    replicate,
    shard_params,
)
from hand3d_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    posenet_pipeline_loss,
    refine_param_sharding,
    stack_refinement_params,
    unstack_refinement_params,
)
from hand3d_tpu.parallel.expert import (
    expert_param_sharding,
    make_expert_mesh,
    moe_dense_apply,
    moe_dense_init,
)

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "init_distributed",
    "make_pipeline_mesh",
    "make_expert_mesh",
    "batch_sharding",
    "expert_param_sharding",
    "moe_dense_apply",
    "moe_dense_init",
    "param_sharding",
    "posenet_pipeline_loss",
    "refine_param_sharding",
    "replicate",
    "shard_params",
    "stack_refinement_params",
    "unstack_refinement_params",
]
