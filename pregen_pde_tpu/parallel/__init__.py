from pregen_pde_tpu.parallel.meshes import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from pregen_pde_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_apply,
    stack_stage_params,
)
from pregen_pde_tpu.parallel.fsdp import (
    fsdp_sharding,
    make_fsdp_mesh,
    make_fsdp_train_step,
    shard_for_fsdp,
)
from pregen_pde_tpu.parallel.tensor_parallel import (
    channel_sharded_params,
    make_tp_mesh,
    make_tp_train_step,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "channel_sharded_params",
    "make_tp_mesh",
    "make_tp_train_step",
    "shard_params",
    "make_pp_mesh",
    "pipeline_apply",
    "stack_stage_params",
    "fsdp_sharding",
    "make_fsdp_mesh",
    "make_fsdp_train_step",
    "shard_for_fsdp",
]
