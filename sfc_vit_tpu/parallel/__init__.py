"""Parallelism: meshes, shardings, collectives (new vs the reference)."""

from .context import active_sequence_sharding, sequence_sharding
from .pipeline import pipeline_apply, stack_stage_params, stage_sharding
from .pipeline_model import (
    make_pipelined_apply,
    merge_pipeline_params,
    pipeline_state_sharding,
    split_pipeline_params,
)
from .sequence import ring_attention, sequence_parallel_attention
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    apply_fsdp_sharding,
    apply_param_sharding,
    batch_sharding,
    fsdp_sharding_rules,
    global_batch_from_local,
    host_shard_slice,
    init_distributed,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "apply_fsdp_sharding",
    "apply_param_sharding",
    "batch_sharding",
    "fsdp_sharding_rules",
    "global_batch_from_local",
    "host_shard_slice",
    "init_distributed",
    "make_mesh",
    "param_sharding_rules",
    "replicated",
    "shard_batch",
    "sequence_parallel_attention",
    "ring_attention",
    "sequence_sharding",
    "active_sequence_sharding",
    "pipeline_apply",
    "stack_stage_params",
    "stage_sharding",
    "PIPE_AXIS",
    "make_pipelined_apply",
    "merge_pipeline_params",
    "pipeline_state_sharding",
    "split_pipeline_params",
]
