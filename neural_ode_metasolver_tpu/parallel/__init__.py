"""Parallelism: device mesh, dp/tp shardings, ensemble parallelism."""
from .ensemble import ensemble_integrate, stack_solver_params
from .pipeline import PipelineConfig, pipeline_apply, stack_stage_params
from .mesh import (
    batch_sharding,
    host_local_batch_to_global,
    initialize_distributed,
    make_mesh,
    make_parallel_train_step,
    replicated,
    shard_opt_state_tp,
    shard_params_tp,
)

__all__ = [
    "ensemble_integrate",
    "PipelineConfig",
    "pipeline_apply",
    "stack_stage_params",
    "stack_solver_params",
    "batch_sharding",
    "host_local_batch_to_global",
    "initialize_distributed",
    "make_mesh",
    "make_parallel_train_step",
    "replicated",
    "shard_opt_state_tp",
    "shard_params_tp",
]
