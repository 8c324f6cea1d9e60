"""Parallelism: device mesh, dp/tp shardings, ensemble parallelism."""
from .ensemble import ensemble_integrate, stack_solver_params
from .mesh import (
    batch_sharding,
    make_mesh,
    make_parallel_train_step,
    replicated,
    shard_opt_state_tp,
    shard_params_tp,
)

__all__ = [
    "ensemble_integrate",
    "stack_solver_params",
    "batch_sharding",
    "make_mesh",
    "make_parallel_train_step",
    "replicated",
    "shard_opt_state_tp",
    "shard_params_tp",
]
