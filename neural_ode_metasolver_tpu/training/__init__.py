"""Training/eval engine: jitted train step, optimizers, schedules, eval
harness, metrics, checkpointing."""
from .solver_training import (
    SolverTrainState,
    create_solver_train_state,
    make_solver_train_step,
    solvers_from_state,
)
from .logging import MetricsLogger
from .accuracy_tables import load_accuracy_table, save_accuracy_table
from .profiling import annotate, trace
from .checkpoint import (
    latest_step,
    load_checkpoint_config,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from .evaluate import (
    RegimeSpec,
    accuracy,
    accuracy_ensemble,
    adversarial_accuracy,
    adversarial_accuracy_ensemble,
    make_adversarial_predict,
    make_ensemble_attacked_probs,
    make_ensemble_probs,
    notebook_regime_grid,
    sn_test,
)
from .metrics import RunningAverageMeter, nfe_per_forward, nfe_per_solve
from .optimizers import make_optimizer, with_nonfinite_backoff
from .schedules import (
    constant_lr,
    cyclic_lr,
    cyclic_momentum,
    learning_rate_with_decay,
)
from .train import (
    AttackConfig,
    LossConfig,
    NoiseConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from .fleet import (
    create_fleet_state,
    fleet_keys,
    fleet_member,
    make_fleet_eval_step,
    make_fleet_train_step,
    stack_fleet_solvers,
    tile_fleet,
)

__all__ = [
    "create_fleet_state",
    "fleet_keys",
    "fleet_member",
    "make_fleet_eval_step",
    "make_fleet_train_step",
    "stack_fleet_solvers",
    "tile_fleet",
    "SolverTrainState",
    "create_solver_train_state",
    "make_solver_train_step",
    "solvers_from_state",
    "MetricsLogger",
    "load_accuracy_table",
    "save_accuracy_table",
    "annotate",
    "trace",
    "latest_step",
    "load_checkpoint_config",
    "restore_checkpoint",
    "save_checkpoint",
    "wait_for_checkpoints",
    "accuracy",
    "accuracy_ensemble",
    "adversarial_accuracy",
    "adversarial_accuracy_ensemble",
    "make_adversarial_predict",
    "make_ensemble_attacked_probs",
    "make_ensemble_probs",
    "notebook_regime_grid",
    "RegimeSpec",
    "sn_test",
    "RunningAverageMeter",
    "nfe_per_forward",
    "nfe_per_solve",
    "make_optimizer",
    "with_nonfinite_backoff",
    "constant_lr",
    "cyclic_lr",
    "cyclic_momentum",
    "learning_rate_with_decay",
    "AttackConfig",
    "LossConfig",
    "NoiseConfig",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
]
