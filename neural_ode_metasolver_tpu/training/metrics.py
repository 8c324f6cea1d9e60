"""Training observability: running meters and derived NFE accounting.

The reference counts RHS evaluations with a mutable ``self.nfe`` incremented
per forward (odenet_mnist/layers.py:156-159) and read/zeroed around
``loss.backward()`` (runner.py:184-198).  Under XLA the count is static for
fixed-step solvers, so NFE becomes a *derived* metric: stages x steps per
solve, summed over ODE blocks, doubled for the backward sweep
(discretize-then-optimize re-traverses every stage).
"""
from __future__ import annotations

from typing import Sequence

from ..ops.regimes import SolverOptions
from ..ops.solver import ParametricSolver

__all__ = ["RunningAverageMeter", "nfe_per_solve", "nfe_per_forward"]

_STAGES = {"euler": 1, "rk2": 2, "rk3": 3, "rk4": 4}


class RunningAverageMeter:
    """EMA meter (sopa/src/models/utils.py:17-33; momentum 0.99)."""

    def __init__(self, momentum: float = 0.99):
        self.momentum = momentum
        self.reset()

    def reset(self):
        self.val = None
        self.avg = 0.0

    def update(self, val: float):
        if self.val is None:
            self.avg = val
        else:
            self.avg = self.avg * self.momentum + val * (1.0 - self.momentum)
        self.val = val


def nfe_per_solve(solver: ParametricSolver, t0=0.0, t1=1.0) -> int:
    """RHS evaluations for one ODE solve.

    Grid-source priority matches ``ParametricSolver.time_grid`` exactly
    (custom_grid overrides n_steps/step_size), and the step_size count is
    derived from the real ``make_time_grid`` rather than a re-implemented
    formula, so the reported NFE always describes the solve that actually
    executes.
    """
    stages = _STAGES[solver.method]
    if getattr(solver, "custom_grid", None) is not None:
        n = len(solver.custom_grid) - 1
    elif solver.n_steps is not None:
        n = solver.n_steps
    elif solver.step_size is not None:
        from ..ops.integrate import make_time_grid

        n = int(make_time_grid(t0, t1, step_size=solver.step_size).shape[0]
                ) - 1
    else:
        n = 1
    return stages * n


def nfe_per_forward(
    solvers: Sequence[ParametricSolver],
    options: SolverOptions,
    n_ode_blocks: int,
) -> float:
    """Expected NFE of one model forward under the given regime.

    standalone: blocks * nfe(solver0); switch: probability-weighted expectation;
    ensemble: coin-weighted (all members vs member 0).
    E.g. premetanode10 with one 8-step RK2: 2 blocks x 8 x 2 = 32
    (BASELINE.md NFE row).
    """
    n = len(solvers)
    nfes = [nfe_per_solve(s) for s in solvers]
    if options.solver_mode == "standalone" or n == 1:
        per_block = nfes[0]
    elif options.solver_mode == "switch":
        probs = options.switch_probs or [1.0 / n] * n
        if len(probs) != n:
            raise ValueError(
                f"switch_probs has {len(probs)} entries for {n} solvers"
            )
        per_block = sum(p * f for p, f in zip(probs, nfes))
    elif options.solver_mode == "ensemble":
        p = options.ensemble_prob
        per_block = p * sum(nfes) + (1.0 - p) * nfes[0]
    else:
        raise ValueError(options.solver_mode)
    return per_block * n_ode_blocks
