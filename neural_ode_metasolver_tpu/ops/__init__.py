"""Solver core: parametric Butcher tableaus, the scan integrator, regimes,
and coefficient-noise (smoothing) utilities."""
from .tableau import (
    ButcherTableau,
    euler_tableau,
    rk2_tableau,
    rk3_tableau,
    rk4_tableau,
    midpoint_tableau,
    heun_tableau,
    rk4_standard_tableau,
    rk38_tableau,
    pad_tableau,
    stack_tableaus,
    validity_eps,
)
from .integrate import make_time_grid, rk_step, odeint, odeint_final, odeint_grid
from .solver import ParametricSolver, create_solver, parse_solver_dsl
from .noise import (
    sample_noise,
    noise_params,
    noise_solver,
    solver_ensemble_by_noising,
)
from .adjoint import odeint_final_adjoint
from .regimes import SolverOptions, meta_integrate

__all__ = [
    "ButcherTableau",
    "euler_tableau",
    "rk2_tableau",
    "rk3_tableau",
    "rk4_tableau",
    "midpoint_tableau",
    "heun_tableau",
    "rk4_standard_tableau",
    "rk38_tableau",
    "pad_tableau",
    "stack_tableaus",
    "validity_eps",
    "make_time_grid",
    "rk_step",
    "odeint",
    "odeint_final",
    "odeint_grid",
    "ParametricSolver",
    "create_solver",
    "parse_solver_dsl",
    "sample_noise",
    "noise_params",
    "noise_solver",
    "solver_ensemble_by_noising",
    "odeint_final_adjoint",
    "SolverOptions",
    "meta_integrate",
]
