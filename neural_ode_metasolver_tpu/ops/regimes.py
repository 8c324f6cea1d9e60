"""Meta-solver regimes: standalone / switch / ensemble dispatch.

The reference dispatches on ``solver_options.solver_mode`` with Python
control flow and host RNG inside ``MetaODEBlock.forward``
(sopa/src/models/odenet_mnist/layers.py:16-50, odenet_cifar10/layers.py:173-207).
Under jit that becomes:

  * standalone — integrate with ``solvers[0]``.
  * switch     — ``jax.random.choice`` over the (static) solver list +
                 ``lax.switch`` over per-solver integration branches.  XLA
                 compiles every branch once; one executes per call.  Branches
                 may have different methods / step counts (heterogeneous
                 switching, as in the published u ∈ {0.5, 1.0} RK2 switch).
  * ensemble   — Bernoulli coin flip (``lax.cond``): heads = weighted sum of
                 every member's output, tails = ``solvers[0]`` alone.

The auxiliary values the reference smuggles through mutated Namespace fields
(``switch_solver_id``, ``ensemble_coin_flip`` — layers.py:28,34) are returned
explicitly as an aux dict so the ss-loss pass can reuse the same choice.

Solver *smoothing* is not a dispatch mode: it perturbs u/v before the forward
(see ops/noise.py), composing with any of the three modes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .solver import ParametricSolver

__all__ = ["SolverOptions", "meta_integrate"]


@dataclass(frozen=True)
class SolverOptions:
    """Static regime configuration (reference ``solver_options`` Namespace,
    runner.py:113-115). All fields are trace-static."""

    solver_mode: str = "standalone"  # standalone | switch | ensemble
    switch_probs: Optional[Sequence[float]] = None
    ensemble_prob: float = 1.0
    ensemble_weights: Optional[Sequence[float]] = None


def _integrate_one(solver: ParametricSolver, rhs, y0, t0, t1, remat, unroll,
                   adjoint=False, rhs_params=None, rhs_with_params=None):
    if adjoint:
        from .adjoint import odeint_final_adjoint
        from .integrate import make_time_grid

        if rhs_with_params is None:
            raise ValueError(
                "adjoint integration needs an explicit-params RHS "
                "(rhs_with_params / rhs_params)"
            )
        grid = solver.time_grid(t0, t1)
        if grid is None:
            grid = jnp.asarray([t0, t1], jnp.float32)
        return odeint_final_adjoint(
            solver.tableau(), rhs_with_params, rhs_params, y0, grid,
            unroll=unroll,
        )
    return solver.integrate_final(rhs, y0, t0, t1, remat=remat, unroll=unroll)


def meta_integrate(
    solvers: Sequence[ParametricSolver],
    rhs,
    y0: jax.Array,
    options: SolverOptions,
    key: Optional[jax.Array] = None,
    *,
    t0: float = 0.0,
    t1: float = 1.0,
    aux_in: Optional[Dict[str, Any]] = None,
    remat: bool = False,
    unroll: int = 1,
    adjoint: bool = False,
    rhs_params: Any = None,
    rhs_with_params=None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Integrate ``y0`` over [t0, t1] under the configured regime.

    ``adjoint=True`` switches to continuous-adjoint differentiation
    (ops/adjoint.py, checkpointed: O(n_steps) stored y-states instead of
    full per-stage activations); the RHS must then be
    given in explicit-params form via ``rhs_with_params(params, t, y)`` +
    ``rhs_params`` (``rhs`` is ignored for the solve itself).

    Returns ``(y(t1), aux)`` where aux records the stochastic choices
    (``switch_solver_id`` / ``ensemble_coin_flip``).  Passing ``aux_in``
    replays a previous call's choices instead of sampling fresh ones — the
    mechanism the reference implements by mutating ``solver_options`` between
    the forward and ss-loss passes (layers.py:28,34 read at :68,:73).
    """
    n = len(solvers)
    mode = options.solver_mode
    if mode not in ("standalone", "switch", "ensemble"):
        raise ValueError(f"unknown solver_mode {mode!r}")
    aux: Dict[str, Any] = {}

    adj = dict(adjoint=adjoint, rhs_params=rhs_params,
               rhs_with_params=rhs_with_params)

    if mode == "standalone":
        # n == 1 must NOT shortcut the other modes: a single-member
        # ensemble still applies its weight after the coin flip and a
        # single-solver switch still records switch_solver_id (reference
        # layers.py:22-48 takes the regime path regardless of len(solvers))
        y = _integrate_one(solvers[0], rhs, y0, t0, t1, remat, unroll, **adj)

    elif mode == "switch":
        if aux_in is not None and "switch_solver_id" in aux_in:
            solver_id = aux_in["switch_solver_id"]
        else:
            if key is None:
                raise ValueError("switch mode needs a PRNG key")
            if options.switch_probs is not None:
                p = jnp.asarray(options.switch_probs, jnp.float32)
            else:
                p = jnp.full((n,), 1.0 / n, jnp.float32)
            solver_id = jax.random.choice(key, n, p=p)
        branches = [
            (lambda s: lambda y: _integrate_one(
                s, rhs, y, t0, t1, remat, unroll, **adj))(s)
            for s in solvers
        ]
        y = lax.switch(solver_id, branches, y0)
        aux["switch_solver_id"] = solver_id

    elif mode == "ensemble":
        if aux_in is not None and "ensemble_coin_flip" in aux_in:
            coin = aux_in["ensemble_coin_flip"]
        else:
            if key is None:
                raise ValueError("ensemble mode needs a PRNG key")
            coin = jax.random.bernoulli(key, options.ensemble_prob)
        if options.ensemble_weights is not None:
            weights = list(options.ensemble_weights)
        else:
            weights = [1.0 / n] * n

        def all_members(y):
            out = None
            for wi, s in zip(weights, solvers):
                yi = _integrate_one(s, rhs, y, t0, t1, remat, unroll, **adj)
                out = wi * yi if out is None else out + wi * yi
            return out

        def first_member(y):
            return _integrate_one(solvers[0], rhs, y, t0, t1, remat, unroll,
                                  **adj)

        y = lax.cond(coin, all_members, first_member, y0)
        aux["ensemble_coin_flip"] = coin

    return y, aux
