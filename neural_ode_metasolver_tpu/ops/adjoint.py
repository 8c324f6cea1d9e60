"""Continuous-adjoint differentiation for the fixed-step RK integrator.

The reference's modern path backpropagates through the unrolled solver steps
(discretize-then-optimize); its legacy path exposed torchdiffeq's
``odeint_adjoint`` (odenet_mnist/runner_old.py:59-62,120-130), which instead
integrates the adjoint ODE backward in time.  This module provides that
capability natively:

  forward:   y(t1) by the given parametric tableau over n_steps, storing the
             n_steps+1 grid states y_k (y snapshots only — O(n_steps) in y,
             far below the full per-stage activation memory of
             discretize-then-optimize)
  backward:  the augmented system  d/dt [y, a, g] =
             [f(θ, t, y), -aᵀ ∂f/∂y, -aᵀ ∂f/∂θ]
             integrated backward one forward-interval at a time with the
             *same* tableau, re-seeding y at the stored state y_k at each
             interval boundary, seeded with a(t1) = dL/dy(t1).

The per-interval re-seeding is the standard checkpointed adjoint: without it
(``checkpoint_states=False`` — the O(1)-state variant), y is reconstructed
backward across the whole [t0, t1] span from y1 alone and the reconstruction
error compounds over all steps, biasing the gradient; with it, y is exact at
every interval boundary and only the one-interval local error remains
(measured ~2 orders of magnitude smaller at 8 steps —
tests/test_adjoint.py::test_checkpointed_adjoint_beats_uncheckpointed).

Each backward stage evaluates one ``jax.vjp`` of the RHS, so NFE_backward =
s · n_steps like the forward.  Gradients flow to the solver parameters u, v
only through the forward discretization in the d-t-o path; under the
continuous adjoint the tableau is treated as the integration *method* (no
u-gradient), matching torchdiffeq semantics — use discretize-then-optimize
(the default `odeint_final`) when training u/v.

Tradeoff (tested in tests/test_adjoint.py): adjoint gradients equal
discretize-then-optimize gradients only up to O(h^p) discretization error;
they converge to each other as n_steps grows.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from .integrate import _scan_steps
from .tableau import ButcherTableau

Array = jax.Array
# RHS with explicit params: rhs(params, t, y) -> dy/dt
ParamRHS = Callable[[Any, Array, Array], Array]

__all__ = ["odeint_final_adjoint"]


def _integrate(tableau, rhs, params, y0, time_grid, unroll=1,
               return_trajectory=False):
    return _scan_steps(
        tableau, lambda t, y: rhs(params, t, y), y0, time_grid,
        unroll=unroll, return_trajectory=return_trajectory,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6, 7))
def odeint_final_adjoint(
    tableau: ButcherTableau,
    rhs: ParamRHS,
    params: Any,
    y0: Array,
    time_grid: Array,
    n_steps_bwd: int = 0,
    unroll: int = 1,
    checkpoint_states: bool = True,
) -> Array:
    """y(t1) with continuous-adjoint gradients w.r.t. ``params`` and ``y0``.

    ``rhs(params, t, y)`` must take its parameters explicitly (they are what
    the adjoint accumulates gradients for).  ``time_grid`` as from
    :func:`make_time_grid`.

    ``checkpoint_states=True`` (default) stores the forward grid states and
    re-seeds y at each interval boundary on the way back;  ``n_steps_bwd``
    is then the number of backward sub-steps per forward interval (0 = 1).
    With ``checkpoint_states=False`` (O(1)-state, torchdiffeq-style) y is
    reconstructed from y1 across the whole span and ``n_steps_bwd`` is the
    total number of backward steps (0 = same as forward).
    """
    y_final, _ = _integrate(tableau, rhs, params, y0, time_grid, unroll)
    return y_final


def _fwd(tableau, rhs, params, y0, time_grid, n_steps_bwd, unroll,
         checkpoint_states):
    if checkpoint_states:
        y1, ys = _integrate(
            tableau, rhs, params, y0, time_grid, unroll,
            return_trajectory=True,
        )
        # post-step states only, (n_steps, *y.shape): the backward sweep
        # re-seeds each interval at its UPPER grid state, so y0 itself is
        # never read — storing it would be a dead snapshot in the residuals
        return y1, (tableau, params, ys, time_grid)
    y1, _ = _integrate(tableau, rhs, params, y0, time_grid, unroll)
    return y1, (tableau, params, y1, time_grid)


def _aug_rhs_factory(rhs, params, t_map):
    """RHS of the backward augmented system in the reversed time variable
    s, with ``t_map(s)`` giving real time (backward in t flips signs:
    dy/ds = -f, da/ds = +aᵀ∂f/∂y, dg/ds = +aᵀ∂f/∂θ)."""

    def aug_rhs(t, aug):
        y, a, _g = aug
        t_real = t_map(t)

        def f(p, y_):
            return rhs(p, t_real, y_)

        fy, vjp_fn = jax.vjp(f, params, y)
        d_params, d_y = vjp_fn(a)
        return (-fy, d_y, d_params)

    return aug_rhs


def _bwd(rhs, n_steps_bwd, unroll, checkpoint_states, res, ct):
    tableau, params, saved, time_grid = res
    zero_params = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p), params
    )

    if checkpoint_states:
        m = n_steps_bwd or 1  # backward sub-steps per forward interval
        frac = jnp.linspace(0.0, 1.0, m + 1, dtype=time_grid.dtype)

        # reverse-order per-interval inputs: stored upper state + endpoints
        y_his = saved[::-1]
        t_los = time_grid[:-1][::-1]
        t_his = time_grid[1:][::-1]

        def interval_body(carry, inp):
            a, g = carry
            y_hi, t_lo, t_hi = inp
            aug_rhs = _aug_rhs_factory(
                rhs, params, lambda s: t_hi + t_lo - s
            )
            grid = t_lo + (t_hi - t_lo) * frac
            (y_lo_rec, a_new, g_new), _ = _scan_steps(
                tableau, aug_rhs, (y_hi, a, g), grid, unroll=unroll,
            )
            del y_lo_rec  # next interval re-seeds from the stored state
            return (a_new, g_new), None

        (a0, g), _ = lax.scan(
            interval_body, (ct, zero_params), (y_his, t_los, t_his)
        )
    else:
        y1 = saved
        t0 = time_grid[0]
        t1 = time_grid[-1]
        n_fwd = time_grid.shape[0] - 1
        n_bwd = n_steps_bwd or n_fwd
        aug_rhs = _aug_rhs_factory(rhs, params, lambda s: t1 + t0 - s)
        frac = jnp.linspace(0.0, 1.0, n_bwd + 1, dtype=time_grid.dtype)
        grid_b = t0 + (t1 - t0) * frac
        (y0_rec, a0, g), _ = _scan_steps(
            tableau, aug_rhs, (y1, ct, zero_params), grid_b, unroll=unroll,
        )
        del y0_rec

    # cotangents for (tableau, params, y0, time_grid)
    ct_tab = jax.tree_util.tree_map(lambda c: jnp.zeros_like(c), tableau)
    ct_grid = jnp.zeros_like(time_grid)
    return (ct_tab, g, a0, ct_grid)


odeint_final_adjoint.defvjp(_fwd, _bwd)
