"""Continuous-adjoint differentiation for the fixed-step RK integrator.

The reference's modern path backpropagates through the unrolled solver steps
(discretize-then-optimize); its legacy path exposed torchdiffeq's
``odeint_adjoint`` (odenet_mnist/runner_old.py:59-62,120-130), which instead
integrates the adjoint ODE backward in time — O(1) activation memory in the
step count.  This module provides that capability natively:

  forward:   y(t1) by the given parametric tableau over n_steps
  backward:  the augmented system  d/dt [y, a, g] =
             [f(θ, t, y), -aᵀ ∂f/∂y, -aᵀ ∂f/∂θ]
             integrated from t1 back to t0 with the *same* tableau/step count,
             seeded with a(t1) = dL/dy(t1).

Each backward stage evaluates one ``jax.vjp`` of the RHS, so NFE_backward =
s · n_steps like the forward.  Gradients also flow to the solver parameters
u, v only through the forward discretization in the d-t-o path; under the
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

from .integrate import _scan_steps
from .tableau import ButcherTableau

Array = jax.Array
# RHS with explicit params: rhs(params, t, y) -> dy/dt
ParamRHS = Callable[[Any, Array, Array], Array]

__all__ = ["odeint_final_adjoint"]


def _integrate(tableau, rhs, params, y0, time_grid, unroll=1):
    y_final, _ = _scan_steps(
        tableau, lambda t, y: rhs(params, t, y), y0, time_grid,
        unroll=unroll,
    )
    return y_final


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6))
def odeint_final_adjoint(
    tableau: ButcherTableau,
    rhs: ParamRHS,
    params: Any,
    y0: Array,
    time_grid: Array,
    n_steps_bwd: int = 0,
    unroll: int = 1,
) -> Array:
    """y(t1) with continuous-adjoint gradients w.r.t. ``params`` and ``y0``.

    ``rhs(params, t, y)`` must take its parameters explicitly (they are what
    the adjoint accumulates gradients for).  ``time_grid`` as from
    :func:`make_time_grid`.  ``n_steps_bwd``: steps for the backward solve
    (0 = same as forward).
    """
    return _integrate(tableau, rhs, params, y0, time_grid, unroll)


def _fwd(tableau, rhs, params, y0, time_grid, n_steps_bwd, unroll):
    y1 = _integrate(tableau, rhs, params, y0, time_grid, unroll)
    return y1, (tableau, params, y1, time_grid)


def _bwd(rhs, n_steps_bwd, unroll, res, ct):
    tableau, params, y1, time_grid = res
    t0 = time_grid[0]
    t1 = time_grid[-1]
    n_fwd = time_grid.shape[0] - 1
    n_bwd = n_steps_bwd or n_fwd

    zero_params = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p), params
    )

    def aug_rhs(_, t, aug):
        """d/ds of [y, a, g] at s (integrating forward in s = t1 + t0 - t,
        i.e. backward in t, flipping signs accordingly)."""
        y, a, _g = aug
        t_real = t1 + t0 - t

        def f(p, y_):
            return rhs(p, t_real, y_)

        fy, vjp_fn = jax.vjp(f, params, y)
        d_params, d_y = vjp_fn(a)
        # backward in t: dy/ds = -f, da/ds = +aᵀ∂f/∂y, dg/ds = +aᵀ∂f/∂θ
        return (-fy, d_y, d_params)

    aug0 = (y1, ct, zero_params)
    # jit-safe backward grid over [t0, t1] (t0/t1 may be tracers)
    frac = jnp.linspace(0.0, 1.0, n_bwd + 1, dtype=time_grid.dtype)
    grid_b = t0 + (t1 - t0) * frac
    aug1 = _integrate(tableau, aug_rhs, None, aug0, grid_b, unroll)
    y0_rec, a0, g = aug1
    del y0_rec
    # cotangents for (tableau, params, y0, time_grid)
    ct_tab = jax.tree_util.tree_map(lambda c: jnp.zeros_like(c), tableau)
    ct_grid = jnp.zeros_like(time_grid)
    return (ct_tab, g, a0, ct_grid)


odeint_final_adjoint.defvjp(_fwd, _bwd)
