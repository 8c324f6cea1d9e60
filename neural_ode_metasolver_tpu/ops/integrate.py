"""Generic fixed-grid explicit Runge-Kutta integration as one ``lax.scan``.

Replaces the reference's Python time loop (``RKParametricSolver.integrate``,
sopa/src/solvers/rk_parametric.py:89-123) with a single compiled scan whose
body unrolls the s stages of an arbitrary :class:`ButcherTableau`.  One
integrator covers Euler/RK2/RK3/RK4; differentiation is
discretize-then-optimize through the scan (matching the reference's
backprop-through-the-unrolled-loop semantics, SURVEY.md §3.1), and gradients
also flow to the tableau entries (and hence to the solver parameters u, v).

Grid construction mirrors the reference exactly:
  * from ``n_steps``: ``linspace(t0, t1, n+1)`` (rk_parametric.py:38-47)
  * from ``step_size``: ``arange(ceil((t1-t0)/h + 1)) * h + t0`` with the last
    point clamped to ``t1`` (rk_parametric.py:23-35) — note the final interval
    may be shorter than ``h``.

TPU notes: the step loop is inherently serial (y_{n+1} depends on y_n), so the
parallel axes are batch / ensemble-members / devices, never time.  ``unroll``
lets XLA fuse several steps into one fused region; ``remat`` rematerializes
RHS activations in the backward pass to trade FLOPs for HBM.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

from .tableau import ButcherTableau

__all__ = [
    "make_time_grid",
    "rk_step",
    "odeint_grid",
    "odeint_final",
    "odeint",
]

Array = jax.Array
RHS = Callable[[Array, Array], Array]  # rhs(t, y) -> dy/dt


def make_time_grid(
    t0: float,
    t1: float,
    n_steps: Optional[int] = None,
    step_size: Optional[float] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Build the integration grid (host-side, static shapes).

    Exactly one of ``n_steps`` / ``step_size`` must be given
    (rk_parametric.py:9-10 raises on ambiguity).
    """
    if (n_steps is None) == (step_size is None):
        raise ValueError("exactly one of n_steps / step_size must be given")
    if n_steps is not None:
        # traced endpoints are fine here: the grid SIZE is static (n_steps)
        # and linspace handles array t0/t1, so this path works under jit
        return jnp.linspace(t0, t1, int(n_steps) + 1, dtype=dtype)
    import math

    try:
        t0, t1 = float(t0), float(t1)
    except (TypeError, jax.errors.TracerArrayConversionError) as e:
        raise ValueError(
            "step_size grids need concrete t0/t1 (the number of grid "
            "points depends on their values, which jit cannot trace); "
            "use n_steps or a precomputed time_grid inside jit"
        ) from e
    if step_size <= 0:
        raise ValueError(f"step_size must be positive, got {step_size}")
    # sign-aware span: step_size is a magnitude, the direction comes from
    # (t1 - t0), so backward-time spans (t1 < t0) build a descending grid
    # instead of the empty arange a signed ceil would produce (which made
    # scan a silent no-op)
    direction = 1.0 if t1 >= t0 else -1.0
    n_points = int(math.ceil(abs(t1 - t0) / step_size + 1))
    grid = jnp.arange(n_points, dtype=dtype) * (direction * step_size) + t0
    # Clamp the final point to t1 (rk_parametric.py:31-32).
    clamped = jnp.minimum(grid, t1) if direction > 0 else jnp.maximum(grid, t1)
    return jnp.where(
        jnp.arange(n_points) == n_points - 1, clamped, grid
    ).astype(dtype)


def _check_grid_spans(time_grid, t) -> None:
    """Eager guard against silent linear EXTRApolation: requested times
    must lie inside an explicitly-given grid (the reference asserts
    grid[0]==t[0] and grid[-1]==t[-1], rk_parametric.py:94-95). Skipped
    for traced values — jit cannot branch on them."""
    if isinstance(time_grid, jax.core.Tracer) or isinstance(
        t, jax.core.Tracer
    ):
        return
    try:
        # order the bounds: the grid itself may run backward in time
        lo, hi = sorted((float(time_grid[0]), float(time_grid[-1])))
        t_lo, t_hi = float(jnp.min(t)), float(jnp.max(t))
    except (TypeError, jax.errors.TracerArrayConversionError):
        return
    if t_lo < lo or t_hi > hi:
        raise ValueError(
            f"requested times [{t_lo}, {t_hi}] fall outside the "
            f"integration grid [{lo}, {hi}]; interpolation would "
            f"silently extrapolate"
        )


def _tree_axpy(coeff, x, y):
    """y + coeff * x over matching pytrees (coeff is a scalar array)."""
    return jax.tree_util.tree_map(lambda xe, ye: ye + coeff * xe, x, y)


def _tree_cast_like(x, ref):
    return jax.tree_util.tree_map(
        lambda xe, re_: xe.astype(re_.dtype), x, ref
    )


def rk_step(tableau: ButcherTableau, rhs: RHS, y, t: Array, dt: Array):
    """One explicit RK step: returns dy = dt * sum_i b_i k_i.

    Stage loop is a static Python unroll (s <= 4), so XLA sees a straight-line
    graph of s RHS calls it can fuse (reference per-solver ``_make_step``,
    e.g. rk_parametric_order2stage2.py:87-93).

    ``y`` may be any pytree of arrays (a plain array in the model hot path;
    an augmented (y, a, g) tuple in the continuous-adjoint backward pass).
    """
    s = tableau.stages
    ks = []
    for i in range(s):
        yi = y
        for j in range(i):
            wij = tableau.w[..., i, j]
            yi = _tree_axpy(wij * dt, ks[j], yi)
        ti = t + tableau.c[..., i] * dt
        # Keep RHS inputs in the carry dtype (bf16 under mixed precision);
        # the f32 coefficient products above otherwise promote the stage.
        ks.append(rhs(ti, _tree_cast_like(yi, y)))
    dy = jax.tree_util.tree_map(
        lambda k: k * (tableau.b[..., 0] * dt), ks[0]
    )
    for i in range(1, s):
        dy = _tree_axpy(tableau.b[..., i] * dt, ks[i], dy)
    return dy


def _scan_steps(
    tableau: ButcherTableau,
    rhs: RHS,
    y0: Array,
    time_grid: Array,
    *,
    remat: bool = False,
    unroll: int = 1,
    return_trajectory: bool = False,
):
    t0s = time_grid[:-1]
    dts = time_grid[1:] - time_grid[:-1]

    def body(y, t_dt):
        t, dt = t_dt
        # Stage combination runs in the promoted (>= f32) dtype; the carry is
        # cast back so mixed-precision (bf16 activations, f32 tableau
        # coefficients) keeps a stable scan carry type.
        dy = rk_step(tableau, rhs, y, t, dt)
        y1 = jax.tree_util.tree_map(
            lambda ye, de: (ye + de).astype(ye.dtype), y, dy
        )
        return y1, (y1 if return_trajectory else None)

    if remat:
        body = jax.checkpoint(body)
    y_final, ys = lax.scan(body, y0, (t0s, dts), unroll=unroll)
    return y_final, ys


def odeint_grid(
    tableau: ButcherTableau,
    rhs: RHS,
    y0: Array,
    time_grid: Array,
    *,
    remat: bool = False,
    unroll: int = 1,
) -> Array:
    """Integrate over an explicit grid; returns trajectory at every grid point,
    shape ``(len(grid), *y0.shape)`` (grid[0] row is y0 itself)."""
    _, ys = _scan_steps(
        tableau, rhs, y0, time_grid, remat=remat, unroll=unroll,
        return_trajectory=True,
    )
    return jnp.concatenate([y0[None], ys], axis=0)


def odeint_final(
    tableau: ButcherTableau,
    rhs: RHS,
    y0: Array,
    t0: float = 0.0,
    t1: float = 1.0,
    *,
    n_steps: Optional[int] = None,
    step_size: Optional[float] = None,
    time_grid: Optional[Array] = None,
    remat: bool = False,
    unroll: int = 1,
) -> Array:
    """Integrate and return only y(t1) — the model hot path.

    The reference always materializes the stacked trajectory and takes
    ``y[-1]`` (odenet layers.py:50); returning only the carry avoids the
    O(n_steps) HBM trajectory buffer entirely.
    """
    if time_grid is None:
        time_grid = make_time_grid(
            t0, t1, n_steps=n_steps, step_size=step_size,
            dtype=jnp.result_type(jnp.asarray(y0).dtype, jnp.float32),
        )
    y_final, _ = _scan_steps(
        tableau, rhs, y0, time_grid, remat=remat, unroll=unroll,
        return_trajectory=False,
    )
    return y_final


def odeint(
    tableau: ButcherTableau,
    rhs: RHS,
    y0: Array,
    t: Union[Array, Sequence[float]],
    *,
    n_steps: Optional[int] = None,
    step_size: Optional[float] = None,
    time_grid: Optional[Array] = None,
    remat: bool = False,
    unroll: int = 1,
) -> Array:
    """Reference-parity integrate: returns solution at requested times ``t``.

    Matches ``RKParametricSolver.integrate`` (rk_parametric.py:89-123):
    integrates on the solver grid, then linearly interpolates onto each
    requested output time; output shape ``(len(t), *y0.shape)``.
    When neither ``n_steps``/``step_size``/``time_grid`` is given the grid is
    the requested times themselves (rk_parametric.py:20).
    """
    t = jnp.asarray(t, dtype=jnp.result_type(jnp.asarray(y0).dtype, jnp.float32))
    if time_grid is None:
        if n_steps is None and step_size is None:
            time_grid = t
        else:
            # t[0]/t[-1] pass through unconverted so traced output times
            # work under jit (n_steps keeps the grid shape static)
            time_grid = make_time_grid(
                t[0], t[-1],
                n_steps=n_steps, step_size=step_size, dtype=t.dtype,
            )
            # a self-built grid spans only [t[0], t[-1]]; interior
            # requested times outside that span (non-monotonic t) would
            # silently extrapolate just like an explicit grid would
            _check_grid_spans(time_grid, t)
    else:
        time_grid = jnp.asarray(time_grid, t.dtype)
        _check_grid_spans(time_grid, t)
    ys = odeint_grid(tableau, rhs, y0, time_grid, remat=remat, unroll=unroll)

    # Vectorized linear interpolation of each requested time onto the grid
    # (reference ``_linear_interp``, rk_parametric.py:116-123).
    # searchsorted needs an ascending sequence; a backward-in-time grid
    # (t1 < t0 — decreasing linspace) is handled by flipping the sign of
    # both the grid and the query times, which works traced (no branch).
    direction = jnp.where(
        time_grid[-1] >= time_grid[0], 1, -1
    ).astype(time_grid.dtype)
    idx = jnp.clip(
        jnp.searchsorted(direction * time_grid, direction * t, side="left"),
        1, time_grid.shape[0] - 1,
    )
    t_lo = time_grid[idx - 1]
    t_hi = time_grid[idx]
    y_lo = ys[idx - 1]
    y_hi = ys[idx]
    frac = (t - t_lo) / (t_hi - t_lo)
    # Exact endpoints (t == grid point) take the grid value with no roundoff.
    frac = jnp.where(t == t_hi, jnp.ones_like(frac), frac)
    frac = jnp.where(t == t_lo, jnp.zeros_like(frac), frac)
    bshape = (t.shape[0],) + (1,) * (ys.ndim - 1)
    frac = frac.reshape(bshape)
    # cast back: the f32 frac arithmetic must not promote a bf16 trajectory
    # (odeint_final/odeint_grid return the carry dtype; odeint matches)
    return (y_lo + (y_hi - y_lo) * frac).astype(ys.dtype)
