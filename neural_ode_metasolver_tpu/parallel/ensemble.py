"""Ensemble parallelism: vmap over stacked solver parameters, sharded over a
mesh axis.

The reference builds solver ensembles by deep-copying solver objects and
looping (solvers/utils.py:100-117; odenet layers.py:42-46).  TPU-native
ensembling stacks the scalar solver parameters into one array, vmaps the
integration over the member axis, and lays that axis out on the mesh — XLA
turns the weighted combination into a cross-member reduction over ICI.

Works for homogeneous ensembles (same method/step-count, different u/v —
which is what ensemble-by-noising produces).  Heterogeneous ensembles use the
lax.switch path in ops/regimes.py instead.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.integrate import odeint_final
from ..ops.solver import ParametricSolver
from ..ops.tableau import rk2_tableau, rk3_tableau, rk4_tableau

__all__ = ["stack_solver_params", "ensemble_integrate"]


def stack_solver_params(solvers: Sequence[ParametricSolver]):
    """Stack a homogeneous solver list's (u, v) into arrays of shape (n,)."""
    ref = solvers[0]
    if ref.u is None:
        # euler has no solver parameters (u=v=None, quirk 13): there is
        # nothing to vmap over and _tableau_from has no euler branch —
        # fail here with a clear message instead of a vmap axis error
        raise ValueError(
            f"ensemble_integrate needs a parametric solver family "
            f"(rk2/rk3/rk4); {ref.method!r} members are all identical — "
            "a member-sharded ensemble of them is a no-op"
        )
    for s in solvers[1:]:
        if (
            s.method != ref.method
            or s.parameterization != ref.parameterization
            or s.n_steps != ref.n_steps
            or s.step_size != ref.step_size
            or s.custom_grid != ref.custom_grid
            # frozen gates stop_gradient on every member's tableau
            # (one_member below applies ref.frozen to all), so a mixed
            # frozen/unfrozen list would silently mis-route gradients
            or s.frozen != ref.frozen
        ):
            raise ValueError(
                "ensemble_integrate needs a homogeneous ensemble; use the "
                "regimes lax.switch path for mixed solvers"
            )
    u = jnp.stack([s.u for s in solvers]) if ref.u is not None else None
    v = jnp.stack([s.v for s in solvers]) if ref.v is not None else None
    return ref, u, v


def _tableau_from(method, parameterization, u, v):
    if method == "rk2":
        return rk2_tableau(u)
    if method == "rk3":
        return rk3_tableau(u, v)
    if method == "rk4":
        return rk4_tableau(u, v, parameterization)
    raise ValueError(method)


def ensemble_integrate(
    solvers: Sequence[ParametricSolver],
    rhs,
    y0: jax.Array,
    weights: Optional[Sequence[float]] = None,
    *,
    t0: float = 0.0,
    t1: float = 1.0,
    mesh: Optional[Mesh] = None,
    member_axis: str = "ensemble",
    remat: bool = False,
    unroll: int = 1,
) -> jax.Array:
    """Weighted solver-ensemble integration, vmapped over members.

    With ``mesh`` given, the per-member intermediate is sharded over
    ``member_axis`` so each member's ODE solve runs on its own mesh slice;
    the weighted sum reduces across the axis (one psum over ICI).
    """
    ref, u, v = stack_solver_params(solvers)
    n = len(solvers)
    if weights is None:
        weights = [1.0 / n] * n
    w = jnp.asarray(weights, y0.dtype)

    # custom_grid overrides n_steps/step_size, matching
    # ParametricSolver.time_grid's precedence — ignoring it here would
    # silently integrate members on the wrong grid
    grid = (jnp.asarray(ref.custom_grid, jnp.float32)
            if ref.custom_grid is not None else None)

    def one_member(u_i, v_i):
        tab = _tableau_from(ref.method, ref.parameterization, u_i, v_i)
        if ref.frozen:
            tab = jax.tree_util.tree_map(jax.lax.stop_gradient, tab)
        if grid is not None:
            return odeint_final(tab, rhs, y0, t0, t1, time_grid=grid,
                                remat=remat, unroll=unroll)
        return odeint_final(
            tab, rhs, y0, t0, t1,
            n_steps=ref.n_steps, step_size=ref.step_size,
            remat=remat, unroll=unroll,
        )

    if v is None:
        ys = jax.vmap(lambda ui: one_member(ui, None))(u)
    else:
        ys = jax.vmap(one_member)(u, v)

    if mesh is not None:
        ys = jax.lax.with_sharding_constraint(
            ys, NamedSharding(mesh, P(member_axis))
        )
    return jnp.tensordot(w, ys, axes=1)
