"""Solver objects: parametric RK solvers as immutable JAX pytrees.

The reference's solver classes (``RKOrder2Stage2`` etc.) are mutable torch
objects holding ``nn.Parameter u, v`` plus cached tableau attributes, cloned
with ``copy.deepcopy`` for ensembling (sopa/src/solvers/utils.py:101).  Here a
solver is a frozen ``flax.struct`` dataclass whose only array leaves are
``u``/``v``; the tableau is recomputed (cheaply, it's ~20 scalar flops) from
them inside every jitted computation, so there is no build/invalidate
protocol — the reference's ``solver.u = ...; solver.build_ButcherTableau()``
dance (train_validate.py:46-51) becomes ``solver.replace(u=...)``.

Freezing (reference ``freeze_params``/``unfreeze_params``) is a static flag:
frozen solvers wrap their parameters in ``stop_gradient`` when building the
tableau, which is exactly the autodiff semantics of ``requires_grad=False``.

``create_solver`` and the ``--solvers`` mini-DSL keep CLI parity with the
reference (odenet_mnist/runner.py:31-41; solvers/utils.py:13-57).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from .tableau import (
    ButcherTableau,
    euler_tableau,
    rk2_tableau,
    rk3_tableau,
    rk4_tableau,
)
from .integrate import odeint, odeint_final, make_time_grid

__all__ = ["ParametricSolver", "create_solver", "parse_solver_dsl"]

_ORDERS = {"euler": 1, "rk2": 2, "rk3": 3, "rk4": 4}


@struct.dataclass
class ParametricSolver:
    """A fixed-step parametric RK solver.

    Array leaves: ``u``, ``v`` (either may be None).  Everything else is
    static metadata.  vmap/pjit over a stacked ``u`` axis gives solver
    ensembles without deepcopies.
    """

    u: Optional[jax.Array]
    v: Optional[jax.Array]
    method: str = struct.field(pytree_node=False, default="rk2")
    parameterization: Optional[str] = struct.field(
        pytree_node=False, default="u"
    )
    u0: Optional[float] = struct.field(pytree_node=False, default=None)
    v0: Optional[float] = struct.field(pytree_node=False, default=None)
    n_steps: Optional[int] = struct.field(pytree_node=False, default=None)
    step_size: Optional[float] = struct.field(pytree_node=False, default=None)
    # Explicit integration grid (reference's custom ``grid_constructor``,
    # rk_parametric.py:17-18) as a static tuple of time points; overrides
    # n_steps/step_size when set (used e.g. for non-uniform eval grids).
    custom_grid: Optional[tuple] = struct.field(pytree_node=False,
                                                default=None)
    frozen: bool = struct.field(pytree_node=False, default=True)

    # -- parameters ---------------------------------------------------------
    @property
    def order(self) -> int:
        return _ORDERS[self.method]

    def freeze(self) -> "ParametricSolver":
        return self.replace(frozen=True)

    def unfreeze(self) -> "ParametricSolver":
        return self.replace(frozen=False)

    def with_params(self, u=None, v=None) -> "ParametricSolver":
        """Return a solver with new u/v (reference param-update protocol).

        Raises if a parameter is supplied that this solver does not have
        (e.g. ``v`` on an rk2/'u'-parameterized solver) — silently dropping
        it would turn a mistaken update into a no-op.
        """
        new = self
        if u is not None:
            if self.u is None:
                raise ValueError(
                    f"solver {self.method!r}/{self.parameterization!r} has "
                    "no parameter u"
                )
            new = new.replace(u=jnp.asarray(u, dtype=jnp.result_type(self.u)))
        if v is not None:
            if self.v is None:
                raise ValueError(
                    f"solver {self.method!r}/{self.parameterization!r} has "
                    "no parameter v"
                )
            new = new.replace(v=jnp.asarray(v, dtype=jnp.result_type(self.v)))
        return new

    def reset_params(self) -> "ParametricSolver":
        """Restore u0/v0 (reference 'denoise' step, runner.py:201-204).

        Preserves the dtype the solver was created with: a dtype flip here
        would change the dtype-dependent validity eps (tableau numerics)
        and retrigger jit compilation of every step function.
        """
        u_dt = jnp.float32 if self.u is None else jnp.result_type(self.u)
        v_dt = jnp.float32 if self.v is None else jnp.result_type(self.v)
        u = None if self.u0 is None else jnp.asarray(self.u0, u_dt)
        v = None if self.v0 is None else jnp.asarray(self.v0, v_dt)
        return self.replace(u=u, v=v)

    # -- tableau ------------------------------------------------------------
    def tableau(self) -> ButcherTableau:
        u, v = self.u, self.v
        if self.frozen:
            u = None if u is None else jax.lax.stop_gradient(u)
            v = None if v is None else jax.lax.stop_gradient(v)
        if self.method == "euler":
            return euler_tableau()
        if self.method == "rk2":
            return rk2_tableau(u)
        if self.method == "rk3":
            return rk3_tableau(u, v)
        if self.method == "rk4":
            return rk4_tableau(u, v, self.parameterization)
        raise ValueError(f"unknown method {self.method!r}")

    # -- integration --------------------------------------------------------
    def time_grid(self, t0: float = 0.0, t1: float = 1.0):
        if self.custom_grid is not None:
            return jnp.asarray(self.custom_grid, jnp.float32)
        if self.n_steps is None and self.step_size is None:
            return None
        return make_time_grid(
            t0, t1, n_steps=self.n_steps, step_size=self.step_size
        )

    def integrate(self, rhs, y0, t, *, remat: bool = False, unroll: int = 1):
        """Reference-parity integrate: trajectory at requested times ``t``
        (rk_parametric.py:89-113), shape ``(len(t), *y0.shape)``."""
        if self.custom_grid is not None:
            return odeint(
                self.tableau(), rhs, y0, t,
                time_grid=jnp.asarray(self.custom_grid, jnp.float32),
                remat=remat, unroll=unroll,
            )
        return odeint(
            self.tableau(), rhs, y0, t,
            n_steps=self.n_steps, step_size=self.step_size,
            remat=remat, unroll=unroll,
        )

    def integrate_final(
        self, rhs, y0, t0: float = 0.0, t1: float = 1.0,
        *, remat: bool = False, unroll: int = 1,
    ):
        """Fast path: only y(t1) — what the ODE blocks actually consume."""
        if self.custom_grid is not None:
            grid = jnp.asarray(self.custom_grid, jnp.float32)
        elif self.n_steps is not None or self.step_size is not None:
            grid = None
        else:
            grid = jnp.asarray([t0, t1], jnp.float32)
        return odeint_final(
            self.tableau(), rhs, y0, t0, t1,
            n_steps=self.n_steps, step_size=self.step_size,
            time_grid=grid,
            remat=remat, unroll=unroll,
        )


def create_solver(
    method: str,
    parameterization: Optional[str] = "u",
    n_steps: Optional[int] = None,
    step_size: Optional[float] = None,
    u0: Optional[float] = None,
    v0: Optional[float] = None,
    dtype=jnp.float32,
) -> ParametricSolver:
    """Factory with reference semantics (solvers/utils.py:13-57).

    ``-1`` sentinels mean "not set" for n_steps/step_size ONLY — exactly
    the reference's mapping (utils.py:23-27). A ``-1`` in u0/v0 passes
    through verbatim like the reference and is clamped into the validity
    region at tableau build (e.g. rk2 u=-1 -> eps). ``None`` u0/v0 (the
    Python-API default, unreachable from the DSL) selects the
    conventional starting points (rk2 1/2; rk3/rk4 1/3, 2/3)."""
    if n_steps == -1:
        n_steps = None
    if step_size == -1:
        step_size = None
    # Construction-time grid validation (the reference rejects bad grid
    # configs in RKParametricSolver.__init__, rk_parametric.py:9-20); an
    # n_steps=0 solver would otherwise produce a 1-point grid and NaNs.
    if n_steps is not None and n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    if step_size is not None and not step_size > 0:
        raise ValueError(f"step_size must be > 0, got {step_size}")
    method = method.lower()
    if method not in _ORDERS:
        raise ValueError(f"unknown solver method {method!r}")
    if method == "euler":
        u = v = None
        u0 = v0 = None
        parameterization = None
    elif method == "rk2":
        if parameterization != "u":
            raise ValueError("Unknown parameterization for rk2 solver")
        u0 = 0.5 if u0 is None else u0
        u = jnp.asarray(u0, dtype)
        v = None
        v0 = None
    elif method == "rk3":
        if parameterization != "uv":
            raise ValueError("Unknown parameterization for rk3 solver")
        u0 = 1 / 3 if u0 is None else u0
        v0 = 2 / 3 if v0 is None else v0
        u = jnp.asarray(u0, dtype)
        v = jnp.asarray(v0, dtype)
    else:  # rk4
        if parameterization not in ("u1", "u2", "u3", "uv"):
            raise ValueError("Unknown parameterization for rk4 solver")
        u0 = 1 / 3 if u0 is None else u0
        u = jnp.asarray(u0, dtype)
        if parameterization == "uv":
            v0 = 2 / 3 if v0 is None else v0
            v = jnp.asarray(v0, dtype)
        else:
            v = None
            v0 = None
    return ParametricSolver(
        u=u, v=v, method=method, parameterization=parameterization,
        u0=u0, v0=v0, n_steps=n_steps, step_size=step_size, frozen=True,
    )


def parse_solver_dsl(spec: str) -> Sequence[ParametricSolver]:
    """Parse the reference ``--solvers`` DSL (odenet_mnist/runner.py:31-41).

    Format: ``method,parameterization,n_steps,step_size,u0,v0`` tuples joined
    by ``;`` — e.g. ``"rk2,u,8,-1,0.5,-1;rk2,u,8,-1,1.0,-1"``.  ``-1`` means
    "unset" for the numeric fields.
    """
    solvers = []
    for item in spec.strip().split(";"):
        if not item:
            continue
        method, param, n_steps, step_size, u0, v0 = [
            tok.strip() for tok in item.split(",")
        ]
        solvers.append(
            create_solver(
                method,
                param if param != "-1" else None,
                int(n_steps),
                float(step_size),
                float(u0),
                float(v0),
            )
        )
    return solvers
