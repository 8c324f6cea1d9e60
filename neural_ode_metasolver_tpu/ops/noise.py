"""Solver smoothing: PRNG-keyed coefficient noise.

Implements the reference's solver-smoothing machinery
(sopa/src/solvers/utils.py:60-117) on explicit JAX PRNG keys:

  * ``sample_noise`` — Cauchy or Normal perturbation; with
    ``minimize_rk2_error=True`` the distribution is recentered at u=2/3 with
    scale ``2/3 * sigma`` *ignoring the passed mean* — a reference quirk
    (utils.py:66-70) kept behind the same flag.
  * ``noise_params`` — Bernoulli(p)-gated sampling with the reference's
    rejection-to-mean rule: a sampled u outside ``mean ± 2*std`` falls back to
    the mean (utils.py:87-88).  NOTE: the reference applies the rejection rule
    only to ``u``, not ``v`` (utils.py:91-92) — matched here.
  * ``noise_solver`` / ``solver_ensemble_by_noising`` — the deepcopy-based
    ``sample_solver_by_noising_params`` / ``create_solver_ensemble_by_noising_params``
    (utils.py:100-117) become pure pytree updates; ensembles keep the
    original-solver-first ordering.

Everything is branchless (``jnp.where``) so it compiles into the train step;
the distributions match the reference but PRNG streams of course differ
(torch vs threefry) — documented in SURVEY.md §7 "hard parts".
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .solver import ParametricSolver

__all__ = [
    "sample_noise",
    "noise_params",
    "noise_solver",
    "solver_ensemble_by_noising",
]


def sample_noise(
    key: jax.Array,
    mu,
    sigma,
    noise_type: str = "cauchy",
    minimize_rk2_error: bool = False,
    shape=(),
    dtype=jnp.float32,
):
    """Draw from Cauchy(mu, sigma) or Normal(mu, sigma).

    ``minimize_rk2_error=True`` recenters at 2/3 with scale ``2/3 * sigma``
    (reference quirk, solvers/utils.py:66-70: the passed mean is ignored).
    """
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    if minimize_rk2_error:
        mu = jnp.asarray(2.0 / 3.0, dtype)
        sigma = (2.0 / 3.0) * sigma
    if noise_type == "cauchy":
        z = jax.random.cauchy(key, shape, dtype)
    elif noise_type == "normal":
        z = jax.random.normal(key, shape, dtype)
    else:
        raise ValueError(f"unknown noise_type {noise_type!r}")
    return mu + sigma * z


def noise_params(
    key: jax.Array,
    mean_u,
    mean_v=None,
    std: float = 0.01,
    bernoulli_p: float = 1.0,
    noise_type: str = "cauchy",
    minimize_rk2_error: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Noise solver parameters with probability ``bernoulli_p``.

    Functional form of solvers/utils.py:75-98: gate ~ Bernoulli(p); if open,
    u ~ noise(mean_u, std) with fallback to mean_u when the sample leaves
    ``mean_u ± 2 std`` (boundary *inclusive*, matching ``<=`` / ``>=``), and
    v ~ noise(mean_v, std) with no rejection; if closed, (mean_u, mean_v).
    """
    k_gate, k_u, k_v = jax.random.split(key, 3)
    mean_u = jnp.asarray(mean_u, jnp.float32)
    gate = jax.random.bernoulli(k_gate, bernoulli_p)
    std = jnp.abs(jnp.asarray(std, jnp.float32))

    u_s = sample_noise(
        k_u, mean_u, std, noise_type=noise_type,
        minimize_rk2_error=minimize_rk2_error,
    )
    reject = (u_s <= mean_u - 2.0 * std) | (u_s >= mean_u + 2.0 * std)
    u_s = jnp.where(reject, mean_u, u_s)
    u = jnp.where(gate, u_s, mean_u)

    v = None
    if mean_v is not None:
        mean_v = jnp.asarray(mean_v, jnp.float32)
        v_s = sample_noise(
            k_v, mean_v, std, noise_type=noise_type,
            minimize_rk2_error=minimize_rk2_error,
        )
        v = jnp.where(gate, v_s, mean_v)
    return u, v


def noise_solver(
    solver: ParametricSolver,
    key: jax.Array,
    std: float = 0.01,
    bernoulli_p: float = 1.0,
    noise_type: str = "cauchy",
    minimize_rk2_error: bool = False,
) -> ParametricSolver:
    """Pure analog of ``sample_solver_by_noising_params`` (utils.py:100-110):
    returns a solver whose u/v are noised around u0/v0."""
    if solver.u0 is None:  # euler — nothing to noise
        return solver
    u, v = noise_params(
        key,
        mean_u=solver.u0,
        mean_v=solver.v0,
        std=std,
        bernoulli_p=bernoulli_p,
        noise_type=noise_type,
        minimize_rk2_error=minimize_rk2_error,
    )
    return solver.with_params(u=u, v=v)


def solver_ensemble_by_noising(
    solver: ParametricSolver,
    key: jax.Array,
    ensemble_size: int = 1,
    **noise_kwargs,
):
    """List ``[original, noised_1, ..., noised_{n-1}]``
    (utils.py:112-117, original-first semantics preserved)."""
    members = [solver]
    keys = jax.random.split(key, max(ensemble_size - 1, 1))
    for i in range(1, ensemble_size):
        members.append(noise_solver(solver, keys[i - 1], **noise_kwargs))
    return members
