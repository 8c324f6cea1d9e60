"""Parametric Butcher tableaus as differentiable JAX pytrees.

The reference (``sopa/src/solvers/rk_parametric*.py``) represents a Butcher
tableau as mutable attributes (``self.c2``, ``self.b1``, ...) on a solver
object, recomputed in-place from scalar ``nn.Parameter`` values ``u``/``v`` by
``build_ButcherTableau`` (rk_parametric.py:68).  Here a tableau is immutable
*data*: a small NamedTuple of arrays produced by pure, differentiable
constructor functions.  Gradients flow to ``u``/``v`` through ``jnp.clip`` /
``jnp.where`` exactly as they flow through ``torch.clamp`` in the reference;
freezing (reference ``freeze_params``, rk_parametric_order2stage2.py:96)
becomes ``jax.lax.stop_gradient`` at the call site.

Closed forms implemented (with reference citations):
  * RK2, 1 param u:    sopa/src/solvers/rk_parametric_order2stage2.py:37-62
  * RK3, 2 params u,v: sopa/src/solvers/rk_parametric_order3stage3.py:25-68
  * RK4, 'u1'/'u2'/'u3'/'uv': sopa/src/solvers/rk_parametric_order4stage4.py:40-156
  * Euler:             sopa/src/solvers/euler.py:23-32
  * Named classical tableaus (Midpoint / Heun / standard RK4 / 3-8 rule):
    rk_parametric_order2stage2.py:6-17, rk_parametric_order4stage4.py:6-17

All constructors are shape-polymorphic in ``u``/``v`` (scalars or batched
arrays), so solver-ensembles / smoothing vmap over the parameter axis for free.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ButcherTableau",
    "validity_eps",
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
]


class ButcherTableau(NamedTuple):
    """Explicit Runge-Kutta tableau.

    Attributes:
      c: stage times, shape ``(..., s)``.
      w: stage coupling matrix (strictly lower triangular), shape ``(..., s, s)``.
      b: output weights, shape ``(..., s)``.
    """

    c: jax.Array
    w: jax.Array
    b: jax.Array

    @property
    def stages(self) -> int:
        return self.b.shape[-1]


def validity_eps(dtype) -> float:
    """Dtype-dependent clamp epsilon.

    Mirrors the reference's rule (rk_parametric_order2stage2.py:56-62): float64
    params are clamped with float32 eps, float32 params with float16 eps.  This
    keeps tableau denominators (e.g. ``1/(2u)``) finite in the working
    precision one level below the parameter precision.
    """
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        return float(np.finfo(np.float32).eps)
    # float32 (and bf16, which the reference never used) -> float16 eps.
    return float(np.finfo(np.float16).eps)


def _zeros_like_u(u, shape):
    return jnp.zeros(u.shape + shape, dtype=u.dtype)


def euler_tableau(dtype=jnp.float32) -> ButcherTableau:
    """Forward Euler: c=[0], b=[1], w=[[0]] (euler.py:23-32)."""
    return ButcherTableau(
        c=jnp.zeros((1,), dtype),
        w=jnp.zeros((1, 1), dtype),
        b=jnp.ones((1,), dtype),
    )


def rk2_tableau(u: jax.Array) -> ButcherTableau:
    """Order-2 stage-2 family parametrized by ``u``.

    c = (0, u~), b2 = 1/(2 u~), b1 = 1 - b2, w21 = u~, where
    u~ = clip(u, eps, 1)  (rk_parametric_order2stage2.py:37-62).
    u = 1/2 -> Midpoint, u = 1 -> Heun, u = 2/3 minimizes local error.
    """
    u = jnp.asarray(u)
    eps = validity_eps(u.dtype)
    u_ = jnp.clip(u, eps, 1.0)
    zero = jnp.zeros_like(u_)
    b2 = 1.0 / (2.0 * u_)
    b1 = 1.0 - b2
    c = jnp.stack([zero, u_], axis=-1)
    b = jnp.stack([b1, b2], axis=-1)
    w = jnp.stack(
        [
            jnp.stack([zero, zero], axis=-1),
            jnp.stack([u_, zero], axis=-1),
        ],
        axis=-2,
    )
    return ButcherTableau(c=c, w=w, b=b)


def _nudge_degenerate(u_, v_, eps):
    """If u~ == v~, nudge one of them by eps (rk3: :64-68, rk4 uv: :152-156)."""
    eq = u_ == v_
    lo = u_ < 1.0 - eps
    v_new = jnp.where(eq & lo, u_ + eps, v_)
    u_new = jnp.where(eq & ~lo, v_ - eps, u_)
    return u_new, v_new


def rk3_tableau(u: jax.Array, v: jax.Array) -> ButcherTableau:
    """Order-3 stage-3 two-parameter family ('uv').

    c = (0, u~, v~);  b2 = (2-3v~)/(6 u~ (u~-v~)), b3 = (2-3u~)/(6 v~ (v~-u~)),
    b1 = 1-b2-b3;  w21 = u~, w32 = v~(v~-u~)/(u~(2-3u~)), w31 = v~-w32
    (rk_parametric_order3stage3.py:25-44), with clip-to-[eps,1] validity and
    the u==v nudge (:47-68).
    """
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    eps = validity_eps(u.dtype)
    u_ = jnp.clip(u, eps, 1.0)
    v_ = jnp.clip(v, eps, 1.0)
    u_, v_ = _nudge_degenerate(u_, v_, eps)
    zero = jnp.zeros_like(u_)

    v_sub_u = v_ - u_
    b2 = (2.0 - 3.0 * v_) / (6.0 * u_ * (-v_sub_u))
    b3 = (2.0 - 3.0 * u_) / (6.0 * v_ * v_sub_u)
    b1 = 1.0 - b2 - b3

    w21 = u_
    w32 = v_ * (v_ - u_) / (u_ * (2.0 - 3.0 * u_))
    w31 = v_ - w32

    c = jnp.stack([zero, u_, v_], axis=-1)
    b = jnp.stack([b1, b2, b3], axis=-1)
    w = jnp.stack(
        [
            jnp.stack([zero, zero, zero], axis=-1),
            jnp.stack([w21, zero, zero], axis=-1),
            jnp.stack([w31, w32, zero], axis=-1),
        ],
        axis=-2,
    )
    return ButcherTableau(c=c, w=w, b=b)


def rk4_tableau(
    u: jax.Array,
    v: Optional[jax.Array] = None,
    parameterization: str = "u2",
) -> ButcherTableau:
    """Order-4 stage-4 families per Hairer-Wanner.

    Four parameterizations (rk_parametric_order4stage4.py:40-124):
      'u1': c=(0, 1/2, 0, 1),  b=(1/6-u, 2/3, u, 1/6)
      'u2': c=(0, 1/2, 1/2, 1), b=(1/6, 2/3-u, u, 1/6)
      'u3': c=(0, 1, 1/2, 1),  b=(1/6, 1/6-u, 2/3, u)
      'uv': c=(0, u, v, 1), closed-form b's (:83-91)
    w43 = b3 (1-c3)/b4; (w32, w42) solved by Cramer's rule from the two
    remaining order conditions (:94-124); w41/w31/w21 from row sums = c.

    Validity (:127-156): non-'uv' clamps u to [eps, 1-eps]; 'uv' clamps u into
    whichever half-interval of (0, 1/2) / (1/2, 1) it falls (u=1/2 is a pole of
    the b formulas), clamps v to [eps, 1-eps], and nudges u==v.
    """
    u = jnp.asarray(u)
    eps = validity_eps(u.dtype)
    zero = jnp.zeros_like(u)
    one = jnp.ones_like(u)
    half = 0.5 * one

    if parameterization == "uv":
        if v is None:
            raise ValueError("rk4 'uv' parameterization requires v")
        v = jnp.asarray(v)
        u_ = jnp.where(
            u < 0.5,
            jnp.clip(u, eps, 0.5 - eps),
            jnp.clip(u, 0.5 + eps, 1.0 - eps),
        )
        v_ = jnp.clip(v, eps, 1.0 - eps)
        u_, v_ = _nudge_degenerate(u_, v_, eps)
        c2, c3 = u_, v_
        sub_u = 1.0 - u_
        sub_v = 1.0 - v_
        v_sub_u = v_ - u_
        b2 = (2.0 * v_ - 1.0) / (12.0 * u_ * sub_u * v_sub_u)
        b3 = (1.0 - 2.0 * u_) / (12.0 * v_ * sub_v * v_sub_u)
        b4 = (6.0 * u_ * v_ + 3.0 - 4.0 * u_ - 4.0 * v_) / (12.0 * sub_u * sub_v)
        b1 = 1.0 - b2 - b3 - b4
    else:
        u_ = jnp.clip(u, eps, 1.0 - eps)
        if parameterization == "u1":
            c2, c3 = half, zero
            b1, b2, b3, b4 = 1.0 / 6.0 - u_, 2.0 / 3.0 * one, u_, one / 6.0
        elif parameterization == "u2":
            c2, c3 = half, half
            b1, b2, b3, b4 = one / 6.0, 2.0 / 3.0 - u_, u_, one / 6.0
        elif parameterization == "u3":
            c2, c3 = one, half
            b1, b2, b3, b4 = one / 6.0, 1.0 / 6.0 - u_, 2.0 / 3.0 * one, u_
        else:
            raise ValueError(
                f"Unknown parameterization {parameterization!r} for rk4"
            )
    c4 = one

    # Stage couplings (rk_parametric_order4stage4.py:94-124).
    w43 = b3 * (1.0 - c3) / b4
    A00 = b3 * c3 * c2
    A01 = b4 * c4 * c2
    A10 = b3
    A11 = b4
    B0 = 0.125 - b4 * c4 * c3 * w43
    B1 = b2 * (1.0 - c2)
    detA = A00 * A11 - A01 * A10
    w32 = (B0 * A11 - B1 * A01) / detA
    w42 = (A00 * B1 - A10 * B0) / detA
    w41 = c4 - (w42 + w43)
    w31 = c3 - w32
    w21 = c2

    c = jnp.stack([zero, c2, c3, c4], axis=-1)
    b = jnp.stack([b1, b2, b3, b4], axis=-1)
    w = jnp.stack(
        [
            jnp.stack([zero, zero, zero, zero], axis=-1),
            jnp.stack([w21, zero, zero, zero], axis=-1),
            jnp.stack([w31, w32, zero, zero], axis=-1),
            jnp.stack([w41, w42, w43, zero], axis=-1),
        ],
        axis=-2,
    )
    return ButcherTableau(c=c, w=w, b=b)


def _const_tableau(c, w_rows, b, dtype):
    s = len(b)
    w = np.zeros((s, s), dtype=np.float64)
    for i, row in enumerate(w_rows):
        w[i, : len(row)] = row
    return ButcherTableau(
        c=jnp.asarray(np.asarray(c), dtype),
        w=jnp.asarray(w, dtype),
        b=jnp.asarray(np.asarray(b), dtype),
    )


def midpoint_tableau(dtype=jnp.float32) -> ButcherTableau:
    """Midpoint method == rk2_tableau(1/2) (rk_parametric_order2stage2.py:6)."""
    return _const_tableau([0.0, 0.5], [[], [0.5]], [0.0, 1.0], dtype)


def heun_tableau(dtype=jnp.float32) -> ButcherTableau:
    """Heun's method == rk2_tableau(1) (rk_parametric_order2stage2.py:13)."""
    return _const_tableau([0.0, 1.0], [[], [1.0]], [0.5, 0.5], dtype)


def rk4_standard_tableau(dtype=jnp.float32) -> ButcherTableau:
    """Classical RK4 == rk4_tableau(1/3, 'u2') (rk_parametric_order4stage4.py:6)."""
    return _const_tableau(
        [0.0, 0.5, 0.5, 1.0],
        [[], [0.5], [0.0, 0.5], [0.0, 0.0, 1.0]],
        [1 / 6, 1 / 3, 1 / 3, 1 / 6],
        dtype,
    )


def rk38_tableau(dtype=jnp.float32) -> ButcherTableau:
    """Kutta's 3/8 rule (rk_parametric_order4stage4.py:13)."""
    return _const_tableau(
        [0.0, 1 / 3, 2 / 3, 1.0],
        [[], [1 / 3], [-1 / 3, 1.0], [1.0, -1.0, 1.0]],
        [1 / 8, 3 / 8, 3 / 8, 1 / 8],
        dtype,
    )


def pad_tableau(tab: ButcherTableau, stages: int) -> ButcherTableau:
    """Zero-pad a tableau to ``stages`` stages.

    Padded stages have b_i = 0 and w rows = 0, so they contribute nothing to
    the step (the extra RHS evaluations are at y and are discarded).  Used to
    stack heterogeneous solver families for gather-based switching.
    """
    s = tab.stages
    if s == stages:
        return tab
    if s > stages:
        raise ValueError(f"cannot pad {s}-stage tableau to {stages}")
    p = stages - s
    pad_vec = [(0, 0)] * (tab.c.ndim - 1) + [(0, p)]
    pad_mat = [(0, 0)] * (tab.w.ndim - 2) + [(0, p), (0, p)]
    return ButcherTableau(
        c=jnp.pad(tab.c, pad_vec),
        w=jnp.pad(tab.w, pad_mat),
        b=jnp.pad(tab.b, pad_vec),
    )


def stack_tableaus(tabs) -> ButcherTableau:
    """Stack tableaus (padding to the max stage count) along a leading axis."""
    smax = max(t.stages for t in tabs)
    tabs = [pad_tableau(t, smax) for t in tabs]
    return ButcherTableau(
        c=jnp.stack([t.c for t in tabs]),
        w=jnp.stack([t.w for t in tabs]),
        b=jnp.stack([t.b for t in tabs]),
    )
