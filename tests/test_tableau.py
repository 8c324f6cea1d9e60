"""Unit tests for parametric Butcher tableaus.

Strategy per SURVEY.md §4: parametric tableau == classical tableau at the
known parameter points, and the RK order conditions hold for sampled (u, v).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.ops import (
    euler_tableau,
    heun_tableau,
    midpoint_tableau,
    rk2_tableau,
    rk38_tableau,
    rk4_standard_tableau,
    rk4_tableau,
    rk3_tableau,
    validity_eps,
)


def assert_tableau_close(ta, tb, atol=1e-6):
    np.testing.assert_allclose(ta.c, tb.c, atol=atol)
    np.testing.assert_allclose(ta.b, tb.b, atol=atol)
    np.testing.assert_allclose(ta.w, tb.w, atol=atol)


def order_condition_residuals(tab, order):
    """Residuals of the RK order conditions up to ``order``."""
    c = np.asarray(tab.c, np.float64)
    b = np.asarray(tab.b, np.float64)
    w = np.asarray(tab.w, np.float64)
    res = [b.sum() - 1.0]
    if order >= 2:
        res.append(b @ c - 0.5)
    if order >= 3:
        res.append(b @ c**2 - 1.0 / 3.0)
        res.append(b @ (w @ c) - 1.0 / 6.0)
    if order >= 4:
        res.append(b @ c**3 - 0.25)
        res.append((b * c) @ (w @ c) - 1.0 / 8.0)
        res.append(b @ (w @ c**2) - 1.0 / 12.0)
        res.append(b @ (w @ (w @ c)) - 1.0 / 24.0)
    return np.asarray(res)


def test_euler():
    tab = euler_tableau()
    np.testing.assert_allclose(order_condition_residuals(tab, 1), 0, atol=1e-7)
    assert tab.stages == 1


def test_rk2_named_points():
    assert_tableau_close(rk2_tableau(jnp.float32(0.5)), midpoint_tableau())
    assert_tableau_close(rk2_tableau(jnp.float32(1.0)), heun_tableau())


@pytest.mark.parametrize("u", [0.1, 1 / 3, 0.5, 2 / 3, 0.9, 1.0])
def test_rk2_order_conditions(u):
    tab = rk2_tableau(jnp.float64(u))
    np.testing.assert_allclose(
        order_condition_residuals(tab, 2), 0, atol=1e-12
    )
    # strictly lower triangular w
    assert np.allclose(np.triu(np.asarray(tab.w)), 0)


def test_rk2_clamp():
    eps = validity_eps(jnp.float32)
    tab = rk2_tableau(jnp.float32(-3.0))
    np.testing.assert_allclose(tab.c[1], eps, rtol=1e-6)
    tab = rk2_tableau(jnp.float32(7.0))
    np.testing.assert_allclose(tab.c[1], 1.0)


@pytest.mark.parametrize(
    "u,v",
    [(1 / 3, 2 / 3), (0.2, 0.9), (0.5, 0.25), (1.0, 0.5), (0.6, 0.3)],
)
def test_rk3_order_conditions(u, v):
    tab = rk3_tableau(jnp.float64(u), jnp.float64(v))
    np.testing.assert_allclose(
        order_condition_residuals(tab, 3), 0, atol=1e-10
    )


def test_rk3_known_methods():
    # Heun3: c = (0, 1/3, 2/3), b = (1/4, 0, 3/4)
    tab = rk3_tableau(jnp.float64(1 / 3), jnp.float64(2 / 3))
    np.testing.assert_allclose(tab.b, [0.25, 0.0, 0.75], atol=1e-12)
    # SSPRK3: u=1, v=1/2 -> b = (1/6, 1/6, 2/3)
    tab = rk3_tableau(jnp.float64(1.0), jnp.float64(0.5))
    np.testing.assert_allclose(tab.b, [1 / 6, 1 / 6, 2 / 3], atol=1e-12)


def test_rk3_degenerate_nudge():
    # u == v must be nudged apart, keeping the tableau finite.
    tab = rk3_tableau(jnp.float32(0.5), jnp.float32(0.5))
    assert np.isfinite(np.asarray(tab.b)).all()
    assert np.isfinite(np.asarray(tab.w)).all()


@pytest.mark.parametrize("param", ["u1", "u2", "u3"])
@pytest.mark.parametrize("u", [0.05, 1 / 6, 1 / 3, 0.7])
def test_rk4_single_param_order_conditions(param, u):
    tab = rk4_tableau(jnp.float64(u), parameterization=param)
    np.testing.assert_allclose(
        order_condition_residuals(tab, 4), 0, atol=1e-9
    )


@pytest.mark.parametrize("u,v", [(1 / 3, 2 / 3), (0.25, 0.6), (0.8, 0.3)])
def test_rk4_uv_order_conditions(u, v):
    tab = rk4_tableau(jnp.float64(u), jnp.float64(v), "uv")
    np.testing.assert_allclose(
        order_condition_residuals(tab, 4), 0, atol=1e-8
    )


def test_rk4_named_points():
    # u2 at u=1/3 is the classical RK4 (c=(0,.5,.5,1), b=(1/6,1/3,1/3,1/6)).
    assert_tableau_close(
        rk4_tableau(jnp.float64(1 / 3), parameterization="u2"),
        rk4_standard_tableau(jnp.float64),
        atol=1e-12,
    )
    # uv at (1/3, 2/3) is Kutta's 3/8 rule.
    assert_tableau_close(
        rk4_tableau(jnp.float64(1 / 3), jnp.float64(2 / 3), "uv"),
        rk38_tableau(jnp.float64),
        atol=1e-9,
    )


def test_rk4_uv_half_pole_clamp():
    # u = 1/2 is a pole of the 'uv' b formulas; it must be clamped away.
    tab = rk4_tableau(jnp.float32(0.5), jnp.float32(0.75), "uv")
    assert np.isfinite(np.asarray(tab.b)).all()


def test_tableau_batched_u():
    """Constructors are shape-polymorphic: batched u gives batched tableaus."""
    us = jnp.asarray([0.4, 0.5, 0.9], jnp.float32)
    tab = rk2_tableau(us)
    assert tab.c.shape == (3, 2)
    assert tab.w.shape == (3, 2, 2)
    single = rk2_tableau(us[1])
    np.testing.assert_allclose(tab.b[1], single.b)


def test_tableau_grad_flows_to_u():
    def loss(u):
        tab = rk2_tableau(u)
        return jnp.sum(tab.b**2) + jnp.sum(tab.w) + jnp.sum(tab.c)

    g = jax.grad(loss)(jnp.float64(0.6))
    # analytic: d/du [b1^2 + b2^2 + u + u] with b2 = 1/(2u), b1 = 1 - b2
    u = 0.6
    db2 = -1.0 / (2 * u**2)
    b2 = 1.0 / (2 * u)
    b1 = 1 - b2
    expected = 2 * b1 * (-db2) + 2 * b2 * db2 + 2.0
    np.testing.assert_allclose(g, expected, rtol=1e-10)


def test_pad_and_stack_tableaus():
    from neural_ode_metasolver_tpu.ops import pad_tableau, stack_tableaus

    rk2 = rk2_tableau(jnp.float32(0.5))
    rk4 = rk4_tableau(jnp.float32(1 / 3), parameterization="u2")
    padded = pad_tableau(rk2, 4)
    assert padded.stages == 4
    # padded stages contribute nothing: b zero, w rows zero
    np.testing.assert_allclose(padded.b[2:], 0.0)
    np.testing.assert_allclose(padded.w[2:], 0.0)
    np.testing.assert_allclose(padded.b[:2], rk2.b)
    with pytest.raises(ValueError):
        pad_tableau(rk4, 2)

    stacked = stack_tableaus([rk2, rk4])
    assert stacked.c.shape == (2, 4)
    np.testing.assert_allclose(stacked.b[1], rk4.b)

    # a padded tableau integrates identically (extra stages are inert)
    from neural_ode_metasolver_tpu.ops import odeint_final

    y0 = jnp.ones((3,), jnp.float32)
    rhs = lambda t, y: -0.7 * y
    y_a = odeint_final(rk2, rhs, y0, 0.0, 1.0, n_steps=4)
    y_b = odeint_final(padded, rhs, y0, 0.0, 1.0, n_steps=4)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b), atol=1e-6)
