"""Integrator tests: closed-form ODE accuracy, order of convergence,
grid-construction parity, interpolation, and gradients (incl. d/du)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.ops import (
    ParametricSolver,
    create_solver,
    euler_tableau,
    make_time_grid,
    odeint,
    odeint_final,
    odeint_grid,
    rk2_tableau,
    rk3_tableau,
    rk4_tableau,
)

LAM = -0.7


def linear_rhs(t, y):
    return LAM * y


def exact(t, y0=1.0):
    return y0 * np.exp(LAM * t)


@pytest.mark.parametrize(
    "tab,order",
    [
        (euler_tableau(jnp.float64), 1),
        (rk2_tableau(jnp.float64(2 / 3)), 2),
        (rk3_tableau(jnp.float64(1 / 3), jnp.float64(2 / 3)), 3),
        (rk4_tableau(jnp.float64(1 / 3), parameterization="u2"), 4),
    ],
)
def test_order_of_convergence(tab, order):
    y0 = jnp.asarray([1.0], jnp.float64)
    errs = []
    for n in (8, 16, 32):
        y = odeint_final(tab, linear_rhs, y0, 0.0, 1.0, n_steps=n)
        errs.append(abs(float(y[0]) - exact(1.0)))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    for r in rates:
        assert r > order - 0.25, (rates, errs)


def test_nonautonomous_accuracy():
    """dy/dt = y * cos(t), exact y = exp(sin t) — exercises the c_i stage times."""
    rhs = lambda t, y: y * jnp.cos(t)
    tab = rk4_tableau(jnp.float64(1 / 3), parameterization="u2")
    y = odeint_final(tab, rhs, jnp.asarray([1.0], jnp.float64), 0.0, 2.0,
                     n_steps=64)
    np.testing.assert_allclose(float(y[0]), np.exp(np.sin(2.0)), rtol=1e-7)


def test_make_time_grid_n_steps():
    g = make_time_grid(0.0, 1.0, n_steps=8)
    np.testing.assert_allclose(g, np.linspace(0, 1, 9), atol=1e-7)


def test_make_time_grid_step_size_clamps_last():
    # (t1-t0)/h = 3.33 -> ceil(4.33) = 5 points at 0,.3,.6,.9,1.2 -> last
    # clamped to 1.0 (rk_parametric.py:23-35 semantics).
    g = np.asarray(make_time_grid(0.0, 1.0, step_size=0.3))
    np.testing.assert_allclose(g, [0.0, 0.3, 0.6, 0.9, 1.0], atol=1e-6)


def test_make_time_grid_exclusive_args():
    with pytest.raises(ValueError):
        make_time_grid(0.0, 1.0, n_steps=4, step_size=0.1)
    with pytest.raises(ValueError):
        make_time_grid(0.0, 1.0)


def test_odeint_trajectory_and_interp():
    tab = rk4_tableau(jnp.float64(1 / 3), parameterization="u2")
    y0 = jnp.asarray([2.0], jnp.float64)
    t = jnp.asarray([0.0, 0.35, 0.5, 1.0], jnp.float64)
    ys = odeint(tab, linear_rhs, y0, t, n_steps=16)
    assert ys.shape == (4, 1)
    np.testing.assert_allclose(ys[0], y0, atol=0)
    # endpoints exact vs integration; interior point linear-interp accurate
    np.testing.assert_allclose(float(ys[3, 0]), exact(1.0, 2.0), rtol=1e-6)
    np.testing.assert_allclose(float(ys[1, 0]), exact(0.35, 2.0), rtol=1e-3)
    np.testing.assert_allclose(float(ys[2, 0]), exact(0.5, 2.0), rtol=1e-6)


def test_odeint_grid_matches_final():
    tab = rk2_tableau(jnp.float64(0.5))
    y0 = jnp.ones((3, 4), jnp.float64)
    grid = make_time_grid(0.0, 1.0, n_steps=8, dtype=jnp.float64)
    traj = odeint_grid(tab, linear_rhs, y0, grid)
    yf = odeint_final(tab, linear_rhs, y0, 0.0, 1.0, n_steps=8)
    assert traj.shape == (9, 3, 4)
    np.testing.assert_allclose(traj[-1], yf, atol=1e-12)


def test_grad_wrt_u_matches_finite_difference():
    # NOTE: for a *linear autonomous* RHS the RK2 one-step map is
    # u-independent (b1 + b2 cancellation), so a nonlinear RHS is required
    # for a nonzero du-gradient.
    y0 = jnp.asarray([1.0], jnp.float64)
    nonlinear_rhs = lambda t, y: -0.5 * y * y + 0.1 * jnp.sin(3.0 * t)

    def loss(u):
        tab = rk2_tableau(u)
        y = odeint_final(tab, nonlinear_rhs, y0, 0.0, 1.0, n_steps=4)
        return jnp.sum(y)

    u = jnp.float64(0.61)
    g = jax.grad(loss)(u)
    h = 1e-6
    fd = (loss(u + h) - loss(u - h)) / (2 * h)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_grad_wrt_y0_matches_exact():
    tab = rk4_tableau(jnp.float64(1 / 3), parameterization="u2")

    def loss(y0):
        return jnp.sum(odeint_final(tab, linear_rhs, y0, 0.0, 1.0, n_steps=32))

    g = jax.grad(loss)(jnp.asarray([1.5], jnp.float64))
    np.testing.assert_allclose(float(g[0]), np.exp(LAM), rtol=1e-6)


def test_remat_matches_plain():
    tab = rk2_tableau(jnp.float64(2 / 3))
    y0 = jnp.ones((2, 3), jnp.float64)

    def loss(y0, remat):
        return jnp.sum(
            odeint_final(tab, linear_rhs, y0, 0.0, 1.0, n_steps=8, remat=remat)
        )

    g_plain = jax.grad(lambda y: loss(y, False))(y0)
    g_remat = jax.grad(lambda y: loss(y, True))(y0)
    np.testing.assert_allclose(g_plain, g_remat, atol=1e-12)


def test_solver_object_integrate():
    s = create_solver("rk2", "u", n_steps=8, u0=0.5)
    y0 = jnp.ones((2,), jnp.float32)
    t = jnp.asarray([0.0, 1.0], jnp.float32)
    traj = s.integrate(linear_rhs, y0, t)
    assert traj.shape == (2, 2)
    yf = s.integrate_final(linear_rhs, y0)
    np.testing.assert_allclose(traj[-1], yf, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(yf), exact(1.0) * np.ones(2), rtol=1e-3
    )


def test_create_solver_sentinels_and_errors():
    s = create_solver("rk2", "u", n_steps=-1, step_size=0.25, u0=0.5, v0=-1)
    assert s.n_steps is None and s.step_size == 0.25 and s.v is None
    with pytest.raises(ValueError):
        create_solver("rk2", "uv", n_steps=4, u0=0.5)
    with pytest.raises(ValueError):
        create_solver("nope", "u", n_steps=4, u0=0.5)
    e = create_solver("euler", "u", n_steps=4, u0=0.5)  # euler ignores params
    assert e.u is None and e.parameterization is None


def test_frozen_solver_blocks_u_grad():
    y0 = jnp.asarray([1.0], jnp.float32)
    s = create_solver("rk2", "u", n_steps=4, u0=0.6)

    def loss(solver):
        return jnp.sum(solver.integrate_final(linear_rhs, y0))

    g_frozen = jax.grad(loss)(s)
    assert float(jnp.abs(g_frozen.u)) == 0.0
    g_free = jax.grad(loss)(s.unfreeze())
    assert float(jnp.abs(g_free.u)) > 0.0


def test_solver_is_jit_compatible_pytree():
    s = create_solver("rk3", "uv", n_steps=4, u0=1 / 3, v0=2 / 3)

    @jax.jit
    def run(solver, y0):
        return solver.integrate_final(linear_rhs, y0)

    y = run(s, jnp.ones((2,), jnp.float32))
    np.testing.assert_allclose(np.asarray(y), exact(1.0), rtol=1e-3)


def test_dsl_parse():
    from neural_ode_metasolver_tpu.ops import parse_solver_dsl

    solvers = parse_solver_dsl("rk2,u,8,-1,0.5,-1;rk4,u2,4,-1,0.33,-1")
    assert len(solvers) == 2
    assert solvers[0].method == "rk2" and solvers[0].n_steps == 8
    assert float(solvers[0].u) == 0.5
    assert solvers[1].method == "rk4" and solvers[1].parameterization == "u2"


def test_solver_custom_grid():
    """Reference grid_constructor parity: a non-uniform explicit grid."""
    s = create_solver("rk2", "u", u0=0.5).replace(
        custom_grid=(0.0, 0.1, 0.5, 1.0)
    )
    y0 = jnp.ones((2,), jnp.float64)
    yf = s.integrate_final(linear_rhs, y0)
    # manual non-uniform stepping with the same tableau
    from neural_ode_metasolver_tpu.ops import rk2_tableau, odeint_final

    expected = odeint_final(
        rk2_tableau(jnp.float32(0.5)), linear_rhs, y0,
        time_grid=jnp.asarray([0.0, 0.1, 0.5, 1.0], jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(yf), np.asarray(expected), atol=0)
    traj = s.integrate(linear_rhs, y0, jnp.asarray([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(yf),
                               atol=1e-7)


def test_odeint_with_traced_output_times_under_jit():
    """n_steps grids must work when the requested times are traced
    arguments (the float(t[0]) conversion used to raise under jit)."""
    import jax

    from neural_ode_metasolver_tpu.ops import create_solver

    solver = create_solver("rk2", "u", n_steps=4, u0=0.5)
    rhs = lambda t, y: -y

    @jax.jit
    def traj(t):
        return solver.integrate(rhs, jnp.ones((3,)), t)

    t = jnp.array([0.0, 0.5, 1.0])
    out = traj(t)
    ref = solver.integrate(rhs, jnp.ones((3,)), [0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_odeint_rejects_times_outside_explicit_grid():
    from neural_ode_metasolver_tpu.ops import odeint, rk2_tableau

    tab = rk2_tableau(jnp.float32(0.5))
    rhs = lambda t, y: -y
    with pytest.raises(ValueError, match="extrapolate"):
        odeint(tab, rhs, jnp.ones((2,)), [0.0, 1.0],
               time_grid=jnp.array([0.0, 0.25, 0.5]))
