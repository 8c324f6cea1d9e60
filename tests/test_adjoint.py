"""Continuous-adjoint integrator tests: forward equals the direct scan, and
adjoint gradients converge to discretize-then-optimize gradients as the grid
refines (they differ by the discretization error by construction)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.ops import make_time_grid, odeint_final, rk2_tableau, rk4_tableau
from neural_ode_metasolver_tpu.ops.adjoint import odeint_final_adjoint


def rhs(params, t, y):
    # a small nonlinear parametric RHS: dy/dt = tanh(W y) + b sin(t)
    return jnp.tanh(y @ params["W"]) + params["b"] * jnp.sin(t)


def make_params(key, d=4):
    kw, kb = jax.random.split(key)
    return {
        "W": 0.5 * jax.random.normal(kw, (d, d), jnp.float64),
        "b": jax.random.normal(kb, (d,), jnp.float64),
    }


def test_adjoint_forward_matches_direct():
    params = make_params(jax.random.key(0))
    y0 = jax.random.normal(jax.random.key(1), (3, 4), jnp.float64)
    tab = rk4_tableau(jnp.float64(1 / 3), parameterization="u2")
    grid = make_time_grid(0.0, 1.0, n_steps=16, dtype=jnp.float64)
    y_adj = odeint_final_adjoint(tab, rhs, params, y0, grid)
    y_dir = odeint_final(tab, lambda t, y: rhs(params, t, y), y0, 0.0, 1.0,
                         n_steps=16)
    np.testing.assert_allclose(np.asarray(y_adj), np.asarray(y_dir),
                               atol=1e-12)


@pytest.mark.parametrize("tab,order", [
    (rk2_tableau(jnp.float64(2 / 3)), 2),
    (rk4_tableau(jnp.float64(1 / 3), parameterization="u2"), 4),
])
def test_adjoint_grads_converge_to_dto(tab, order):
    params = make_params(jax.random.key(0))
    y0 = jax.random.normal(jax.random.key(1), (2, 4), jnp.float64)

    def loss_adj(params, y0, n):
        grid = make_time_grid(0.0, 1.0, n_steps=n, dtype=jnp.float64)
        y = odeint_final_adjoint(tab, rhs, params, y0, grid)
        return jnp.sum(y**2)

    def loss_dto(params, y0, n):
        y = odeint_final(tab, lambda t, y: rhs(params, t, y), y0, 0.0, 1.0,
                         n_steps=n)
        return jnp.sum(y**2)

    errs = []
    for n in (8, 32):
        ga = jax.grad(loss_adj, argnums=(0, 1))(params, y0, n)
        gd = jax.grad(loss_dto, argnums=(0, 1))(params, y0, n)
        flat_a = jnp.concatenate([v.ravel() for v in
                                  jax.tree_util.tree_leaves(ga)])
        flat_d = jnp.concatenate([v.ravel() for v in
                                  jax.tree_util.tree_leaves(gd)])
        errs.append(float(jnp.max(jnp.abs(flat_a - flat_d))))
    # error should shrink with refinement, roughly at the method order
    assert errs[1] < errs[0] * 0.3, errs
    assert errs[1] < 5e-3, errs  # RK2@32 steps has O(h^2) ~ 1e-3 discrepancy


def test_checkpointed_adjoint_beats_uncheckpointed():
    """Re-seeding y at the stored forward grid states must shrink the
    adjoint-vs-d-t-o gradient error by >= an order of magnitude at FIXED
    n_steps: the uncheckpointed variant reconstructs y backward across the
    whole span from y1 alone, so its reconstruction error compounds over
    all steps and biases aᵀ∂f/∂y — the dominant error term the
    checkpointed path removes (VERDICT round-2 item 3)."""
    # A strongly contracting linear system isolates the effect: forward
    # integration is stable, so BACKWARD y-reconstruction is unstable
    # (errors amplified ~|1+z+z^2/2|^k per RK2 step, z=lam*h) — and with a
    # linear f, df/dy is y-independent, so ALL of the extra uncheckpointed
    # error flows through the parameter gradient g = ∫ aᵀ (∂f/∂W) dt
    # whose integrand is the reconstructed y itself.
    lam, d, n = 12.0, 4, 8  # n = the reference's published step count
    params = {
        "W": -lam * jnp.eye(d)
        + 0.3 * jax.random.normal(jax.random.key(1), (d, d), jnp.float64)
    }
    y0 = jax.random.normal(jax.random.key(5), (2, d), jnp.float64)
    tab = rk2_tableau(jnp.float64(2 / 3))
    grid = make_time_grid(0.0, 1.0, n_steps=n, dtype=jnp.float64)

    def lin_rhs(p, t, y):
        return y @ p["W"]

    def loss_adj(p, y, ckpt):
        return jnp.sum(
            odeint_final_adjoint(
                tab, lin_rhs, p, y, grid, checkpoint_states=ckpt
            ) ** 2
        )

    def loss_dto(p, y):
        return jnp.sum(
            odeint_final(
                tab, lambda t, y_: lin_rhs(p, t, y_), y, 0.0, 1.0,
                n_steps=n,
            ) ** 2
        )

    gd = jax.grad(loss_dto, argnums=(0, 1))(params, y0)
    fd = jnp.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(gd)])

    def err(ckpt):
        ga = jax.grad(
            lambda p, y: loss_adj(p, y, ckpt), argnums=(0, 1)
        )(params, y0)
        fa = jnp.concatenate(
            [v.ravel() for v in jax.tree_util.tree_leaves(ga)]
        )
        return float(jnp.max(jnp.abs(fa - fd)))

    e_ckpt, e_flat = err(True), err(False)
    # measured: 5.0e-3 vs 8.0e-2 (16x) at these seeds
    assert e_ckpt * 8 < e_flat, (e_ckpt, e_flat)


def test_adjoint_grad_matches_finite_difference():
    params = make_params(jax.random.key(2))
    y0 = jax.random.normal(jax.random.key(3), (1, 4), jnp.float64)
    tab = rk4_tableau(jnp.float64(1 / 3), parameterization="u2")
    grid = make_time_grid(0.0, 1.0, n_steps=64, dtype=jnp.float64)

    def loss(b):
        p = {**params, "b": b}
        return jnp.sum(odeint_final_adjoint(tab, rhs, p, y0, grid) ** 2)

    g = jax.grad(loss)(params["b"])
    h = 1e-6
    for i in range(2):
        e = jnp.zeros_like(params["b"]).at[i].set(h)
        fd = (loss(params["b"] + e) - loss(params["b"] - e)) / (2 * h)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4)


def test_adjoint_under_jit_and_memory_shape():
    params = make_params(jax.random.key(0))
    y0 = jnp.ones((2, 4), jnp.float64)
    tab = rk2_tableau(jnp.float64(0.5))
    grid = make_time_grid(0.0, 1.0, n_steps=128, dtype=jnp.float64)

    @jax.jit
    def g(params, y0):
        return jax.grad(
            lambda p, y: jnp.sum(
                odeint_final_adjoint(tab, rhs, p, y, grid) ** 2
            )
        )(params, y0)

    out = g(params, y0)
    assert np.isfinite(
        np.concatenate([np.ravel(v) for v in
                        jax.tree_util.tree_leaves(out)])
    ).all()
