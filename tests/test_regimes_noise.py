"""Regime dispatch + smoothing-noise tests (statistical, fixed PRNG keys)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.ops import (
    SolverOptions,
    create_solver,
    meta_integrate,
    noise_params,
    noise_solver,
    sample_noise,
    solver_ensemble_by_noising,
)

LAM = -0.7
rhs = lambda t, y: LAM * y


def make_solvers():
    return [
        create_solver("rk2", "u", n_steps=8, u0=0.5),
        create_solver("rk2", "u", n_steps=8, u0=1.0),
    ]


def test_standalone_uses_first():
    solvers = make_solvers()
    y0 = jnp.ones((3,), jnp.float32)
    y, aux = meta_integrate(
        solvers, rhs, y0, SolverOptions(solver_mode="standalone")
    )
    y_ref = solvers[0].integrate_final(rhs, y0)
    np.testing.assert_allclose(y, y_ref, atol=0)
    assert aux == {}


def test_switch_statistics_and_aux():
    solvers = make_solvers()
    y0 = jnp.ones((1,), jnp.float32)
    opts = SolverOptions(solver_mode="switch", switch_probs=[0.8, 0.2])
    ids = []
    for i in range(200):
        _, aux = meta_integrate(
            solvers, rhs, y0, opts, key=jax.random.key(i)
        )
        ids.append(int(aux["switch_solver_id"]))
    frac1 = np.mean(np.asarray(ids) == 1)
    assert 0.1 < frac1 < 0.32  # ~Binomial(200, .2)


def test_switch_selects_correct_solver():
    # Make the two solvers visibly different (1 vs 64 steps of Euler-ish rk2).
    s_coarse = create_solver("rk2", "u", n_steps=1, u0=0.5)
    s_fine = create_solver("rk2", "u", n_steps=64, u0=0.5)
    y0 = jnp.ones((1,), jnp.float32)
    opts = SolverOptions(solver_mode="switch", switch_probs=[1.0, 0.0])
    y, aux = meta_integrate(
        [s_coarse, s_fine], rhs, y0, opts, key=jax.random.key(0)
    )
    assert int(aux["switch_solver_id"]) == 0
    np.testing.assert_allclose(y, s_coarse.integrate_final(rhs, y0), atol=0)
    # replay via aux_in: force solver 1 regardless of key
    y1, _ = meta_integrate(
        [s_coarse, s_fine], rhs, y0, opts, key=jax.random.key(0),
        aux_in={"switch_solver_id": jnp.int32(1)},
    )
    np.testing.assert_allclose(y1, s_fine.integrate_final(rhs, y0), atol=0)


def test_ensemble_weighted_sum_and_coin():
    solvers = make_solvers()
    y0 = jnp.ones((2,), jnp.float32)
    opts = SolverOptions(
        solver_mode="ensemble", ensemble_prob=1.0, ensemble_weights=[0.6, 0.4]
    )
    y, aux = meta_integrate(solvers, rhs, y0, opts, key=jax.random.key(3))
    assert bool(aux["ensemble_coin_flip"])
    expected = 0.6 * solvers[0].integrate_final(rhs, y0) + 0.4 * solvers[
        1
    ].integrate_final(rhs, y0)
    np.testing.assert_allclose(y, expected, rtol=1e-6)
    # prob=0 -> tails -> first solver alone
    y_t, aux_t = meta_integrate(
        solvers, rhs, y0,
        SolverOptions(solver_mode="ensemble", ensemble_prob=0.0),
        key=jax.random.key(3),
    )
    assert not bool(aux_t["ensemble_coin_flip"])
    np.testing.assert_allclose(
        y_t, solvers[0].integrate_final(rhs, y0), atol=0
    )


def test_ensemble_default_uniform_weights():
    solvers = make_solvers()
    y0 = jnp.ones((2,), jnp.float32)
    y, _ = meta_integrate(
        solvers, rhs, y0,
        SolverOptions(solver_mode="ensemble", ensemble_prob=1.0),
        key=jax.random.key(0),
    )
    expected = 0.5 * (
        solvers[0].integrate_final(rhs, y0)
        + solvers[1].integrate_final(rhs, y0)
    )
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_regimes_jit():
    solvers = make_solvers()
    opts = SolverOptions(solver_mode="switch")

    @jax.jit
    def run(solvers, y0, key):
        y, aux = meta_integrate(solvers, rhs, y0, opts, key=key)
        return y, aux["switch_solver_id"]

    y, sid = run(solvers, jnp.ones((2,), jnp.float32), jax.random.key(1))
    assert y.shape == (2,)
    assert int(sid) in (0, 1)


# ---------------------------------------------------------------- noise ----


def test_sample_noise_normal_moments():
    keys = jax.random.split(jax.random.key(0), 4000)
    xs = jax.vmap(
        lambda k: sample_noise(k, 0.5, 0.1, noise_type="normal")
    )(keys)
    assert abs(float(xs.mean()) - 0.5) < 0.01
    assert abs(float(xs.std()) - 0.1) < 0.01


def test_sample_noise_minimize_rk2_error_recenters():
    """Reference quirk (solvers/utils.py:66-70): mean ignored, centered 2/3."""
    keys = jax.random.split(jax.random.key(1), 4000)
    xs = jax.vmap(
        lambda k: sample_noise(
            k, 0.1, 0.1, noise_type="normal", minimize_rk2_error=True
        )
    )(keys)
    assert abs(float(xs.mean()) - 2 / 3) < 0.01
    assert abs(float(xs.std()) - 0.1 * 2 / 3) < 0.01


def test_noise_params_rejection_to_mean():
    """Samples outside mean±2σ collapse to the mean -> u always in band."""
    keys = jax.random.split(jax.random.key(2), 2000)
    us = jax.vmap(
        lambda k: noise_params(k, 0.5, std=0.05, noise_type="cauchy")[0]
    )(keys)
    us = np.asarray(us)
    assert (us >= 0.5 - 0.1).all() and (us <= 0.5 + 0.1).all()
    # Cauchy has heavy tails: a noticeable fraction must have been rejected
    assert (us == 0.5).mean() > 0.05


def test_noise_params_bernoulli_gate():
    keys = jax.random.split(jax.random.key(3), 1000)
    us = jax.vmap(
        lambda k: noise_params(
            k, 0.5, std=0.05, bernoulli_p=0.3, noise_type="normal"
        )[0]
    )(keys)
    frac_noised = float((np.asarray(us) != 0.5).mean())
    assert 0.2 < frac_noised < 0.4


def test_noise_solver_and_ensemble():
    s = create_solver("rk2", "u", n_steps=8, u0=0.5)
    # any single draw can hit the ±2σ rejection band (~4.6%); check across keys
    us = [
        float(noise_solver(s, jax.random.key(i), std=0.05,
                           noise_type="normal").u)
        for i in range(10)
    ]
    assert sum(u != 0.5 for u in us) >= 5
    s2 = noise_solver(s, jax.random.key(0), std=0.05, noise_type="normal")
    assert s2.u0 == 0.5  # mean retained for denoising
    np.testing.assert_allclose(float(s2.reset_params().u), 0.5)

    ens = solver_ensemble_by_noising(
        s, jax.random.key(1), ensemble_size=3, std=0.05, noise_type="normal"
    )
    assert len(ens) == 3
    assert float(ens[0].u) == 0.5  # original first (utils.py:113)
    assert float(ens[1].u) != float(ens[2].u)


def test_noise_rk3_both_params():
    s = create_solver("rk3", "uv", n_steps=4, u0=1 / 3, v0=2 / 3)
    s2 = noise_solver(s, jax.random.key(5), std=0.01, noise_type="normal")
    assert float(s2.u) != pytest.approx(1 / 3)
    assert float(s2.v) != pytest.approx(2 / 3)


def test_noise_euler_noop():
    s = create_solver("euler", None, n_steps=4)
    assert noise_solver(s, jax.random.key(0)) is s


def test_single_solver_ensemble_applies_weight_and_aux():
    """A 1-member ensemble still flips the coin and applies its weight
    (reference layers.py:32-48); switch with one solver records aux."""
    from neural_ode_metasolver_tpu.ops import (
        SolverOptions,
        create_solver,
        meta_integrate,
    )

    s = create_solver("rk2", "u", n_steps=2, u0=0.5)
    rhs = lambda t, y: -y
    y0 = jnp.ones((4,))
    base, _ = meta_integrate([s], rhs, y0,
                             SolverOptions(solver_mode="standalone"))

    opts = SolverOptions(solver_mode="ensemble", ensemble_weights=[0.7],
                         ensemble_prob=1.0)
    y, aux = meta_integrate([s], rhs, y0, opts, key=jax.random.key(0))
    assert "ensemble_coin_flip" in aux and bool(aux["ensemble_coin_flip"])
    np.testing.assert_allclose(np.asarray(y), 0.7 * np.asarray(base),
                               rtol=1e-6)

    y2, aux2 = meta_integrate(
        [s], rhs, y0, SolverOptions(solver_mode="switch"),
        key=jax.random.key(1))
    assert int(aux2["switch_solver_id"]) == 0
    np.testing.assert_allclose(np.asarray(y2), np.asarray(base), rtol=1e-6)
