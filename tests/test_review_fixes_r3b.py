"""Regression tests for the round-3 session-6 package review findings:
backward-time step_size grids, the self-built-grid extrapolation guard,
the rk3 trained-u pole, NFE grid-source priority, and remat/unroll on the
adversarial eval path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.ops import (
    SolverOptions,
    create_solver,
    make_time_grid,
    odeint,
    odeint_final,
    rk2_tableau,
    rk3_tableau,
)


def _rhs(t, y):
    return -y


# -- ops/integrate.py: step_size with a backward span ------------------------


def test_make_time_grid_step_size_backward_span():
    """t1 < t0 with step_size must build a DESCENDING grid (it used to
    produce an empty arange, turning the integration into a silent
    no-op)."""
    g = np.asarray(make_time_grid(1.0, 0.0, step_size=0.25))
    assert g.shape == (5,)
    np.testing.assert_allclose(g, [1.0, 0.75, 0.5, 0.25, 0.0], atol=1e-6)
    # non-divisible span clamps the last point to t1
    g2 = np.asarray(make_time_grid(1.0, 0.0, step_size=0.3))
    assert g2[0] == 1.0 and g2[-1] == 0.0
    assert np.all(np.diff(g2) < 0)


def test_make_time_grid_rejects_nonpositive_step():
    with pytest.raises(ValueError, match="positive"):
        make_time_grid(0.0, 1.0, step_size=-0.25)


def test_odeint_final_step_size_backward_integration():
    """Backward-time solve with step_size must actually integrate:
    y' = -y from t=1 to t=0 grows by e (the empty-grid bug returned y0)."""
    y1 = odeint_final(rk2_tableau(jnp.float32(0.5)), _rhs,
                      jnp.ones(2), t0=1.0, t1=0.0, step_size=0.0625)
    np.testing.assert_allclose(np.asarray(y1), np.e, rtol=1e-3)
    # and matches the n_steps path on the same grid
    y1b = odeint_final(rk2_tableau(jnp.float32(0.5)), _rhs,
                       jnp.ones(2), t0=1.0, t1=0.0, n_steps=16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1b), atol=1e-6)


def test_odeint_step_size_backward_trajectory():
    ys = odeint(rk2_tableau(jnp.float32(0.5)), _rhs, jnp.ones(1),
                t=[1.0, 0.5, 0.0], step_size=0.0625)
    np.testing.assert_allclose(
        np.asarray(ys[:, 0]), np.exp([0.0, 0.5, 1.0]), rtol=1e-3)


# -- ops/integrate.py: extrapolation guard on self-built grids ---------------


def test_odeint_rejects_times_outside_built_grid():
    """A grid built from n_steps/step_size spans [t[0], t[-1]] only;
    interior requested times outside that span must raise, not silently
    linearly extrapolate."""
    with pytest.raises(ValueError, match="outside the"):
        odeint(rk2_tableau(jnp.float32(0.5)), _rhs, jnp.ones(3),
               t=[0.0, 2.0, 1.0], n_steps=8)
    with pytest.raises(ValueError, match="outside the"):
        odeint(rk2_tableau(jnp.float32(0.5)), _rhs, jnp.ones(3),
               t=[0.0, 2.0, 1.0], step_size=0.125)


# -- training/solver_training.py: rk3 pole at u=2/3 --------------------------


def test_rk3_tableau_pole_at_two_thirds_is_real():
    """(documents the hazard) rk3 stage couplings explode as u -> 2/3."""
    tab = rk3_tableau(jnp.float32(2.0 / 3.0), jnp.float32(0.9))
    assert not bool(jnp.all(jnp.isfinite(tab.w)))


def test_rk3_trainable_u_stays_off_the_pole():
    """clip_solver_params must keep a trained rk3 u a band away from the
    2/3 pole — one step through it produces inf stage couplings and NaNs
    both solver and model grads permanently."""
    import optax

    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.training import (
        create_solver_train_state,
        make_optimizer,
        make_solver_train_step,
    )

    model = build_model("mnist", dim=8)
    # v=1/3: reference rk3 default; u starts just below the pole
    solver = create_solver("rk3", "uv", n_steps=2, u0=0.664,
                           v0=1.0 / 3.0).unfreeze()
    tx = make_optimizer("sgd", 0.0)
    solver_tx = optax.sgd(1.0)  # big lr so u tries to cross the pole
    step = make_solver_train_step(model, tx, solver_tx, [solver],
                                  SolverOptions(), donate=False)
    ts = create_solver_train_state(model, tx, solver_tx, [solver],
                                   jax.random.key(0))
    x = jnp.asarray(np.random.RandomState(1).rand(4, 28, 28, 1), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3])
    for i in range(4):
        ts, metrics = step(ts, x, y, jax.random.key(i))
        u = float(ts.solver_params[0]["u"])
        # f32 band-edge rounding: 2/3 + 2e-3 lands ~6e-9 inside the band
        assert abs(u - 2.0 / 3.0) >= 2e-3 - 1e-5, u
        assert np.isfinite(float(metrics["loss"]))


# -- training/metrics.py: NFE grid-source priority ----------------------------


def test_nfe_per_solve_custom_grid_overrides_n_steps():
    """custom_grid wins in ParametricSolver.time_grid, so it must win in
    the NFE metric too (it used to report n_steps' count)."""
    from neural_ode_metasolver_tpu.training.metrics import nfe_per_solve

    s = create_solver("rk2", "u", n_steps=8, u0=0.5)
    s2 = s.replace(custom_grid=(0.0, 1.0))
    assert nfe_per_solve(s) == 16
    assert nfe_per_solve(s2) == 2  # one step, two stages


def test_nfe_per_solve_step_size_counts_real_grid():
    from neural_ode_metasolver_tpu.training.metrics import nfe_per_solve

    s = create_solver("rk2", "u", n_steps=None, step_size=0.3, u0=0.5)
    expected_steps = make_time_grid(0.0, 1.0, step_size=0.3).shape[0] - 1
    assert nfe_per_solve(s) == 2 * expected_steps


# -- models: ss-loss reduction runs in f32 under bf16 compute ----------------


def test_ss_loss_reduction_is_f32_under_bf16():
    """The ||z-x|| reduction over ~HW*C elements must upcast to f32: under
    a bf16 compute policy the bf16-accumulated value drifts far from the
    f32 semantics the reference (torch) uses."""
    from neural_ode_metasolver_tpu.models.api import build_model

    model = build_model("premetanode10", in_planes=8)
    params, state = model.init(jax.random.key(0))
    solver = create_solver("rk2", "u", n_steps=2, u0=0.5)
    x32 = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3),
                      jnp.float32)

    def ss_of(x):
        _, _, aux = model.apply(params, state, x, [solver], SolverOptions(),
                                ss_loss=True)
        return float(aux["ss_loss"])

    ss_f32 = ss_of(x32)
    ss_bf16 = ss_of(x32.astype(jnp.bfloat16))
    assert ss_f32 > 0
    # bf16 ACTIVATIONS still differ slightly, but with the f32 reduction
    # the relative gap stays small; a bf16-accumulated norm drifts percent+
    assert abs(ss_bf16 - ss_f32) / ss_f32 < 0.02, (ss_bf16, ss_f32)


# -- parallel/ensemble.py: euler ensembles rejected clearly -------------------


def test_ensemble_integrate_rejects_euler_with_clear_error():
    from neural_ode_metasolver_tpu.parallel.ensemble import ensemble_integrate

    solvers = [create_solver("euler", "u", n_steps=4) for _ in range(2)]
    with pytest.raises(ValueError, match="parametric solver family"):
        ensemble_integrate(solvers, _rhs, jnp.ones((2, 3)))


# -- training/evaluate.py: remat/unroll reach adversarial eval ---------------


def test_adversarial_predict_accepts_remat_and_unroll():
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.training import (
        AttackConfig,
        adversarial_accuracy,
        make_adversarial_predict,
    )

    model = build_model("mnist", dim=8)
    params, state = model.init(jax.random.key(0))
    solvers = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
    cfg = AttackConfig(mode="fgsm", eps=0.1, alpha=0.1)
    predict = make_adversarial_predict(model, solvers, SolverOptions(), cfg,
                                       remat=True, unroll=2)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 28, 28, 1), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3])
    logits = predict(params, state, x, y, jax.random.key(1),
                     jax.random.key(2))
    assert logits.shape == (4, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # the kwargs also flow through adversarial_accuracy's builder path
    acc = adversarial_accuracy(
        model, params, state, solvers, SolverOptions(), [(x, y)], cfg,
        jax.random.key(3), remat=True, unroll=2,
    )
    assert 0.0 <= acc <= 1.0
