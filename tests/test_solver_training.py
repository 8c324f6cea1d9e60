"""Trainable-solver-parameter tests: u/v receive gradients through the
integration scan and move under their own optimizer (reference lr_uv analog,
runner_old.py:184-185)."""
import jax
import jax.numpy as jnp
import numpy as np

from neural_ode_metasolver_tpu.data import batch_iterator, synthetic_dataset
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
from neural_ode_metasolver_tpu.training import (
    AttackConfig,
    create_solver_train_state,
    make_optimizer,
    make_solver_train_step,
    solvers_from_state,
)

OPTS = SolverOptions()


def setup(solvers, **step_kw):
    model = build_model("mnist", dim=16)
    tx = make_optimizer("sgd", 0.05, momentum=0.9)
    solver_tx = make_optimizer("sgd", 0.01)  # the lr_uv group
    ts = create_solver_train_state(model, tx, solver_tx, solvers,
                                   jax.random.key(0))
    step = make_solver_train_step(model, tx, solver_tx, solvers, OPTS,
                                  **step_kw)
    return model, ts, step


def batches(n=4, bs=8):
    ds = synthetic_dataset(n * bs, (28, 28, 1), seed=0)
    return list(batch_iterator(ds, bs, seed=0))


def test_solver_u_moves_and_stays_valid():
    solvers = [create_solver("rk2", "u", n_steps=4, u0=0.5)]
    model, ts, step = setup(solvers)
    u0 = float(ts.solver_params[0]["u"])
    for i, (x, y) in enumerate(batches(6)):
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), jax.random.key(i))
    u1 = float(ts.solver_params[0]["u"])
    assert u1 != u0
    assert 1e-3 <= u1 <= 1.0
    assert float(m["solver_grad_norm"]) >= 0
    assert np.isfinite(float(m["loss"]))


def test_solver_u_boundary_starts_stay_contained():
    """Starts ON the validity boundaries: the post-update clip keeps u in
    [1e-3, 1] under boundary pressure (an outward gradient pins u at the
    bound — observed live on-chip at u0=1.0, results/RESULTS.md — and an
    inward one re-enters), training stays finite either way. A huge
    lr_uv forces boundary crossings every step."""
    for u_start in (1.0, 1e-3):
        solvers = [create_solver("rk2", "u", n_steps=4, u0=u_start)]
        model = build_model("mnist", dim=16)
        tx = make_optimizer("sgd", 0.05, momentum=0.9)
        solver_tx = make_optimizer("sgd", 5.0)  # absurd lr_uv on purpose
        ts = create_solver_train_state(model, tx, solver_tx, solvers,
                                       jax.random.key(0))
        step = make_solver_train_step(model, tx, solver_tx, solvers, OPTS)
        for i, (x, y) in enumerate(batches(6)):
            ts, m = step(ts, jnp.asarray(x), jnp.asarray(y),
                         jax.random.key(i))
            u = float(ts.solver_params[0]["u"])
            assert 1e-3 <= u <= 1.0, (u_start, i, u)
            assert np.isfinite(float(m["loss"])), (u_start, i)


def test_rk3_both_params_train():
    solvers = [create_solver("rk3", "uv", n_steps=4, u0=1 / 3, v0=2 / 3)]
    model, ts, step = setup(solvers)
    x, y = batches(1)[0]
    for i in range(3):
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), jax.random.key(i))
    assert float(ts.solver_params[0]["u"]) != 1 / 3
    assert float(ts.solver_params[0]["v"]) != 2 / 3
    assert "solver0_v" in m


def test_solvers_from_state_roundtrip():
    solvers = [
        create_solver("rk2", "u", n_steps=4, u0=0.5),
        create_solver("rk4", "u2", n_steps=2, u0=1 / 3),
    ]
    model, ts, step = setup(solvers)
    rebuilt = solvers_from_state(solvers, ts.solver_params)
    assert all(not s.frozen for s in rebuilt)
    np.testing.assert_allclose(float(rebuilt[0].u), 0.5)
    np.testing.assert_allclose(float(rebuilt[1].u), 1 / 3)
    assert rebuilt[1].n_steps == 2


def test_solver_training_under_adversarial_mode():
    solvers = [create_solver("rk2", "u", n_steps=2, u0=0.6)]
    model, ts, step = setup(
        solvers, attack_cfg=AttackConfig(mode="fgsm", eps=0.1)
    )
    x, y = batches(1)[0]
    ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    assert int(ts.step) == 1


def test_learning_u_moves_toward_classical_optimum():
    """Gradient descent on integration error moves u from 0.25 toward the
    classical RK2 error-minimizing region (~2/3) — the framework's core
    differentiable-solver premise, with no network involved."""
    import optax
    from neural_ode_metasolver_tpu.ops import odeint_final, rk2_tableau

    def rhs(a, t, y):
        return jnp.tanh(a[0] * y) + a[1] * jnp.sin(2.0 * t + a[2])

    def loss_fn(u, key):
        a = jax.random.normal(key, (3,), jnp.float32)
        y0 = jax.random.normal(jax.random.fold_in(key, 1), (8,), jnp.float32)
        f = lambda t, y: rhs(a, t, y)
        coarse = odeint_final(rk2_tableau(u), f, y0, 0.0, 1.0, n_steps=4)
        fine = odeint_final(rk2_tableau(jnp.float32(2 / 3)), f, y0, 0.0, 1.0,
                            n_steps=256)
        return jnp.mean((coarse - fine) ** 2)

    tx = optax.adam(5e-3)
    u = jnp.float32(0.25)
    opt_state = tx.init(u)

    @jax.jit
    def step(u, opt_state, key):
        loss, g = jax.value_and_grad(loss_fn)(u, key)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(u, updates), opt_state, loss

    key = jax.random.key(0)
    for i in range(300):
        key, sub = jax.random.split(key)
        u, opt_state, _ = step(u, opt_state, sub)
    assert 0.42 < float(u) < 0.9, float(u)


def test_rk4_trainable_u_does_not_freeze_at_one():
    """clip_solver_params must keep rk4's u strictly inside the tableau
    validity clamp [eps, 1-eps] (ops/tableau.py): parking u at exactly 1.0
    would zero d(tableau)/du and freeze the parameter permanently."""
    import optax

    model = build_model("mnist", dim=8)
    solver = create_solver("rk4", "u2", n_steps=2, u0=0.97).unfreeze()
    tx = make_optimizer("sgd", 0.0)  # freeze the net; only u moves
    solver_tx = optax.sgd(5.0)  # huge lr slams u into the boundary
    step = make_solver_train_step(model, tx, solver_tx, [solver],
                                  SolverOptions(), donate=False)
    ts = create_solver_train_state(model, tx, solver_tx, [solver],
                                   jax.random.key(0))
    x = jnp.asarray(np.random.RandomState(1).rand(4, 28, 28, 1), jnp.float32)
    y = jnp.asarray([0, 1, 2, 3])
    us = []
    for i in range(3):
        ts, _ = step(ts, x, y, jax.random.key(i))
        us.append(float(ts.solver_params[0]["u"]))
    assert all(u <= 1.0 - 1e-3 + 1e-9 for u in us), us
    # the gradient stays alive: u keeps moving across steps
    assert len(set(us)) > 1, us
