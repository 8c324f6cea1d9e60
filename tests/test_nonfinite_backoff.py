"""with_nonfinite_backoff: drops bad updates, dips the step size, and
recovers — the containment-WITH-recovery the 36-epoch divergence study
showed was missing (results/RESULTS.md)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_ode_metasolver_tpu.training import (
    make_optimizer,
    with_nonfinite_backoff,
)
from neural_ode_metasolver_tpu.training.optimizers import (
    NonfiniteBackoffState,
)


def _params():
    return {"w": jnp.ones((4,), jnp.float32)}


def test_finite_path_matches_inner_optimizer_scaled():
    inner = make_optimizer("sgd", 0.1, momentum=0.9)
    tx = with_nonfinite_backoff(inner)
    p = _params()
    s = tx.init(p)
    s_inner = inner.init(p)
    g = {"w": jnp.full((4,), 0.5)}
    u, s2 = tx.update(g, s, p)
    u_ref, _ = inner.update(g, s_inner, p)
    np.testing.assert_allclose(np.asarray(u["w"]), np.asarray(u_ref["w"]))
    assert float(s2.scale) == 1.0
    assert int(s2.n_skipped) == 0


def test_nan_grad_skipped_and_scale_dips():
    inner = make_optimizer("sgd", 0.1, momentum=0.9)
    tx = with_nonfinite_backoff(inner, backoff=0.5)
    p = _params()
    s = tx.init(p)
    # one good step to populate momentum
    g_good = {"w": jnp.full((4,), 0.5)}
    _, s = tx.update(g_good, s, p)
    trace_before = jax.tree_util.tree_leaves(s.inner)[0].copy()

    g_bad = {"w": jnp.array([1.0, jnp.nan, 1.0, 1.0])}
    u, s2 = tx.update(g_bad, s, p)
    assert np.all(np.asarray(u["w"]) == 0.0), "bad update must be dropped"
    assert float(s2.scale) == 0.5
    assert int(s2.n_skipped) == 1
    # inner state untouched by the skipped step
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(s2.inner)[0]),
        np.asarray(trace_before),
    )


def test_recovery_climbs_back_to_one():
    inner = make_optimizer("sgd", 0.1)
    tx = with_nonfinite_backoff(inner, backoff=0.25, recovery=2.0)
    p = _params()
    s = tx.init(p)
    g_bad = {"w": jnp.full((4,), jnp.inf)}
    g_good = {"w": jnp.full((4,), 0.1)}
    _, s = tx.update(g_bad, s, p)   # scale 0.25
    assert float(s.scale) == 0.25
    u, s = tx.update(g_good, s, p)  # applied at 0.5... no: 0.25, then *2
    np.testing.assert_allclose(
        np.asarray(u["w"]), -0.1 * 0.1 * 0.25, rtol=1e-6
    )
    assert float(s.scale) == 0.5
    _, s = tx.update(g_good, s, p)
    assert float(s.scale) == 1.0
    _, s = tx.update(g_good, s, p)
    assert float(s.scale) == 1.0  # capped


def test_scale_floor():
    inner = make_optimizer("sgd", 0.1)
    tx = with_nonfinite_backoff(inner, backoff=0.1, min_scale=1e-2)
    p = _params()
    s = tx.init(p)
    g_bad = {"w": jnp.full((4,), jnp.nan)}
    for _ in range(5):
        _, s = tx.update(g_bad, s, p)
    assert float(s.scale) == pytest.approx(1e-2)
    assert int(s.n_skipped) == 5


def test_jit_and_training_recovers_through_nan_burst():
    """End to end under jit: a burst of nan grads mid-training must not
    freeze progress — params keep moving afterwards."""
    inner = make_optimizer("sgd", 0.1, momentum=0.9)
    tx = with_nonfinite_backoff(inner, backoff=0.5, recovery=1.5)
    p = _params()
    s = tx.init(p)

    @jax.jit
    def step(p, s, g):
        import optax

        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    g = {"w": jnp.full((4,), 0.3)}
    for _ in range(3):
        p, s = step(p, s, g)
    p_before_burst = np.asarray(p["w"]).copy()
    bad = {"w": jnp.full((4,), jnp.nan)}
    for _ in range(3):
        p, s = step(p, s, bad)
    np.testing.assert_array_equal(np.asarray(p["w"]), p_before_burst)
    assert int(s.n_skipped) == 3
    for _ in range(6):  # 0.5^3 * 1.5^6 > 1 -> capped at 1.0
        p, s = step(p, s, g)
    assert np.all(np.isfinite(np.asarray(p["w"])))
    assert np.abs(np.asarray(p["w"]) - p_before_burst).max() > 0.05
    assert float(s.scale) == 1.0  # fully recovered


def test_skip_nonfinite_does_not_undo_backoff():
    """--skip_nonfinite and --nan_backoff together: the train step's skip
    branch must leave the backoff wrapper's bookkeeping (scale dip,
    n_skipped) intact — reverting the whole opt state would silently
    disable the LR backoff and degenerate to pure skip."""
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
    from neural_ode_metasolver_tpu.training import (
        create_train_state,
        make_train_step,
    )

    model = build_model("mnist", dim=16)
    tx = make_optimizer("sgd", 0.05, momentum=0.9, nonfinite_backoff=0.5)
    ts = create_train_state(model, tx, jax.random.key(0))
    solvers = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
    step = make_train_step(model, tx, solvers, SolverOptions(),
                           skip_nonfinite=True, donate=False)

    x_bad = jnp.full((4, 28, 28, 1), jnp.nan, jnp.float32)
    y = jnp.zeros((4,), jnp.int32)
    params_before = [np.asarray(l).copy()
                     for l in jax.tree_util.tree_leaves(ts.params)]
    ts2, m = step(ts, x_bad, y, jax.random.key(1))
    assert float(m["skipped_nonfinite"]) == 1.0
    assert isinstance(ts2.opt_state, NonfiniteBackoffState)
    # the event must be recorded: scale dipped, counter advanced
    assert float(ts2.opt_state.scale) == 0.5
    assert int(ts2.opt_state.n_skipped) == 1
    # and params still contained
    for a, b in zip(params_before,
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_every_k_lr_schedule_advances_per_iteration():
    """With gradient accumulation the LR schedule must tick every
    iteration (reference scheduler.step() per iteration,
    train_and_attack.py:564), not once per emitted update."""
    sched = lambda count: 10.0 ** count
    tx = make_optimizer("sgd", sched, momentum=0.0, every_k=2)
    p = {"w": jnp.zeros((2,))}
    s = tx.init(p)
    g = {"w": jnp.ones((2,))}
    u0, s = tx.update(g, s, p)   # iteration 0: accumulate, no emit
    np.testing.assert_array_equal(np.asarray(u0["w"]), 0.0)
    u1, s = tx.update(g, s, p)   # iteration 1: emit with lr=sched(1)=10
    np.testing.assert_allclose(np.asarray(u1["w"]), -10.0, rtol=1e-6)
    u2, s = tx.update(g, s, p)   # iteration 2: accumulate
    np.testing.assert_array_equal(np.asarray(u2["w"]), 0.0)
    u3, s = tx.update(g, s, p)   # iteration 3: emit with lr=sched(3)=1000
    np.testing.assert_allclose(np.asarray(u3["w"]), -1000.0, rtol=1e-6)
