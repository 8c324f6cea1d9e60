"""Failure-containment and resume tests: non-finite-batch skipping, and
training resumption from the rolling checkpoint via the runner CLI."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
from neural_ode_metasolver_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

SOLVERS = [create_solver("rk2", "u", n_steps=2, u0=0.5)]


def test_skip_nonfinite_preserves_params():
    model = build_model("mnist", dim=16)
    tx = make_optimizer("sgd", 0.05, momentum=0.9)
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, SOLVERS, SolverOptions(),
                           skip_nonfinite=True, donate=False)

    x_bad = jnp.full((4, 28, 28, 1), jnp.nan, jnp.float32)
    y = jnp.zeros((4,), jnp.int32)
    ts2, m = step(ts, x_bad, y, jax.random.key(1))
    assert float(m["skipped_nonfinite"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(ts.params),
        jax.tree_util.tree_leaves(ts2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x_good = jnp.ones((4, 28, 28, 1), jnp.float32)
    ts3, m = step(ts2, x_good, y, jax.random.key(2))
    assert float(m["skipped_nonfinite"]) == 0.0
    # params moved this time
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(ts2.params),
            jax.tree_util.tree_leaves(ts3.params),
        )
    )
    assert moved


def test_runner_resume(tmp_path):
    from neural_ode_metasolver_tpu.runners import mnist_runner

    save = str(tmp_path / "exp")
    base_args = [
        "--solvers", "rk2,u,2,-1,0.5,-1",
        "--nepochs", "1",
        "--batch_size", "16",
        "--test_batch_size", "16",
        "--synthetic_train_size", "32",
        "--synthetic_test_size", "16",
        "--save_dir", save,
    ]
    mnist_runner.main(base_args)
    steps1 = sorted(glob.glob(os.path.join(save, "last", "step_*")))
    assert steps1
    step1 = int(steps1[-1].split("_")[-1])

    mnist_runner.main(base_args + ["--resume"])
    steps2 = sorted(glob.glob(os.path.join(save, "last", "step_*")))
    step2 = int(steps2[-1].split("_")[-1])
    assert step2 == 2 * step1  # continued, not restarted


def test_async_checkpoint_roundtrip(tmp_path):
    """block=False saves commit after wait_for_checkpoints(); back-to-back
    async saves (validate + 'last' in one epoch) must both land."""
    import jax
    import jax.numpy as jnp

    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.training import (
        create_train_state,
        make_optimizer,
        restore_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )
    from neural_ode_metasolver_tpu.training.checkpoint import latest_step

    model = build_model("mnist", dim=8)
    tx = make_optimizer("sgd", 0.1)
    ts = create_train_state(model, tx, jax.random.key(0))
    ts2 = ts.replace(step=ts.step + 1)

    save_checkpoint(str(tmp_path / "best"), ts, {"tag": "best"}, block=False)
    save_checkpoint(str(tmp_path / "last"), ts2, {"tag": "last"}, block=False)
    wait_for_checkpoints()

    r1, c1 = restore_checkpoint(str(tmp_path / "best"), ts)
    r2, c2 = restore_checkpoint(str(tmp_path / "last"), ts2)
    assert c1["tag"] == "best" and c2["tag"] == "last"
    assert latest_step(str(tmp_path / "last")) == int(ts2.step)
    eq = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts.params, r1.params)
    assert jax.tree_util.tree_all(eq)


def test_latest_step_ignores_uncommitted_checkpoint(tmp_path):
    """A crash between async config.json write and the orbax state commit
    must not shadow the older complete checkpoint."""
    import jax

    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.training import (
        create_train_state,
        make_optimizer,
        restore_checkpoint,
        save_checkpoint,
    )
    from neural_ode_metasolver_tpu.training.checkpoint import latest_step

    model = build_model("mnist", dim=8)
    ts = create_train_state(model, make_optimizer("sgd", 0.1),
                            jax.random.key(0))
    save_checkpoint(str(tmp_path), ts)  # complete step_00000000
    torn = tmp_path / "step_00000007"
    torn.mkdir()
    (torn / "config.json").write_text("{}")  # config landed, state did not
    assert latest_step(str(tmp_path)) == 0
    restored, _ = restore_checkpoint(str(tmp_path), ts)
    assert int(restored.step) == 0


def _leaf_backoff_states(opt_state):
    from neural_ode_metasolver_tpu.training.optimizers import (
        NonfiniteBackoffState,
    )

    return [
        s for s in jax.tree_util.tree_leaves(
            opt_state,
            is_leaf=lambda x: isinstance(x, NonfiniteBackoffState))
        if isinstance(s, NonfiniteBackoffState)
    ]


def test_skip_nonfinite_preserves_nested_backoff_bookkeeping():
    """with_nonfinite_backoff nested under optax.MultiSteps: a skipped
    batch must still dip the backoff scale and bump n_skipped (the skip
    revert must not flatten through the wrapper's state)."""
    from neural_ode_metasolver_tpu.training import with_nonfinite_backoff
    import optax

    model = build_model("mnist", dim=16)
    tx = optax.MultiSteps(
        with_nonfinite_backoff(make_optimizer("sgd", 0.05, momentum=0.9),
                               backoff=0.5),
        every_k_schedule=1,
    )
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, SOLVERS, SolverOptions(),
                           skip_nonfinite=True, donate=False)

    x_bad = jnp.full((4, 28, 28, 1), jnp.nan, jnp.float32)
    y = jnp.zeros((4,), jnp.int32)
    ts2, m = step(ts, x_bad, y, jax.random.key(1))
    assert float(m["skipped_nonfinite"]) == 1.0
    (b,) = _leaf_backoff_states(ts2.opt_state)
    assert float(b.scale) == 0.5, "nested backoff scale must dip on skip"
    assert int(b.n_skipped) == 1
    for a, c in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_skip_nonfinite_loss_overflow_consistent_with_backoff():
    """Non-finite LOSS with finite grads (ss-loss overflow shape): the
    NaN-forced gradient stream makes the backoff wrapper skip exactly the
    batches the params skip — momentum must not absorb an update the
    params never took."""
    from neural_ode_metasolver_tpu.training import with_nonfinite_backoff

    model = build_model("mnist", dim=16)
    tx = with_nonfinite_backoff(make_optimizer("sgd", 0.05, momentum=0.9),
                                backoff=0.5)
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, SOLVERS, SolverOptions(),
                           skip_nonfinite=True, donate=False)

    # One clean step to put momentum in a known nonzero state
    x_good = jnp.ones((4, 28, 28, 1), jnp.float32)
    y = jnp.zeros((4,), jnp.int32)
    ts1, _ = step(ts, x_good, y, jax.random.key(2))
    mom_before = [np.asarray(l).copy() for l in
                  jax.tree_util.tree_leaves(ts1.opt_state.inner)]

    # Inputs big enough to overflow the f32 loss while keeping the
    # gradient representable is fragile to construct through the real
    # model; drive the predicate directly instead: x that NaNs the loss
    # also NaNs grads here, but the assertion below checks the combined
    # contract — after ANY skipped batch, inner momentum is untouched
    # and scale dipped, i.e. params and optimizer agree the batch never
    # happened.
    x_bad = jnp.full((4, 28, 28, 1), jnp.inf, jnp.float32)
    ts2, m = step(ts1, x_bad, y, jax.random.key(3))
    assert float(m["skipped_nonfinite"]) == 1.0
    assert float(ts2.opt_state.scale) == 0.5
    assert int(ts2.opt_state.n_skipped) == 1
    for a, c in zip(mom_before,
                    jax.tree_util.tree_leaves(ts2.opt_state.inner)):
        np.testing.assert_array_equal(a, np.asarray(c))
    for a, c in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_skip_nonfinite_preserves_model_state():
    """A skipped batch must not commit NaN BN running statistics."""
    from neural_ode_metasolver_tpu.models.api import build_model

    model = build_model("premetanode4", in_planes=8,
                        norms=("BN", "BN", "BN"))
    tx = make_optimizer("sgd", 0.05)
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, SOLVERS, SolverOptions(),
                           skip_nonfinite=True, donate=False)
    x_bad = jnp.full((4, 32, 32, 3), jnp.nan, jnp.float32)
    y = jnp.zeros((4,), jnp.int32)
    ts2, m = step(ts, x_bad, y, jax.random.key(1))
    assert float(m["skipped_nonfinite"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(ts.model_state),
                    jax.tree_util.tree_leaves(ts2.model_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
