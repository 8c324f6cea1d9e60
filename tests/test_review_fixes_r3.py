"""Regression tests for the round-3 package-wide review fixes.

Each test pins one finding from the round-3 inline review (applied across
ops/, training/, models/, data/, parallel/, serving.py); see the commit
that introduced this file for the finding list.
"""

import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.ops import create_solver
from neural_ode_metasolver_tpu.ops.integrate import odeint
from neural_ode_metasolver_tpu.ops.tableau import rk2_tableau


# -- ops/integrate.py -------------------------------------------------------


def test_odeint_backward_time_interpolation():
    """A decreasing time grid (t1 < t0) must interpolate correctly:
    searchsorted needs ascending input, the fix flips the sign of both
    grid and queries."""
    c = 0.75

    def rhs(t, y):
        return jnp.full_like(y, c)

    y0 = jnp.asarray([2.0])
    t = jnp.asarray([1.0, 0.6, 0.25, 0.0])
    ys = odeint(rk2_tableau(jnp.asarray(0.5)), rhs, y0, t, n_steps=4)
    # constant RHS: exact for any RK method, y(t) = y0 + c*(t - 1)
    expect = 2.0 + c * (np.asarray(t) - 1.0)
    np.testing.assert_allclose(np.asarray(ys)[:, 0], expect, rtol=1e-6)


def test_odeint_interpolation_preserves_bf16():
    """The f32 interpolation arithmetic must not promote a bf16 state."""
    def rhs(t, y):
        return -y

    y0 = jnp.ones((3,), jnp.bfloat16)
    ys = odeint(rk2_tableau(jnp.asarray(0.5)), rhs, y0,
                [0.0, 0.37, 1.0], n_steps=8)
    assert ys.dtype == jnp.bfloat16


# -- ops/solver.py ----------------------------------------------------------


def test_create_solver_rejects_degenerate_grid():
    with pytest.raises(ValueError, match="n_steps"):
        create_solver("rk2", "u", n_steps=0, u0=0.5)
    with pytest.raises(ValueError, match="step_size"):
        create_solver("rk2", "u", step_size=0.0, u0=0.5)


def test_with_params_raises_on_absent_param():
    s = create_solver("rk2", "u", n_steps=2, u0=0.5)
    with pytest.raises(ValueError, match="no parameter v"):
        s.with_params(v=0.3)
    e = create_solver("euler", "u", n_steps=2)
    with pytest.raises(ValueError, match="no parameter u"):
        e.with_params(u=0.3)


def test_reset_params_preserves_dtype():
    s = create_solver("rk2", "u", n_steps=2, u0=0.5)
    s16 = s.replace(u=jnp.asarray(0.9, jnp.bfloat16))
    assert s16.reset_params().u.dtype == jnp.bfloat16
    assert float(s16.reset_params().u) == 0.5


# -- training/schedules.py / metrics.py --------------------------------------


def test_learning_rate_with_decay_validates_lengths():
    from neural_ode_metasolver_tpu.training.schedules import (
        learning_rate_with_decay,
    )

    with pytest.raises(ValueError, match="decay_rates"):
        learning_rate_with_decay(
            0.1, 128, 100, boundary_epochs=(10, 20),
            decay_rates=(1.0, 0.1),  # needs 3
        )


def test_nfe_switch_probs_length_mismatch_raises():
    from neural_ode_metasolver_tpu.ops.regimes import SolverOptions
    from neural_ode_metasolver_tpu.training.metrics import nfe_per_forward

    solvers = [create_solver("rk2", "u", n_steps=2, u0=u)
               for u in (0.5, 1.0)]
    opts = SolverOptions(solver_mode="switch", switch_probs=[1.0])
    with pytest.raises(ValueError, match="switch_probs"):
        nfe_per_forward(solvers, opts, n_ode_blocks=1)


# -- data ---------------------------------------------------------------------


def test_batch_iterator_mean_without_std_raises():
    from neural_ode_metasolver_tpu.data.datasets import (
        Dataset,
        batch_iterator,
    )

    ds = Dataset(np.zeros((4, 8, 8, 1), np.float32),
                 np.zeros((4,), np.int64))
    with pytest.raises(ValueError, match="mean and std"):
        list(batch_iterator(ds, 2, mean=(0.5,), std=None))


def test_inf_generator_empty_epoch_raises():
    from neural_ode_metasolver_tpu.data.datasets import inf_generator

    gen = inf_generator(lambda epoch: iter(()))
    with pytest.raises(ValueError, match="no batches"):
        next(gen)


def test_prefetch_thread_starts_lazily():
    """Constructing the prefetcher must not spawn the producer thread (a
    never-iterated generator would otherwise leak it + queued batches)."""
    from neural_ode_metasolver_tpu.data.prefetch import prefetch_to_device

    def n_prefetch_threads():
        return sum(t.name == "prefetch" and t.is_alive()
                   for t in threading.enumerate())

    before = n_prefetch_threads()
    batches = [(np.ones((2, 2), np.float32), np.zeros((2,), np.int64))
               for _ in range(3)]
    gen = prefetch_to_device(iter(batches), size=2)
    assert n_prefetch_threads() == before  # not started yet
    out = list(gen)
    assert len(out) == 3


# -- models/nn.py -------------------------------------------------------------


def test_apply_init_scheme_unknown_raises():
    from neural_ode_metasolver_tpu.models.nn import apply_init_scheme

    with pytest.raises(NameError, match="init scheme"):
        apply_init_scheme(jax.random.key(0), {"w": jnp.ones((2, 2))},
                          "orthogonall")


def test_group_norm_divisibility_validated_at_init():
    from neural_ode_metasolver_tpu.models.nn import make_norm_def

    nd = make_norm_def("GN", num_groups=32)
    with pytest.raises(ValueError, match="divisible"):
        nd.init(48)  # min(32, 48) = 32 does not divide 48
    # exact-fit channels still fine
    nd.init(64)


# -- parallel/ensemble.py -----------------------------------------------------


def test_ensemble_stack_rejects_mixed_frozen():
    from neural_ode_metasolver_tpu.parallel.ensemble import (
        stack_solver_params,
    )

    a = create_solver("rk2", "u", n_steps=2, u0=0.5)
    b = create_solver("rk2", "u", n_steps=2, u0=1.0).unfreeze()
    with pytest.raises(ValueError, match="homogeneous"):
        stack_solver_params([a, b])


# -- training/evaluate.py: call-time member params ---------------------------


def test_ensemble_closure_uses_call_time_params():
    """make_ensemble_probs must evaluate the members passed at CALL time,
    not the build-time weights (per-epoch predict= reuse was silently
    evaluating epoch-0 params)."""
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions
    from neural_ode_metasolver_tpu.training import (
        accuracy_ensemble,
        make_ensemble_probs,
    )

    model = build_model("mnist", dim=8)
    p0, s0 = model.init(jax.random.key(0))
    p1 = jax.tree_util.tree_map(lambda l: l + 0.25, p0)

    def members(p):
        return [
            (p, s0, [create_solver("rk2", "u", n_steps=2, u0=u)],
             SolverOptions())
            for u in (0.5, 1.0)
        ]

    xs = np.random.RandomState(0).rand(8, 28, 28, 1).astype(np.float32)
    ys = np.arange(8) % 10
    data = lambda: [(xs, ys)]

    closure = make_ensemble_probs(model, members(p0))
    reused = accuracy_ensemble(model, members(p1), data(), predict=closure)
    fresh = accuracy_ensemble(model, members(p1), data())
    assert reused == fresh

    # structural mismatch must raise, not silently mis-evaluate
    with pytest.raises(ValueError, match="different member structure"):
        closure(members(p1)[:1], jnp.asarray(xs), [None])


# -- training/solver_training.py ----------------------------------------------


def _tiny_solver_step(solvers, loss_cfg=None, attack_mode="clean"):
    import optax

    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions
    from neural_ode_metasolver_tpu.training.solver_training import (
        create_solver_train_state,
        make_solver_train_step,
    )
    from neural_ode_metasolver_tpu.training.train import (
        AttackConfig,
        LossConfig,
    )

    model = build_model("mnist", dim=8)
    tx = optax.sgd(1e-2)
    stx = optax.sgd(1e-2)
    kwargs = {}
    if loss_cfg is not None:
        kwargs["loss_cfg"] = loss_cfg
    step = make_solver_train_step(
        model, tx, stx, solvers, SolverOptions(),
        AttackConfig(mode=attack_mode), jit_compile=False, **kwargs
    )
    ts = create_solver_train_state(model, tx, stx, solvers,
                                   jax.random.key(0))
    return step, ts


def test_solver_training_data_noise_applied():
    from neural_ode_metasolver_tpu.training.train import LossConfig

    solvers = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
    x = np.random.RandomState(1).rand(4, 28, 28, 1).astype(np.float32)
    y = np.arange(4) % 10

    step0, ts0 = _tiny_solver_step(solvers, LossConfig(data_noise_std=0.0))
    step1, ts1 = _tiny_solver_step(solvers, LossConfig(data_noise_std=0.5))
    _, m0 = step0(ts0, jnp.asarray(x), jnp.asarray(y), jax.random.key(3))
    _, m1 = step1(ts1, jnp.asarray(x), jnp.asarray(y), jax.random.key(3))
    assert float(m0["loss"]) != float(m1["loss"])


def test_rk4_uv_pole_band_excluded_after_update():
    """Post-update clipping must push u out of the zero-gradient clamp
    band around the u=1/2 pole of the rk4 'uv' tableau."""
    solvers = [create_solver("rk4", "uv", n_steps=1, u0=0.5005, v0=0.8)]
    x = np.random.RandomState(2).rand(2, 28, 28, 1).astype(np.float32)
    y = np.arange(2) % 10

    step, ts = _tiny_solver_step(solvers)
    ts2, _ = step(ts, jnp.asarray(x), jnp.asarray(y), jax.random.key(5))
    u_new = float(ts2.solver_params[0]["u"])
    # f32 slack: 0.5 +/- 2e-3 is not exactly representable
    assert abs(u_new - 0.5) >= 2e-3 - 1e-6


# -- serving.py ---------------------------------------------------------------


def test_export_config_reserved_keys_win(tmp_path):
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions
    from neural_ode_metasolver_tpu.serving import export_model

    model = build_model("mnist", dim=8)
    params, state = model.init(jax.random.key(0))
    solvers = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
    path = str(tmp_path / "artifact")
    export_model(
        path, model, params, state, solvers, SolverOptions(),
        input_shape=(1, 28, 28, 1), batch_polymorphic=False,
        config={"input_shape": "bogus", "note": "kept"},
    )
    with open(f"{path}/config.json") as f:
        meta = json.load(f)
    assert meta["input_shape"] == [1, 28, 28, 1]
    assert meta["note"] == "kept"


# -- models/nn.py: GeLUtanh perf activation ----------------------------------


def test_gelutanh_activation_registered_and_close_to_exact():
    """'GeLUtanh' (tanh-approx gelu, a TPU perf opt-in with no reference
    counterpart) must be registered and numerically near the exact-erf
    'GeLU' (max |diff| ~3e-4, far below bf16 resolution)."""
    from neural_ode_metasolver_tpu.models.nn import get_activation

    exact = get_activation("GeLU")
    approx = get_activation("GeLUtanh")
    x = jnp.linspace(-6.0, 6.0, 4001)
    diff = float(jnp.max(jnp.abs(exact(x) - approx(x))))
    assert diff < 5e-4
    # and it builds into the flagship registry
    from neural_ode_metasolver_tpu.models.api import build_model

    m = build_model("premetanode10", in_planes=8, acts=("GeLUtanh",) * 3)
    p, s = m.init(jax.random.key(0))
    from neural_ode_metasolver_tpu.ops import SolverOptions

    solver = create_solver("rk2", "u", n_steps=2, u0=0.5)
    logits, _, _ = m.apply(p, s, jnp.zeros((2, 32, 32, 3)), [solver],
                           SolverOptions())
    assert logits.shape == (2, 10)


def test_gelupoly_is_parity_grade():
    """'GeLUpoly' (tanh-kernel exact-GELU: 0.5*x*(1+tanh(x*q(x^2)))) must
    match the exact erf form to 5e-6 forward and 5e-5 grad everywhere
    (measured 3.4e-6 / 1.5e-5 — two orders inside the CIFAR torch-parity
    bar of 3e-4), and preserve input dtype."""
    from neural_ode_metasolver_tpu.models.nn import gelu_poly, get_activation

    exact = get_activation("GeLU")
    assert get_activation("GeLUpoly") is gelu_poly
    x = jnp.linspace(-9.0, 9.0, 100001)
    assert float(jnp.max(jnp.abs(exact(x) - gelu_poly(x)))) < 5e-6
    g1 = jax.vmap(jax.grad(exact))(x)
    g2 = jax.vmap(jax.grad(gelu_poly))(x)
    assert float(jnp.max(jnp.abs(g1 - g2))) < 5e-5
    # dtype preserved, and the bf16 accuracy class is pinned: vs the
    # exact form evaluated at the same bf16 points the diff stays within
    # 2 bf16 ulps at |x|<=9 (measured 1.6e-2; ulp at 8 is 6.25e-2)
    xb = x.astype(jnp.bfloat16)
    out = gelu_poly(xb)
    assert out.dtype == jnp.bfloat16
    exact_b = exact(xb).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(exact_b - out.astype(jnp.float32)))) < 0.04
    # flagship model builds and runs with it
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions

    m = build_model("premetanode10", in_planes=8, acts=("GeLUpoly",) * 3)
    p, s = m.init(jax.random.key(0))
    solver = create_solver("rk2", "u", n_steps=2, u0=0.5)
    logits, _, _ = m.apply(p, s, jnp.zeros((2, 32, 32, 3)), [solver],
                           SolverOptions())
    assert logits.shape == (2, 10) and bool(jnp.all(jnp.isfinite(logits)))
