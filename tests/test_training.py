"""Training engine tests: schedule parity vs torch, optimizer parity, the
jitted train step (clean + adversarial + smoothing + ss-loss), end-to-end
learning on synthetic data, eval harness, and checkpoint roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_ode_metasolver_tpu.data import (
    Dataset,
    batch_iterator,
    synthetic_dataset,
    train_val_split,
)
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
from neural_ode_metasolver_tpu.training import (
    AttackConfig,
    LossConfig,
    NoiseConfig,
    RunningAverageMeter,
    accuracy,
    accuracy_ensemble,
    adversarial_accuracy,
    adversarial_accuracy_ensemble,
    create_train_state,
    cyclic_lr,
    cyclic_momentum,
    learning_rate_with_decay,
    make_optimizer,
    make_train_step,
    nfe_per_forward,
    nfe_per_solve,
    restore_checkpoint,
    save_checkpoint,
    sn_test,
)

SOLVERS = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
OPTS = SolverOptions()


def small_mnist_model():
    return build_model("mnist", dim=16)


def tiny_batches(n_batches=4, bs=8, shape=(28, 28, 1), seed=0):
    ds = synthetic_dataset(n_batches * bs, shape, seed=seed)
    return list(batch_iterator(ds, bs, seed=seed))


# ------------------------------------------------------------ schedules ---


def test_cyclic_lr_matches_torch():
    torch = pytest.importorskip("torch")
    base, mx, up = 1e-7, 0.1, 10
    sched = cyclic_lr(base, mx, up, "triangular2")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=base, max_lr=mx, step_size_up=up, mode="triangular2",
        cycle_momentum=False,
    )
    for step in range(55):
        ours = float(sched(step))
        theirs = tsched.get_last_lr()[0]
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-9)
        opt.step()
        tsched.step()


def test_cyclic_momentum_matches_torch():
    """torch CyclicLR with cycle_momentum=True (the reference's SGD
    default, train_and_attack.py:503-508) writes a cycled momentum into
    the param group each step; our schedule must trace it exactly."""
    torch = pytest.importorskip("torch")
    base, mx, up = 1e-7, 0.1, 10
    sched = cyclic_momentum(up, "triangular2")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base, momentum=0.9)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=base, max_lr=mx, step_size_up=up, mode="triangular2",
        cycle_momentum=True,
    )
    for step in range(55):
        ours = float(sched(step))
        theirs = opt.param_groups[0]["momentum"]
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-9)
        opt.step()
        tsched.step()


def test_sgd_cyclic_momentum_updates_match_torch():
    """make_optimizer with a callable momentum must reproduce torch SGD
    whose momentum is rewritten per step by CyclicLR(cycle_momentum=True).
    Large lr/short cycle so a wrong schedule index or stale buffer decay
    shows up at full size."""
    torch = pytest.importorskip("torch")
    base, mx, up = 0.05, 0.3, 3
    w0 = np.random.RandomState(0).randn(5).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(5).astype(np.float32)
             for i in range(8)]

    tx = make_optimizer(
        "sgd", cyclic_lr(base, mx, up, "triangular"),
        momentum=cyclic_momentum(up, "triangular"), weight_decay=0.01,
    )
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SGD([p], lr=base, momentum=0.9, weight_decay=0.01)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=base, max_lr=mx, step_size_up=up, mode="triangular",
        cycle_momentum=True,
    )
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        opt.step()
        tsched.step()
    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_rmsprop_cyclic_momentum_updates_match_torch():
    """The reference's CyclicLR(cycle_momentum=True) also drives torch
    RMSprop's momentum buffer (RMSprop has 'momentum' in its defaults, so
    the scheduler writes 0.8-0.9 into the param group every step).  Our
    rmsprop with a callable momentum must reproduce buf = m*buf + u,
    p -= lr*buf."""
    torch = pytest.importorskip("torch")
    base, mx, up = 0.005, 0.02, 3
    w0 = np.random.RandomState(0).randn(5).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(5).astype(np.float32)
             for i in range(8)]

    tx = make_optimizer(
        "rmsprop", cyclic_lr(base, mx, up, "triangular"),
        momentum=cyclic_momentum(up, "triangular"), weight_decay=0.01,
    )
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.RMSprop([p], lr=base, alpha=0.99, eps=1e-8,
                              weight_decay=0.01, momentum=0.9)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=base, max_lr=mx, step_size_up=up, mode="triangular",
        cycle_momentum=True,
    )
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        opt.step()
        tsched.step()
    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_cyclic_momentum_phase_with_grad_accumulation():
    """With zero_grad_every > 1 the momentum trace sits inside
    optax.MultiSteps, whose count only advances per emitted update; the
    momentum phase must still track torch's per-iteration scheduler.step()
    (train_and_attack.py:316,564).  Feeding identical grads within each
    accumulation pair makes the mean-accumulation vs torch's
    zero-grad-then-step semantics coincide, so params must match exactly."""
    torch = pytest.importorskip("torch")
    base, mx, up, k = 0.05, 0.3, 3, 2
    w0 = np.random.RandomState(0).randn(5).astype(np.float32)
    emit_grads = [np.random.RandomState(i + 1).randn(5).astype(np.float32)
                  for i in range(4)]

    tx = make_optimizer(
        "sgd", cyclic_lr(base, mx, up, "triangular"),
        momentum=cyclic_momentum(up, "triangular"), weight_decay=0.01,
        every_k=k,
    )
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in emit_grads:
        for _ in range(k):  # same grad k times -> accumulated mean == g
            updates, state = tx.update(jnp.asarray(g), state, params)
            params = params + updates

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SGD([p], lr=base, momentum=0.9, weight_decay=0.01)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=base, max_lr=mx, step_size_up=up, mode="triangular",
        cycle_momentum=True,
    )
    it = 0
    for g in emit_grads:
        for _ in range(k):
            if (it + 1) % k == 0:  # reference train(): zero_grad + step
                opt.zero_grad()
                p.grad = torch.tensor(g.copy())
                opt.step()
            tsched.step()
            it += 1
    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_boundary_decay_schedule():
    sched = learning_rate_with_decay(
        0.1, batch_size=256, batches_per_epoch=10,
        boundary_epochs=[2, 4], decay_rates=[1, 0.1, 0.01],
    )
    assert float(sched(0)) == pytest.approx(0.2)
    assert float(sched(19)) == pytest.approx(0.2)
    assert float(sched(20)) == pytest.approx(0.02)
    assert float(sched(40)) == pytest.approx(0.002)


# ----------------------------------------------------------- optimizers ---


def test_sgd_momentum_matches_torch():
    torch = pytest.importorskip("torch")
    w0 = np.random.RandomState(0).randn(5).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(5).astype(np.float32)
             for i in range(4)]

    tx = make_optimizer("sgd", 0.1, momentum=0.9, weight_decay=0.01)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SGD([p], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        opt.step()
    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(),
                               rtol=1e-5)


def test_rmsprop_matches_torch():
    torch = pytest.importorskip("torch")
    w0 = np.random.RandomState(0).randn(5).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(5).astype(np.float32)
             for i in range(4)]

    tx = make_optimizer("rmsprop", 0.01)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.RMSprop([p], lr=0.01, alpha=0.99, eps=1e-8)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        opt.step()
    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(),
                               rtol=1e-4, atol=1e-7)


# ------------------------------------------------------------ train step --


def run_steps(attack_mode="clean", noise=None, ss=False, n=3):
    model = small_mnist_model()
    tx = make_optimizer("sgd", 0.05, momentum=0.9)
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(
        model, tx, SOLVERS, OPTS,
        attack_cfg=AttackConfig(mode=attack_mode, eps=0.1, pgd_niter=2),
        noise_cfg=noise or NoiseConfig(),
        loss_cfg=LossConfig(ss_loss=ss),
    )
    batches = tiny_batches()
    metrics = None
    for i in range(n):
        x, y = batches[i % len(batches)]
        ts, metrics = step(ts, jnp.asarray(x), jnp.asarray(y),
                           jax.random.key(i))
    return ts, metrics


@pytest.mark.parametrize("mode", ["clean", "fgsm", "fgsm_random", "at"])
def test_train_step_modes(mode):
    ts, metrics = run_steps(attack_mode=mode, n=2)
    assert int(ts.step) == 2
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_train_step_with_smoothing_and_ss_loss():
    ts, metrics = run_steps(
        noise=NoiseConfig(noise_type="normal", sigma=0.0125, prob=1.0),
        ss=True, n=2,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["ss_loss"]) > 0


def test_end_to_end_learning_on_synthetic():
    """The minimum end-to-end slice (SURVEY.md §7): solver -> ODE net ->
    standalone regime -> training actually learns."""
    model = small_mnist_model()
    tx = make_optimizer("rmsprop", 3e-3)
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, SOLVERS, OPTS)

    ds = synthetic_dataset(256, (28, 28, 1), seed=3)
    losses = []
    key = jax.random.key(42)
    for epoch in range(10):
        for x, y in batch_iterator(ds, 32, seed=epoch):
            key, sub = jax.random.split(key)
            ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), sub)
            losses.append(float(m["loss"]))
    # same distribution, held-out draw
    test_ds = synthetic_dataset(128, (28, 28, 1), seed=99)
    acc = accuracy(
        model, ts.params, ts.model_state, SOLVERS, OPTS,
        batch_iterator(test_ds, 32, shuffle=False),
    )
    assert np.mean(losses[-8:]) < np.mean(losses[:8]) * 0.93
    assert acc > 0.3  # 10-class chance is 0.1


def test_eval_harness():
    model = small_mnist_model()
    tx = make_optimizer("sgd", 0.01)
    ts = create_train_state(model, tx, jax.random.key(0))
    ds = synthetic_dataset(64, (28, 28, 1), seed=7)

    acc = accuracy(model, ts.params, ts.model_state, SOLVERS, OPTS,
                   batch_iterator(ds, 16, shuffle=False))
    assert 0.0 <= acc <= 1.0

    adv = adversarial_accuracy(
        model, ts.params, ts.model_state, SOLVERS, OPTS,
        batch_iterator(ds, 16, shuffle=False),
        AttackConfig(mode="fgsm", eps=0.1),
        jax.random.key(0),
    )
    assert 0.0 <= adv <= 1.0

    # ensemble of two (same params, different solver u)
    members = [
        (ts.params, ts.model_state, SOLVERS, OPTS),
        (ts.params, ts.model_state,
         [create_solver("rk2", "u", n_steps=2, u0=1.0)], OPTS),
    ]
    acc_e = accuracy_ensemble(model, members,
                              batch_iterator(ds, 16, shuffle=False))
    assert 0.0 <= acc_e <= 1.0
    adv_e = adversarial_accuracy_ensemble(
        model, members, batch_iterator(ds, 16, shuffle=False),
        AttackConfig(mode="fgsm", eps=0.1), jax.random.key(1),
    )
    assert 0.0 <= adv_e <= 1.0


def test_mesh_sharded_ensemble_eval_matches_loop():
    """accuracy_ensemble / adversarial_accuracy_ensemble with a mesh:
    members vmapped over stacked solver coefficients and sharded over an
    'ensemble' axis must reproduce the sequential loop path (ensemble
    parallelism reaching the eval harness — VERDICT r2 weakness 3)."""
    from neural_ode_metasolver_tpu.ops import solver_ensemble_by_noising
    from neural_ode_metasolver_tpu.parallel import make_mesh

    model = small_mnist_model()
    tx = make_optimizer("sgd", 0.01)
    ts = create_train_state(model, tx, jax.random.key(0))
    ds = synthetic_dataset(48, (28, 28, 1), seed=7)
    noised = solver_ensemble_by_noising(
        create_solver("rk2", "u", n_steps=2, u0=0.5),
        jax.random.key(5), ensemble_size=4, std=0.2, noise_type="normal",
    )
    members = [(ts.params, ts.model_state, [s], OPTS) for s in noised]
    mesh = make_mesh({"ensemble": 4}, jax.devices()[:4])

    a_loop = accuracy_ensemble(model, members,
                               batch_iterator(ds, 16, shuffle=False))
    a_mesh = accuracy_ensemble(model, members,
                               batch_iterator(ds, 16, shuffle=False),
                               mesh=mesh)
    assert a_loop == pytest.approx(a_mesh, abs=1e-6)

    fgsm_cfg = AttackConfig(mode="fgsm", eps=0.1)
    r_loop = adversarial_accuracy_ensemble(
        model, members, batch_iterator(ds, 16, shuffle=False), fgsm_cfg,
        jax.random.key(2))
    r_mesh = adversarial_accuracy_ensemble(
        model, members, batch_iterator(ds, 16, shuffle=False), fgsm_cfg,
        jax.random.key(2), mesh=mesh)
    assert r_loop == pytest.approx(r_mesh, abs=1e-6)

    # remat is value-neutral on BOTH paths (it only reshapes the joint
    # attack's input-gradient graph — the HBM fix for big evals)
    for mesh_arg in (None, mesh):
        r_remat = adversarial_accuracy_ensemble(
            model, members, batch_iterator(ds, 16, shuffle=False),
            fgsm_cfg, jax.random.key(2), mesh=mesh_arg, remat=True)
        assert r_remat == pytest.approx(r_loop, abs=1e-6)

    # heterogeneous members (different step counts) must be rejected
    het = members[:1] + [
        (ts.params, ts.model_state,
         [create_solver("rk2", "u", n_steps=4, u0=0.7)], OPTS)
    ]
    with pytest.raises(ValueError, match="homogeneous"):
        accuracy_ensemble(model, het,
                          batch_iterator(ds, 16, shuffle=False), mesh=mesh)


def test_notebook_regime_grid():
    """The shared Evaluate-notebook grid construction
    (training.notebook_regime_grid) — the ONE source both
    scripts/replicate_baseline.py and scripts/digits_regimes_eval.py
    consume (nb cells 13-28 semantics)."""
    from neural_ode_metasolver_tpu.training import notebook_regime_grid

    base = create_solver("rk2", "u", n_steps=8, u0=0.5)
    grid = notebook_regime_grid(base, jax.random.key(0))
    assert [g.name for g in grid] == [
        "standalone", "switch[0.6,0.4]", "solver_ens[0.6,0.4]",
        "model_ensembling",
    ]
    standalone, switch, ens, mens = grid
    assert standalone.solvers == [base] and not standalone.needs_key
    # the alternate solver is u=1.0 with everything else inherited
    alt = switch.solvers[1]
    assert float(alt.u) == 1.0 and int(alt.n_steps) == 8
    assert switch.options.solver_mode == "switch"
    assert switch.options.switch_probs == [0.6, 0.4] and switch.needs_key
    assert ens.options.solver_mode == "ensemble"
    assert ens.options.ensemble_prob == 1.0
    assert ens.options.ensemble_weights == [0.6, 0.4]
    # model ensembling: original-first noised members (utils.py:112-117)
    assert mens.is_model_ensemble and len(mens.solvers) == 2
    assert float(mens.solvers[0].u) == 0.5
    assert float(mens.solvers[1].u) != 0.5  # sigma=0.2 noise applied


def test_sn_test_step_sweep():
    model = small_mnist_model()
    tx = make_optimizer("sgd", 0.01)
    ts = create_train_state(model, tx, jax.random.key(0))
    ds = synthetic_dataset(32, (28, 28, 1), seed=7)
    accs = sn_test(
        model, ts.params, ts.model_state, SOLVERS[0], OPTS,
        lambda: batch_iterator(ds, 16, shuffle=False),
        nsteps_grid=[1, 2, 4],
    )
    assert len(accs) == 3
    assert all(0.0 <= a <= 1.0 for a in accs)


def test_nfe_accounting():
    s8 = create_solver("rk2", "u", n_steps=8, u0=0.5)
    assert nfe_per_solve(s8) == 16
    # premetanode10: 2 ODE blocks x 8 steps x 2 stages = 32 (BASELINE.md)
    assert nfe_per_forward([s8], SolverOptions(), n_ode_blocks=2) == 32
    s4 = create_solver("rk4", "u2", n_steps=4, u0=1 / 3)
    assert nfe_per_solve(s4) == 16
    assert (
        nfe_per_forward(
            [s8, s4],
            SolverOptions(solver_mode="switch", switch_probs=[0.5, 0.5]),
            n_ode_blocks=1,
        )
        == 16
    )
    assert (
        nfe_per_forward(
            [s8, s4], SolverOptions(solver_mode="ensemble",
                                    ensemble_prob=1.0), 1,
        )
        == 32
    )


def test_running_average_meter():
    m = RunningAverageMeter(momentum=0.9)
    m.update(1.0)
    assert m.avg == 1.0
    m.update(2.0)
    np.testing.assert_allclose(m.avg, 1.0 * 0.9 + 2.0 * 0.1)


def test_checkpoint_roundtrip(tmp_path):
    model = small_mnist_model()
    tx = make_optimizer("sgd", 0.05, momentum=0.9)
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(model, tx, SOLVERS, OPTS)
    x, y = tiny_batches()[0]
    ts, _ = step(ts, jnp.asarray(x), jnp.asarray(y), jax.random.key(1))

    cfg = {"solvers": "rk2,u,2,-1,0.5,-1", "model": "mnist"}
    path = save_checkpoint(str(tmp_path), ts, cfg)
    assert path

    fresh = create_train_state(model, tx, jax.random.key(123))
    restored, cfg2 = restore_checkpoint(str(tmp_path), fresh)
    assert cfg2["model"] == "mnist"
    np.testing.assert_allclose(int(restored.step), 1)
    for a, b in zip(
        jax.tree_util.tree_leaves(ts.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored state continues training
    ts2, m = step(restored, jnp.asarray(x), jnp.asarray(y), jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_data_pipeline():
    ds = synthetic_dataset(100, (32, 32, 3), seed=0)
    tr, va = train_val_split(ds, 0.1, seed=0)
    assert len(tr) == 90 and len(va) == 10
    batches = list(
        batch_iterator(tr, 16, crop_padding=4, hflip=True,
                       mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    )
    assert len(batches) == 5  # drop_last
    x, y = batches[0]
    assert x.shape == (16, 32, 32, 3) and x.dtype == np.float32
    assert float(np.abs(x).max()) <= (1.0 / 0.25) + 1e-6


def test_dynamic_solvers_match_closed_over():
    """dynamic_solvers (traced-solver sweep support) must produce the same
    update as a step compiled with that solver closed over."""
    from neural_ode_metasolver_tpu.ops import create_solver

    model = small_mnist_model()
    tx = make_optimizer("sgd", 0.05, momentum=0.9)
    ts = create_train_state(model, tx, jax.random.key(0))
    s_a = create_solver("rk2", "u", n_steps=2, u0=0.5)
    s_b = create_solver("rk2", "u", n_steps=2, u0=0.9)
    step_a = make_train_step(model, tx, [s_a], OPTS, donate=False)
    step_b = make_train_step(model, tx, [s_b], OPTS, donate=False)

    x, y = tiny_batches(1)[0]
    x, y = jnp.asarray(x), jnp.asarray(y)
    key = jax.random.key(7)

    ts_b_direct, m_direct = step_b(ts, x, y, key)
    # step compiled for s_a, executed with s_b as a dynamic argument
    ts_b_dyn, m_dyn = step_a(ts, x, y, key, dynamic_solvers=[s_b])
    np.testing.assert_allclose(
        float(m_direct["loss"]), float(m_dyn["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ts_b_direct.params),
        jax.tree_util.tree_leaves(ts_b_dyn.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_adversarial_accuracy_pgd_mode():
    model = small_mnist_model()
    tx = make_optimizer("sgd", 0.01)
    ts = create_train_state(model, tx, jax.random.key(0))
    ds = synthetic_dataset(32, (28, 28, 1), seed=7)
    adv = adversarial_accuracy(
        model, ts.params, ts.model_state, SOLVERS, OPTS,
        batch_iterator(ds, 16, shuffle=False),
        AttackConfig(mode="at", eps=0.1, pgd_lr=0.03, pgd_niter=3),
        jax.random.key(0),
    )
    assert 0.0 <= adv <= 1.0
