"""Train-STEP-level torch parity: same weights, same batches, fixed solver
— N optimizer steps in both frameworks must produce the same parameters.

Forward parity (test_torch_parity.py) can't catch optimizer-semantics or
gradient-through-scan drift; this does.  Reference loop:
odenet_mnist/train_validate.py:19-115 with RMSprop(+coupled weight decay,
runner.py:141) and the CIFAR recipe's SGD(momentum, weight decay).

Tolerances: SGD is numerically stable — after 5 steps params agree to
~1e-6 abs.  RMSprop divides by sqrt(nu)≈0.1|g| early on, so the update is
~10*sign(g)*lr: a near-zero gradient whose sign flips between frameworks
takes an opposite 1e-2 step — chaos amplification, not a semantics bug.
A real semantics difference (eps inside the sqrt, decoupled weight decay,
bias correction) shifts EVERY update systematically and is caught by the
per-step loss trace and the mean-abs-param bound.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from neural_ode_metasolver_tpu.models.api import build_model  # noqa: E402
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver  # noqa: E402
from neural_ode_metasolver_tpu.training import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_train_step,
)
from torch_ref import TorchMetaNODE, copy_params_to_torch  # noqa: E402

N_STEPS = 5


def _run_both(opt_name, jax_kwargs, torch_opt_factory):
    model = build_model("mnist")
    solvers = [create_solver("rk2", "u", n_steps=8, u0=0.5)]
    tx = make_optimizer(opt_name, 1e-3, **jax_kwargs)
    ts = create_train_state(model, tx, jax.random.key(0))

    tm = TorchMetaNODE()
    copy_params_to_torch(tm, ts.params)
    topt = torch_opt_factory(tm.parameters())
    crit = torch.nn.CrossEntropyLoss()

    step = make_train_step(
        model, tx, solvers, SolverOptions(), jit_compile=True, donate=False
    )
    rs = np.random.RandomState(42)
    loss_pairs = []
    for i in range(N_STEPS):
        x = rs.rand(8, 28, 28, 1).astype(np.float32)
        y = rs.randint(0, 10, size=8)
        ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), jax.random.key(i))
        topt.zero_grad()
        loss = crit(
            tm(torch.tensor(x.transpose(0, 3, 1, 2)), u=0.5, n_steps=8),
            torch.tensor(y),
        )
        loss.backward()
        topt.step()
        loss_pairs.append((float(m["loss"]), float(loss)))

    # project final JAX params into torch layout for leaf-wise comparison
    tm_jax = TorchMetaNODE()
    copy_params_to_torch(tm_jax, ts.params)
    diffs = {
        name: np.abs(
            p_t.detach().numpy() - p_j.detach().numpy()
        )
        for (name, p_t), (_, p_j) in zip(
            tm.named_parameters(), tm_jax.named_parameters()
        )
    }
    return loss_pairs, diffs


def test_sgd_momentum_wd_step_parity():
    loss_pairs, diffs = _run_both(
        "sgd",
        dict(momentum=0.9, weight_decay=5e-4),
        lambda ps: torch.optim.SGD(ps, lr=1e-3, momentum=0.9,
                                   weight_decay=5e-4),
    )
    for i, (lj, lt) in enumerate(loss_pairs):
        assert abs(lj - lt) < 1e-4, f"step {i}: {lj} vs {lt}"
    for name, d in diffs.items():
        assert d.max() < 1e-5, f"{name}: max abs diff {d.max()}"


REFERENCE_ROOT = "/root/reference"


def _run_flagship_parity(monkeypatch, smoothing: bool):
    """North-star gradient path, end to end, against the ACTUAL reference
    code: N steps of the reference ``train()`` recipe
    (examples/cifar10/train_and_attack.py:246-323) — premetanode10
    (NF/PNF/GeLU), FGSM-random attack INSIDE the step (grad-of-input,
    fgsm.py:88-106), SGD(momentum 0.9, wd 5e-4) under CyclicLR
    (base 1e-7, max 0.1, step_size_up 3186, triangular2,
    cycle_momentum=True) — vs our jitted ``make_train_step``.

    The attack's randomness is pinned by injecting one fixed uniform draw
    into both frameworks (torch.rand_like / jax.random.uniform), so every
    per-step loss and the final parameters must agree.

    With ``smoothing=True`` the recipe's last ingredient is enabled too:
    solver smoothing (train_and_attack.py:266-273 noise + :319-323
    denoise), with both frameworks' noise draws pinned to the same
    u'=0.55 — the gradient then flows through the perturbed tableau
    every step while the base solver must come back to u0 afterwards.
    """
    import contextlib
    import importlib.util
    import sys
    import types
    from argparse import Namespace
    from decimal import Decimal

    # --- stub apex.amp + wandb so the reference module imports on CPU ---
    fake_amp = types.ModuleType("apex.amp")

    @contextlib.contextmanager
    def scale_loss(loss, optimizer):
        yield loss

    fake_amp.scale_loss = scale_loss
    fake_apex = types.ModuleType("apex")
    fake_apex.amp = fake_amp
    monkeypatch.setitem(sys.modules, "apex", fake_apex)
    monkeypatch.setitem(sys.modules, "apex.amp", fake_amp)
    if "wandb" not in sys.modules:
        monkeypatch.setitem(sys.modules, "wandb", types.ModuleType("wandb"))
    if "torchvision" not in sys.modules:
        # only used inside the reference's data-loader functions, which
        # this test bypasses (synthetic batches fed via data_gen)
        tv = types.ModuleType("torchvision")
        tv.datasets = types.ModuleType("torchvision.datasets")
        tv.transforms = types.ModuleType("torchvision.transforms")
        monkeypatch.setitem(sys.modules, "torchvision", tv)
        monkeypatch.setitem(sys.modules, "torchvision.datasets", tv.datasets)
        monkeypatch.setitem(
            sys.modules, "torchvision.transforms", tv.transforms
        )
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    monkeypatch.setattr(sys, "argv", ["train_and_attack.py"])

    spec = importlib.util.spec_from_file_location(
        "ref_train_and_attack",
        f"{REFERENCE_ROOT}/examples/cifar10/train_and_attack.py",
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from sopa.src.models.odenet_cifar10.layers import (
        premetanode10 as ref_premetanode10,
    )
    from sopa.src.models.odenet_cifar10.utils import (
        get_activation,
        get_normalization,
        get_param_normalization,
    )
    from sopa.src.solvers.utils import create_solver as ref_create_solver

    from neural_ode_metasolver_tpu.models import (
        cifar_params_from_torch_state_dict,
        premetanode10,
    )
    from neural_ode_metasolver_tpu.models.api import make_cifar_model
    from neural_ode_metasolver_tpu.training import (
        AttackConfig,
        TrainState,
        cyclic_lr,
        cyclic_momentum,
    )

    MEAN = (0.4914, 0.4822, 0.4465)
    STD = (0.2023, 0.1994, 0.2010)
    P, B, N = 16, 4, 5
    BASE_LR, MAX_LR, SSU = 1e-7, 0.1, 3186

    torch.manual_seed(11)
    tm = ref_premetanode10(
        norm_layers=(get_normalization("NF"),) * 3,
        param_norm_layers=(get_param_normalization("PNF"),) * 3,
        act_layers=(get_activation("GeLU"),) * 3,
        in_planes=P,
    )
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = cifar_params_from_torch_state_dict(sd)

    rsolver = ref_create_solver(
        "rk2", "u", n_steps=8, step_size=-1,
        u0=Decimal("0.5"), v0=Decimal("-1"),
        dtype=torch.float32, device="cpu",
    )
    rsolver.freeze_params()
    ref.CONFIG_FGSMRandom_TRAIN = {
        "epsilon": 8 / 255, "alpha": 10 / 255, "mu": MEAN, "std": STD,
    }
    topt = torch.optim.SGD(tm.parameters(), lr=BASE_LR, momentum=0.9,
                           weight_decay=5e-4)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        topt, base_lr=BASE_LR, max_lr=MAX_LR, step_size_up=SSU,
        mode="triangular2", cycle_momentum=True,
    )
    U_PIN = 0.55
    if smoothing:
        # pin the reference's noise draw (train() noises via the
        # module-global noise_params, train_and_attack.py:266-273)
        monkeypatch.setattr(
            ref, "noise_params",
            lambda u0, v0, **kw: (torch.tensor(U_PIN), None),
        )
    cfg_ns = Namespace(
        zero_grad_every=1,
        noise_type="normal" if smoothing else None,
        noise_sigma=0.0125, noise_prob=1.0,
        adv_training_mode="fgsm_random", data_noise_std=0.0,
        ss_loss=False, grad_clipping_threshold=None,
    )
    opt_ns = Namespace(solver_mode="standalone", switch_probs=None,
                       ensemble_prob=None, ensemble_weights=None)

    rs = np.random.RandomState(5)
    batches = [
        (rs.rand(B, 32, 32, 3).astype(np.float32),
         rs.randint(0, 10, size=B))
        for _ in range(N)
    ]
    U = rs.rand(B, 32, 32, 3).astype(np.float32)  # the pinned attack draw

    def norm(x01):
        return (x01 - np.asarray(MEAN, np.float32)) / np.asarray(
            STD, np.float32
        )

    monkeypatch.setattr(
        torch, "rand_like",
        lambda x, **kw: torch.tensor(U.transpose(0, 3, 1, 2)),
    )
    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), dtype=float, minval=0.0, maxval=1.0:
            jnp.asarray(U),
    )

    def data_gen():
        for x01, y in batches:
            yield (torch.tensor(norm(x01).transpose(0, 3, 1, 2)),
                   torch.tensor(y))

    gen = data_gen()
    crit = torch.nn.CrossEntropyLoss()

    model = make_cifar_model(premetanode10(in_planes=P))
    tx = make_optimizer(
        "sgd", cyclic_lr(BASE_LR, MAX_LR, SSU, "triangular2"),
        momentum=cyclic_momentum(SSU, "triangular2"), weight_decay=5e-4,
    )
    _, state = model.init(jax.random.key(0))
    ts = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                    model_state=state, opt_state=tx.init(params))
    solvers = [create_solver("rk2", "u", n_steps=8, u0=0.5)]
    noise_cfg = None
    if smoothing:
        # pin OUR noise draw to the same u' (the patched sampler ignores
        # the key; _noise_solvers is looked up from module globals at
        # trace time, so patching before make_train_step is enough)
        from neural_ode_metasolver_tpu.training import train as train_mod

        monkeypatch.setattr(
            train_mod, "_noise_solvers",
            lambda base, key, cfg: [
                s.replace(u=jnp.asarray(U_PIN, jnp.float32)) for s in base
            ],
        )
        from neural_ode_metasolver_tpu.training import NoiseConfig

        noise_cfg = NoiseConfig(noise_type="normal", sigma=0.0125,
                                prob=1.0)
    step = make_train_step(
        model, tx, solvers, SolverOptions(),
        attack_cfg=AttackConfig(mode="fgsm_random", eps=8 / 255,
                                alpha=10 / 255, mean=MEAN, std=STD),
        **({"noise_cfg": noise_cfg} if noise_cfg is not None else {}),
        jit_compile=True, donate=False,
    )

    def param_dev(jax_params):
        sd_now = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        torch_now = cifar_params_from_torch_state_dict(sd_now)
        flat = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).ravel(),
                jax_params, torch_now,
            )
        )
        cat = np.concatenate(flat)
        return cat.max(), cat.mean()

    losses = []
    for i, (x01, y) in enumerate(batches):
        ts, m = step(ts, jnp.asarray(norm(x01)), jnp.asarray(y),
                     jax.random.key(i))
        tl = ref.train(
            tm, gen, solvers=[rsolver], solver_options=opt_ns,
            criterion=crit, optimizer=topt, device=torch.device("cpu"),
            is_odenet=True, iter=i, args=cfg_ns,
        )
        tsched.step()
        losses.append((float(m["xentropy"]), tl["xentropy"]))
        if i == 0:
            # after ONE full recipe application (attack input-grad, CE
            # param-grad through two 8-step solves, wd+momentum+lr(0))
            # both frameworks must agree to fp32 roundoff — this is the
            # rigorous semantics check (measured: 1.5e-8)
            d0_max, _ = param_dev(ts.params)
            assert d0_max < 1e-6, f"first-step param diff {d0_max}"

    for i, (lj, lt) in enumerate(losses):
        assert abs(lj - lt) < 5e-4, f"step {i}: {lj} vs {lt}"

    # Later steps amplify fp roundoff through sign(): a pixel whose input
    # gradient is ~1e-8 flips sign between frameworks and moves by
    # 2*alpha — chaos, not semantics (cf. the RMSprop note above).  A real
    # semantics bug (wrong momentum/wd/schedule) shifts every leaf
    # systematically and is caught by the step-0 and mean bounds.
    d_max, d_mean = param_dev(ts.params)
    assert d_max < 1e-3, f"max abs param diff after {N} steps: {d_max}"
    assert d_mean < 2e-6, f"mean abs param diff after {N} steps: {d_mean}"

    if smoothing:
        # denoise parity: the reference restores u0 after every step
        # (train_and_attack.py:319-323); our base solvers are immutable
        assert float(rsolver.u) == pytest.approx(0.5)
        assert float(solvers[0].u) == pytest.approx(0.5)


@pytest.mark.skipif(
    not __import__("os").path.isdir(REFERENCE_ROOT),
    reason="reference not available",
)
def test_flagship_adversarial_cifar_step_parity(monkeypatch):
    _run_flagship_parity(monkeypatch, smoothing=False)


@pytest.mark.skipif(
    not __import__("os").path.isdir(REFERENCE_ROOT),
    reason="reference not available",
)
def test_flagship_adversarial_smoothing_step_parity(monkeypatch):
    """The FULL flagship recipe including solver smoothing, noise pinned
    to the same u' in both frameworks (README.md:52-66: fgsm_random +
    smoothing sigma=0.0125 is the north-star training configuration)."""
    _run_flagship_parity(monkeypatch, smoothing=True)


def test_adam_wd_step_parity():
    """torch Adam semantics (train_and_attack.py:493-495 offers
    ``--optimizer adam``): bias-corrected moments, eps OUTSIDE the sqrt,
    coupled weight decay folded into the gradient BEFORE the moment
    accumulators (torch.optim.Adam).  Bias correction makes the first
    update ~lr*sign(g), so the same sign-flip chaos caveat as RMSprop
    applies to later steps."""
    loss_pairs, diffs = _run_both(
        "adam",
        dict(weight_decay=1e-4),
        lambda ps: torch.optim.Adam(ps, lr=1e-3, betas=(0.9, 0.999),
                                    eps=1e-8, weight_decay=1e-4),
    )
    # step 0: identical params -> identical losses; step 1 exposes any
    # systematic semantics difference (decoupled wd, missing bias
    # correction, eps inside the sqrt) at full size
    assert abs(loss_pairs[0][0] - loss_pairs[0][1]) < 1e-5
    assert abs(loss_pairs[1][0] - loss_pairs[1][1]) < 5e-4
    for lj, lt in loss_pairs:
        assert abs(lj - lt) < 5e-2
    all_d = np.concatenate([d.ravel() for d in diffs.values()])
    assert all_d.max() < N_STEPS * 2e-2
    assert all_d.mean() < 2e-4, f"mean abs param diff {all_d.mean()}"


def test_rmsprop_wd_step_parity():
    """torch RMSprop semantics: alpha=0.99, eps OUTSIDE the sqrt, coupled
    weight decay, no bias correction (runner.py:141 defaults)."""
    loss_pairs, diffs = _run_both(
        "rmsprop",
        dict(weight_decay=1e-4),
        lambda ps: torch.optim.RMSprop(ps, lr=1e-3, alpha=0.99, eps=1e-8,
                                       weight_decay=1e-4),
    )
    # step 0 runs on identical params -> identical losses; step 1 sees the
    # first update -> any systematic optimizer-semantics difference shows
    # up here at full size (a wrong eps placement shifts it by ~1e-1)
    assert abs(loss_pairs[0][0] - loss_pairs[0][1]) < 1e-5
    assert abs(loss_pairs[1][0] - loss_pairs[1][1]) < 5e-4
    for lj, lt in loss_pairs:
        assert abs(lj - lt) < 5e-2
    all_d = np.concatenate([d.ravel() for d in diffs.values()])
    # isolated sign-flip chaos stays below 2*n*lr*10; systematic drift from
    # wrong semantics would push the MEAN far above 1e-4
    assert all_d.max() < N_STEPS * 2e-2
    assert all_d.mean() < 2e-4, f"mean abs param diff {all_d.mean()}"
