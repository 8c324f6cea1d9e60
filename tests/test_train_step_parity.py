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
