"""ss-loss (state-stability regularizer) cross-validated against the
reference's OWN MetaODEBlock.ss_loss.

sopa/src/models/odenet_mnist/layers.py:53-93: re-integrate the block output
over t in [1, 2] under the SAME regime choice as the forward (read from the
mutated solver_options Namespace), then mean per-sample L2 of z(2) - z(1).
Two quirks live here and must be matched deliberately:

  * quirk 4 — ``partial(self.rhs_func, ss_loss=True).func`` drops the
    kwarg, so the |RHS| variant is dead in the reference; our default
    ``ss_loss_abs=False`` matches that *executed* behavior and
    ``ss_loss_abs=True`` enables the intended-but-dead branch.
  * quirk 5 — in switch mode ``solver_id`` is only assigned in the
    ``switch_probs is None`` branch (layers.py:63-68), so ss_loss with
    explicit switch_probs raises NameError in the reference; our replay
    path works for both (fix recorded in PARITY.md).

Our side computes the same quantity through the public seam the models
use: ``meta_integrate(..., t0=1, t1=2, aux_in=forward_aux)`` + the norm
formula (models/odenet_mnist.py:228-242).
"""
import os
import sys
from argparse import Namespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not available"
)

from neural_ode_metasolver_tpu.ops import (  # noqa: E402
    SolverOptions,
    create_solver,
    meta_integrate,
)


class _ToyRHS(torch.nn.Module):
    """RHS whose ss_loss=True branch WOULD differ (|cos| vs cos) — makes
    quirk 4 (the kwarg being dropped) observable in the outputs."""

    def forward(self, t, y, ss_loss=False):
        c = torch.abs(torch.cos(t)) if ss_loss else torch.cos(t)
        return c * y - 0.05 * y ** 3


def _j_rhs(t, y, ss_abs=False):
    c = jnp.abs(jnp.cos(t)) if ss_abs else jnp.cos(t)
    return c * y - 0.05 * y ** 3


X = (np.linspace(-1.0, 1.2, 2 * 3 * 4 * 4)
     .reshape(2, 3, 4, 4).astype(np.float32))
U_LIST = [0.5, 1.0]
N_STEPS = 4


def _setup():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from sopa.src.models.odenet_mnist import layers as ref_layers
    from sopa.src.solvers.utils import create_solver as ref_create

    block = ref_layers.MetaODEBlock()
    block.rhs_func = _ToyRHS()
    ref_solvers = []
    for u in U_LIST:
        s = ref_create("rk2", "u", N_STEPS, -1, np.float32(u),
                       np.float32(-1), torch.float32, "cpu")
        s.freeze_params()
        ref_solvers.append(s)
    ours = [create_solver("rk2", "u", n_steps=N_STEPS, u0=u)
            for u in U_LIST]
    return block, ref_solvers, ours


def _our_ss(solvers, y, options, aux_in, ss_abs=False):
    """The models' ss-loss computation at the ops seam
    (models/odenet_mnist.py:228-242)."""
    z, _ = meta_integrate(
        solvers, lambda t, y_: _j_rhs(t, y_, ss_abs), jnp.asarray(y),
        options, None, t0=1.0, t1=2.0, aux_in=aux_in,
    )
    diff = (z - jnp.asarray(y)).reshape(y.shape[0], -1)
    return float(jnp.mean(jnp.linalg.norm(diff, axis=1)))


def test_standalone_ss_loss_parity():
    block, ref_solvers, ours = _setup()
    opts = Namespace(solver_mode="standalone")
    with torch.no_grad():
        ss_ref = float(block.ss_loss(torch.tensor(X), ref_solvers, opts))
    ss_ours = _our_ss(ours, X, SolverOptions(solver_mode="standalone"),
                      aux_in=None)
    np.testing.assert_allclose(ss_ref, ss_ours, rtol=1e-5)


def test_quirk4_abs_branch_is_dead_in_reference():
    """The reference's ss integration must equal the plain-RHS integration
    (partial(...).func drops ss_loss=True); our ss_loss_abs=True is the
    resurrected branch and must differ."""
    block, ref_solvers, ours = _setup()
    opts = Namespace(solver_mode="standalone")
    with torch.no_grad():
        ss_ref = float(block.ss_loss(torch.tensor(X), ref_solvers, opts))
    ss_plain = _our_ss(ours, X, SolverOptions(), aux_in=None, ss_abs=False)
    ss_abs = _our_ss(ours, X, SolverOptions(), aux_in=None, ss_abs=True)
    np.testing.assert_allclose(ss_ref, ss_plain, rtol=1e-5)
    assert abs(ss_ref - ss_abs) > 1e-3  # the dead branch WOULD change it


@pytest.mark.parametrize("coin", [0, 1])
def test_ensemble_ss_loss_replays_coin(coin):
    """ss_loss reads ensemble_coin_flip from the mutated Namespace
    (layers.py:73): heads = weighted sum over members, tails =
    solvers[0]; ours replays the identical coin via aux_in."""
    block, ref_solvers, ours = _setup()
    weights = [0.6, 0.4]
    opts = Namespace(solver_mode="ensemble", ensemble_weights=weights,
                     ensemble_coin_flip=torch.tensor([float(coin)]))
    with torch.no_grad():
        ss_ref = float(block.ss_loss(torch.tensor(X), ref_solvers, opts))
    ss_ours = _our_ss(
        ours, X,
        SolverOptions(solver_mode="ensemble", ensemble_weights=weights),
        aux_in={"ensemble_coin_flip": jnp.asarray(bool(coin))},
    )
    np.testing.assert_allclose(ss_ref, ss_ours, rtol=1e-5)


def test_switch_ss_loss_probs_none_replays_id():
    """switch_probs=None branch: the reference reads switch_solver_id from
    the Namespace (layers.py:66-68) — parity with our aux replay."""
    block, ref_solvers, ours = _setup()
    opts = Namespace(solver_mode="switch", switch_probs=None,
                     switch_solver_id=1)
    with torch.no_grad():
        ss_ref = float(block.ss_loss(torch.tensor(X), ref_solvers, opts))
    ss_ours = _our_ss(
        ours, X, SolverOptions(solver_mode="switch"),
        aux_in={"switch_solver_id": 1},
    )
    np.testing.assert_allclose(ss_ref, ss_ours, rtol=1e-5)


def test_quirk6_cifar_ss_loss_raises_in_reference():
    """quirk 6, observed live: the reference's CIFAR ``MetaODEBlock.ss_loss``
    (odenet_cifar10/layers.py:209-211) uses ``partial`` but the module never
    imports it (layers.py:1-8) → NameError on any call. Resurrecting the
    dead code by injecting ``partial`` into the module namespace reveals the
    intended computation — identical to the MNIST formula, with the same
    quirk-4 kwarg drop — and THAT must match our working CIFAR ss-loss path
    (models/odenet_cifar10.py:371-382, same meta_integrate seam)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from functools import partial
    from sopa.src.models.odenet_cifar10 import layers as ref_cifar_layers

    _, ref_solvers, ours = _setup()
    block = ref_cifar_layers.MetaODEBlock(odefunc=_ToyRHS())
    opts = Namespace(solver_mode="standalone")

    # 1) the shipped code path is dead: NameError, not a result
    with torch.no_grad():
        with pytest.raises(NameError):
            block.ss_loss(torch.tensor(X), ref_solvers, opts)

    # 2) with partial injected, the intended value matches our CIFAR path
    assert "partial" not in vars(ref_cifar_layers)
    vars(ref_cifar_layers)["partial"] = partial
    try:
        with torch.no_grad():
            ss_ref = float(block.ss_loss(torch.tensor(X), ref_solvers, opts))
    finally:
        del vars(ref_cifar_layers)["partial"]
    ss_ours = _our_ss(ours, X, SolverOptions(solver_mode="standalone"),
                      aux_in=None)
    np.testing.assert_allclose(ss_ref, ss_ours, rtol=1e-5)


def test_quirk5_switch_with_probs_raises_in_reference():
    """With explicit switch_probs the reference never assigns solver_id
    (indentation bug, layers.py:63-70) → NameError; our path works and
    must equal the probs-None replay of the same id (the fix recorded in
    PARITY.md)."""
    block, ref_solvers, ours = _setup()
    opts = Namespace(solver_mode="switch", switch_probs=[0.6, 0.4],
                     switch_solver_id=1)
    with torch.no_grad():
        with pytest.raises(NameError):
            block.ss_loss(torch.tensor(X), ref_solvers, opts)
    ss_ours = _our_ss(
        ours, X,
        SolverOptions(solver_mode="switch", switch_probs=[0.6, 0.4]),
        aux_in={"switch_solver_id": 1},
    )
    opts_none = Namespace(solver_mode="switch", switch_probs=None,
                          switch_solver_id=1)
    with torch.no_grad():
        ss_ref = float(block.ss_loss(torch.tensor(X), ref_solvers,
                                     opts_none))
    np.testing.assert_allclose(ss_ref, ss_ours, rtol=1e-5)
