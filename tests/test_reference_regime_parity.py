"""Regime dispatch (standalone/switch/ensemble) cross-validated against the
reference's OWN MetaODEBlock.

Completes the reference-code cross-validation set (solvers:
test_reference_solver_parity.py, attacks: test_reference_attack_parity.py,
noise: test_reference_noise_parity.py) with the dispatch logic of
sopa/src/models/odenet_mnist/layers.py:16-50:

  * standalone → solvers[0]                      (:19-20)
  * switch → np.random.choice(switch_probs), records switch_solver_id (:22-30)
  * ensemble → bernoulli coin; heads = weighted sum over members,
    tails = solvers[0]; records ensemble_coin_flip (:32-48)
  * default uniform probs/weights when None      (:24-26, :37-40)

The reference block's conv RHS is swapped for a shared tiny analytic RHS
(dispatch is RHS-agnostic: forward just forwards rhs_func to integrate), the
reference's host RNG (np.random.choice / torch.bernoulli) is pinned by
monkeypatch, and ours by meta_integrate's aux_in replay — then outputs must
match element-wise.  One statistical test runs the real RNG on both sides and
compares empirical switch frequencies.
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


def _ref_mods():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from sopa.src.models.odenet_mnist import layers as ref_layers
    from sopa.src.solvers.utils import create_solver as ref_create

    return ref_layers, ref_create


class _ToyRHS(torch.nn.Module):
    """nn.Module wrapper (MetaODEBlock registers rhs_func as a submodule,
    so plain callables can't be assigned over it)."""

    def forward(self, t, y):
        return torch.cos(t) * y - 0.05 * y ** 3


def _j_rhs(t, y):
    return jnp.cos(t) * y - 0.05 * y ** 3


X = (np.linspace(-1.1, 1.3, 2 * 3 * 4 * 4)
     .reshape(2, 3, 4, 4).astype(np.float32))
U_LIST = [0.5, 1.0, 2.0 / 3.0]
N_STEPS = 4


@pytest.fixture
def ref_block():
    ref_layers, ref_create = _ref_mods()
    block = ref_layers.MetaODEBlock()
    block.rhs_func = _ToyRHS()  # dispatch is RHS-agnostic (layers.py:20,30,44)
    solvers = []
    for u in U_LIST:
        s = ref_create("rk2", "u", N_STEPS, -1, np.float32(u),
                       np.float32(-1), torch.float32, "cpu")
        s.freeze_params()
        solvers.append(s)
    return block, solvers


OUR_SOLVERS = [create_solver("rk2", "u", n_steps=N_STEPS, u0=u)
               for u in U_LIST]


def _ref_forward(block, solvers, opts):
    with torch.no_grad():
        y = block.forward(torch.tensor(X), solvers, opts)
    return np.asarray(y)


def test_standalone_parity(ref_block):
    block, solvers = ref_block
    opts = Namespace(solver_mode="standalone")
    y_ref = _ref_forward(block, solvers, opts)
    y_ours, aux = meta_integrate(
        OUR_SOLVERS, _j_rhs, jnp.asarray(X),
        SolverOptions(solver_mode="standalone"),
    )
    np.testing.assert_allclose(y_ref, np.asarray(y_ours), atol=2e-6)
    assert aux == {}


@pytest.mark.parametrize("solver_id", [0, 1, 2])
def test_switch_pinned_choice_parity(ref_block, monkeypatch, solver_id):
    """Pin np.random.choice on the reference side (layers.py:27) and replay
    the same id through aux_in on ours: outputs and the recorded
    switch_solver_id must agree."""
    block, solvers = ref_block
    probs = [0.5, 0.3, 0.2]

    seen = {}

    def pinned_choice(a, p=None):
        seen["range"] = list(a)
        seen["p"] = list(p)
        return solver_id

    monkeypatch.setattr(np.random, "choice", pinned_choice)
    opts = Namespace(solver_mode="switch", switch_probs=probs)
    y_ref = _ref_forward(block, solvers, opts)
    assert opts.switch_solver_id == solver_id  # mutated Namespace (:28)
    assert seen["p"] == probs

    y_ours, aux = meta_integrate(
        OUR_SOLVERS, _j_rhs, jnp.asarray(X),
        SolverOptions(solver_mode="switch", switch_probs=probs),
        aux_in={"switch_solver_id": solver_id},
    )
    np.testing.assert_allclose(y_ref, np.asarray(y_ours), atol=2e-6)
    assert int(aux["switch_solver_id"]) == solver_id


def test_switch_default_uniform_probs_parity(ref_block, monkeypatch):
    """switch_probs=None → uniform 1/n in both frameworks
    (layers.py:24-26 / ops/regimes.py:124-125)."""
    block, solvers = ref_block
    seen = {}

    def pinned_choice(a, p=None):
        seen["p"] = list(p)
        return 1

    monkeypatch.setattr(np.random, "choice", pinned_choice)
    opts = Namespace(solver_mode="switch", switch_probs=None)
    y_ref = _ref_forward(block, solvers, opts)
    np.testing.assert_allclose(seen["p"], [1 / 3] * 3, atol=1e-12)

    y_ours, _ = meta_integrate(
        OUR_SOLVERS, _j_rhs, jnp.asarray(X),
        SolverOptions(solver_mode="switch", switch_probs=None),
        aux_in={"switch_solver_id": 1},
    )
    np.testing.assert_allclose(y_ref, np.asarray(y_ours), atol=2e-6)


def test_switch_empirical_frequencies_parity(ref_block):
    """Real RNG on both sides: empirical choice frequencies match
    switch_probs within sampling error."""
    block, solvers = ref_block
    probs = [0.6, 0.3, 0.1]
    n_draws = 400

    np.random.seed(0)
    ref_ids = []
    x_tiny = torch.zeros(1, 1, 1, 1)
    for _ in range(n_draws):
        opts = Namespace(solver_mode="switch", switch_probs=probs)
        with torch.no_grad():
            block.forward(x_tiny, solvers, opts)
        ref_ids.append(opts.switch_solver_id)
    ref_freq = np.bincount(ref_ids, minlength=3) / n_draws

    opts_ours = SolverOptions(solver_mode="switch", switch_probs=probs)

    def draw(key):
        _, aux = meta_integrate(
            OUR_SOLVERS, _j_rhs, jnp.zeros((1, 1, 1, 1)), opts_ours, key=key)
        return aux["switch_solver_id"]

    ids = jax.vmap(draw)(jax.random.split(jax.random.PRNGKey(0), n_draws))
    our_freq = np.bincount(np.asarray(ids), minlength=3) / n_draws

    np.testing.assert_allclose(ref_freq, probs, atol=0.08)
    np.testing.assert_allclose(our_freq, probs, atol=0.08)


@pytest.mark.parametrize("coin", [0, 1])
def test_ensemble_coin_parity(ref_block, monkeypatch, coin):
    """Pin the bernoulli coin (layers.py:33): heads = weighted sum over all
    members (:42-46), tails = solvers[0] alone (:48); ours replays the same
    coin through aux_in."""
    block, solvers = ref_block
    weights = [0.5, 0.3, 0.2]

    monkeypatch.setattr(
        torch, "bernoulli", lambda *a, **k: torch.tensor([float(coin)]))
    opts = Namespace(solver_mode="ensemble", ensemble_prob=0.7,
                     ensemble_weights=weights)
    y_ref = _ref_forward(block, solvers, opts)
    assert int(opts.ensemble_coin_flip) == coin  # mutated Namespace (:34)

    y_ours, aux = meta_integrate(
        OUR_SOLVERS, _j_rhs, jnp.asarray(X),
        SolverOptions(solver_mode="ensemble", ensemble_prob=0.7,
                      ensemble_weights=weights),
        aux_in={"ensemble_coin_flip": jnp.asarray(bool(coin))},
    )
    np.testing.assert_allclose(y_ref, np.asarray(y_ours), atol=2e-6)
    assert bool(aux["ensemble_coin_flip"]) == bool(coin)


def test_ensemble_default_uniform_weights_parity(ref_block, monkeypatch):
    """ensemble_weights=None → uniform 1/n weighted sum in both frameworks
    (layers.py:37-40 / ops/regimes.py:144-145)."""
    block, solvers = ref_block
    monkeypatch.setattr(
        torch, "bernoulli", lambda *a, **k: torch.tensor([1.0]))
    opts = Namespace(solver_mode="ensemble", ensemble_prob=1.0,
                     ensemble_weights=None)
    y_ref = _ref_forward(block, solvers, opts)

    y_ours, _ = meta_integrate(
        OUR_SOLVERS, _j_rhs, jnp.asarray(X),
        SolverOptions(solver_mode="ensemble", ensemble_prob=1.0,
                      ensemble_weights=None),
        aux_in={"ensemble_coin_flip": jnp.asarray(True)},
    )
    np.testing.assert_allclose(y_ref, np.asarray(y_ours), atol=2e-6)
