"""Eval metrics cross-validated against the reference's OWN
``odenet_mnist/metrics.py``: ``accuracy`` (:9-24, normalized by
``len(dataset)``) and the ``sn_test`` step-count sweep (:27-41, which
re-grids a frozen solver via a ``grid_constructor`` lambda).

Completes the reference-code cross-validation set (solvers, attacks,
noise, regimes, schedules, ss-loss) with the eval harness itself: the
reference MNIST ``MetaNODE`` with random weights is exported via
state_dict into our params (``mnist_params_from_torch_state_dict``),
then both frameworks sweep the SAME synthetic batches over the SAME
``nsteps_grid`` — every accuracy must match exactly (identical
predictions; f32 logit noise ~1e-6 vs O(1e-1) class margins).
"""
import os
import sys
from argparse import Namespace

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not available"
)

from neural_ode_metasolver_tpu.models.api import build_model  # noqa: E402
from neural_ode_metasolver_tpu.models import (  # noqa: E402
    mnist_params_from_torch_state_dict,
)
from neural_ode_metasolver_tpu.ops import (  # noqa: E402
    SolverOptions,
    create_solver,
)
from neural_ode_metasolver_tpu.training import sn_test  # noqa: E402
from neural_ode_metasolver_tpu.training.evaluate import accuracy  # noqa: E402


def _ref_mods():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from sopa.src.models.odenet_mnist import layers as ref_layers
    from sopa.src.models.odenet_mnist import metrics as ref_metrics
    from sopa.src.solvers.utils import create_solver as ref_create

    return ref_layers, ref_metrics, ref_create


NSTEPS_GRID = [1, 2, 4, 8]


def test_sn_test_matches_reference_metrics():
    ref_layers, ref_metrics, ref_create = _ref_mods()

    torch.manual_seed(3)
    tm = ref_layers.MetaNODE(downsampling_method="conv", is_odenet=True)
    tm.eval()

    n, b = 24, 8
    rs = np.random.RandomState(17)
    x = rs.rand(n, 28, 28, 1).astype(np.float32)
    y = rs.randint(0, 10, size=n)

    loader = torch.utils.data.DataLoader(
        torch.utils.data.TensorDataset(
            torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(y)
        ),
        batch_size=b,
        shuffle=False,
    )
    from decimal import Decimal

    rsolver = ref_create(
        "rk2", "u", n_steps=8, step_size=-1,
        u0=Decimal("0.5"), v0=Decimal("-1"),
        dtype=torch.float32, device="cpu",
    )
    opts = Namespace(solver_mode="standalone", switch_probs=None,
                     ensemble_prob=None, ensemble_weights=None)
    ref_accs = ref_metrics.sn_test(
        tm, loader, torch.device("cpu"), [rsolver], opts, NSTEPS_GRID
    )
    # the sweep must also have actually changed the grid (1-step RK2 on a
    # random net differs from 8-step), otherwise the lambda regrid is dead.
    # Accuracy is too coarse to witness this (argmax counts can coincide),
    # so check the reference model's LOGITS move when the grid does —
    # sn_test leaves the last grid (8 steps) installed on the solver.
    xb = torch.tensor(x[:4].transpose(0, 3, 1, 2))
    with torch.no_grad():
        out8 = tm(xb, [rsolver], opts)
        rsolver.grid_constructor = lambda t: torch.linspace(t[0], t[-1], 2)
        out1 = tm(xb, [rsolver], opts)
        rsolver.grid_constructor = lambda t: torch.linspace(t[0], t[-1], 9)
    assert float((out8 - out1).abs().max()) > 1e-4, "regrid had no effect"

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = mnist_params_from_torch_state_dict(sd)
    model = build_model("mnist")
    _, state = model.init(jax.random.key(0))

    def data_factory():
        return [(x[i:i + b], y[i:i + b]) for i in range(0, n, b)]

    solver = create_solver("rk2", "u", n_steps=8, u0=0.5)
    accs = sn_test(
        model, params, state, solver, SolverOptions(), data_factory,
        nsteps_grid=NSTEPS_GRID,
    )

    assert len(accs) == len(ref_accs) == len(NSTEPS_GRID)
    for ns, a, ra in zip(NSTEPS_GRID, accs, ref_accs):
        assert float(a) == pytest.approx(float(ra), abs=1e-9), (
            f"n_steps={ns}: ours {a} vs reference {ra}"
        )

    # the reference normalizes by len(dataset) (metrics.py:24); feed a
    # RAGGED final batch through both to pin the denominator semantics
    m = 21  # 8 + 8 + 5
    loader_ragged = torch.utils.data.DataLoader(
        torch.utils.data.TensorDataset(
            torch.tensor(x[:m].transpose(0, 3, 1, 2)), torch.tensor(y[:m])
        ),
        batch_size=b,
        shuffle=False,
    )
    with torch.no_grad():
        ref_acc = ref_metrics.accuracy(
            tm, loader_ragged, torch.device("cpu"), [rsolver], opts
        )
    ours = accuracy(
        model, params, state, [solver], SolverOptions(),
        [(x[i:i + b][:m - i], y[i:i + b][:m - i]) for i in range(0, m, b)],
    )
    assert float(ours) == pytest.approx(float(ref_acc), abs=1e-9)
