"""Every solver family integrated by the reference's OWN torch classes.

The tableau tests (tests/test_tableau.py) validate our closed forms against
named classical tableaus and order conditions; this module goes one step
further and cross-validates the full integrate path — tableau closed forms
(ops/tableau.py), grid semantics and interpolation (ops/integrate.py) —
directly against the reference implementation imported from
/root/reference/sopa/src/solvers/* (rk_parametric.py:89-123 and the four
concrete solver classes), same (u, v), same grid, same RHS.
"""
import os
import sys
from decimal import Decimal

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not available"
)

from neural_ode_metasolver_tpu.ops import create_solver  # noqa: E402


def _ref_solver(method, parameterization, n_steps=None, step_size=None,
                u0=None, v0=None):
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from sopa.src.solvers.utils import create_solver as ref_create

    s = ref_create(
        method,
        parameterization or "u",
        -1 if n_steps is None else n_steps,
        -1 if step_size is None else step_size,
        Decimal(str(u0)) if u0 is not None else Decimal("-1"),
        Decimal(str(v0)) if v0 is not None else Decimal("-1"),
        torch.float32,
        "cpu",
    )
    s.freeze_params()
    return s


def _t_rhs(t, y):
    return torch.cos(t) * y - 0.05 * y ** 3


def _j_rhs(t, y):
    return jnp.cos(t) * y - 0.05 * y ** 3


Y0 = np.linspace(-1.2, 1.4, 12).reshape(3, 4).astype(np.float32)


def _compare(method, parameterization, u0=None, v0=None,
             n_steps=8, step_size=None, out_t=(0.0, 1.0), atol=2e-6):
    if step_size is not None:
        n_steps = None
    ref = _ref_solver(method, parameterization, n_steps=n_steps,
                      step_size=step_size, u0=u0, v0=v0)
    with torch.no_grad():
        ref_traj = ref.integrate(
            _t_rhs, torch.tensor(Y0), torch.tensor(list(out_t))
        ).numpy()

    ours = create_solver(method, parameterization, n_steps=n_steps,
                         step_size=step_size, u0=u0, v0=v0)
    traj = np.asarray(
        ours.integrate(_j_rhs, jnp.asarray(Y0), jnp.asarray(list(out_t)))
    )
    assert traj.shape == ref_traj.shape == (len(out_t), *Y0.shape)
    np.testing.assert_allclose(traj, ref_traj, atol=atol, rtol=1e-5)


@pytest.mark.parametrize("u0", [0.5, 1.0, 2.0 / 3.0, 0.37])
def test_rk2_matches_reference(u0):
    _compare("rk2", "u", u0=u0)


def test_euler_matches_reference():
    _compare("euler", None)


@pytest.mark.parametrize("u0,v0", [(1 / 3, 2 / 3), (0.4, 0.9), (0.8, 0.25)])
def test_rk3_matches_reference(u0, v0):
    _compare("rk3", "uv", u0=u0, v0=v0)


def test_rk3_degenerate_nudge_matches_reference():
    # u == v trips the degenerate repair in both implementations
    # (reference rk_parametric_order3stage3.py:64-68; ops/tableau.py
    # _nudge_degenerate) — same eps, same branch, same trajectory.
    _compare("rk3", "uv", u0=0.5, v0=0.5)


@pytest.mark.parametrize("parameterization,u0", [
    ("u1", 1 / 3), ("u1", 0.45), ("u2", 0.4), ("u3", 0.29),
])
def test_rk4_single_param_matches_reference(parameterization, u0):
    _compare("rk4", parameterization, u0=u0)


@pytest.mark.parametrize("u0,v0", [(1 / 3, 2 / 3), (0.25, 0.8)])
def test_rk4_uv_matches_reference(u0, v0):
    _compare("rk4", "uv", u0=u0, v0=v0)


def test_step_size_end_clamp_matches_reference():
    # step_size grid where (t1-t0)/h is non-integral: the final interval is
    # clamped short (rk_parametric.py:23-35) — both must land on the same
    # grid and the same y(1).
    _compare("rk2", "u", u0=0.5, step_size=0.17)


def test_trajectory_interpolation_matches_reference():
    # output times strictly inside the grid exercise the linear-interp path
    # (rk_parametric.py:109-123 vs ops/integrate.py odeint interp).
    _compare("rk2", "u", u0=2.0 / 3.0, out_t=(0.0, 0.3, 0.65, 1.0))
