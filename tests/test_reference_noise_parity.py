"""Solver-smoothing noise machinery cross-validated against the reference's
OWN torch code.

tests/test_regimes_noise.py validates ops/noise.py against analytic
expectations; this module (mirroring tests/test_reference_solver_parity.py
and tests/test_reference_attack_parity.py) imports the reference
implementation from /root/reference/sopa/src/solvers/utils.py —
``sample_noise`` (:60-72), ``noise_params`` (:75-98),
``sample_solver_by_noising_params`` (:100-110),
``create_solver_ensemble_by_noising_params`` (:112-117) — and checks both
frameworks agree on:

  * the rejection-to-mean decision at the exact ``mean ± 2*std`` boundary
    (inclusive, utils.py:87-88), via pinned samples injected into BOTH
    frameworks' ``sample_noise`` seams;
  * ``v`` never being rejected (utils.py:91-92);
  * the Bernoulli(p) gate (utils.py:83,93-96);
  * the ``minimize_rk2_error`` recenter-at-2/3 quirk that IGNORES the passed
    mean (utils.py:66-70), including its interaction with the rejection
    window (still centered at mean_u);
  * the sampled *distributions* (normal + cauchy) — PRNG streams differ
    (torch vs threefry), so these are statistical comparisons of empirical
    moments/quantiles and atom-at-mean rates between the two frameworks;
  * the noised-solver tableau rebuild
    (``sample_solver_by_noising_params`` → ``build_ButcherTableau``).
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not available"
)

from neural_ode_metasolver_tpu.ops import create_solver  # noqa: E402
from neural_ode_metasolver_tpu.ops import noise as noise_mod  # noqa: E402


@pytest.fixture
def ref_utils():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from sopa.src.solvers import utils as ref_utils_mod

    return ref_utils_mod


def _our_noise_params_batch(key, n, **kw):
    """Vectorize ops/noise.py::noise_params over n fresh keys."""
    keys = jax.random.split(key, n)
    u, v = jax.vmap(lambda k: noise_mod.noise_params(k, **kw))(keys)
    return np.asarray(u), None if v is None else np.asarray(v)


def _ref_noise_params_batch(n, **kw):
    from sopa.src.solvers.utils import noise_params as ref_np

    us, vs = [], []
    for _ in range(n):
        u, v = ref_np(**kw)
        us.append(float(torch.as_tensor(u).reshape(-1)[0]))
        vs.append(None if v is None else float(torch.as_tensor(v).reshape(-1)[0]))
    return np.asarray(us, np.float64), vs


# ---------------------------------------------------------------------------
# Deterministic: pin the sample in both frameworks, compare the decision.
# ---------------------------------------------------------------------------

MEAN_U, STD = 0.5, 0.05


@pytest.mark.parametrize(
    "offset_in_stds",
    [-2.5, -2.0, -1.95, -0.5, 0.0, 1.0, 1.95, 2.0, 2.5],
)
def test_rejection_boundary_parity(ref_utils, monkeypatch, offset_in_stds):
    """utils.py:87-88 rejects u outside mean±2std with INCLUSIVE boundaries;
    ops/noise.py:93-94 must take the same branch at every offset."""
    pinned = MEAN_U + offset_in_stds * STD

    monkeypatch.setattr(
        ref_utils, "sample_noise",
        lambda mu, sigma, **kw: torch.tensor([[pinned]], dtype=torch.float32),
    )
    u_ref, v_ref = ref_utils.noise_params(
        mean_u=torch.tensor(MEAN_U), std=STD, bernoulli_p=1.0,
        noise_type="normal",
    )

    monkeypatch.setattr(
        noise_mod, "sample_noise",
        lambda key, mu, sigma, **kw: jnp.float32(pinned),
    )
    u_ours, v_ours = noise_mod.noise_params(
        jax.random.PRNGKey(0), mean_u=MEAN_U, std=STD, bernoulli_p=1.0,
        noise_type="normal",
    )

    assert v_ref is None and v_ours is None
    np.testing.assert_allclose(
        float(torch.as_tensor(u_ref).reshape(-1)[0]), float(u_ours),
        rtol=0, atol=1e-6,
    )
    # sanity: the boundary itself rejects (inclusive <=/>=)
    if abs(offset_in_stds) >= 2.0:
        assert float(u_ours) == pytest.approx(MEAN_U)
    else:
        assert float(u_ours) == pytest.approx(pinned)


def test_v_never_rejected_parity(ref_utils, monkeypatch):
    """utils.py:91-92 samples v with NO rejection window; a far-out v must
    come through raw in both frameworks even while u is rejected."""
    u_pin, v_pin = MEAN_U + 10 * STD, 0.9  # u far out (rejected), v far out

    def ref_pin(mu, sigma, **kw):
        val = u_pin if abs(float(torch.as_tensor(mu)) - MEAN_U) < 1e-9 else v_pin
        return torch.tensor([[val]], dtype=torch.float32)

    monkeypatch.setattr(ref_utils, "sample_noise", ref_pin)
    u_ref, v_ref = ref_utils.noise_params(
        mean_u=torch.tensor(MEAN_U), mean_v=torch.tensor(1.0 / 3.0),
        std=STD, bernoulli_p=1.0, noise_type="normal",
    )

    def our_pin(key, mu, sigma, **kw):
        val = u_pin if abs(float(mu) - MEAN_U) < 1e-9 else v_pin
        return jnp.float32(val)

    monkeypatch.setattr(noise_mod, "sample_noise", our_pin)
    u_ours, v_ours = noise_mod.noise_params(
        jax.random.PRNGKey(0), mean_u=MEAN_U, mean_v=1.0 / 3.0,
        std=STD, bernoulli_p=1.0, noise_type="normal",
    )

    assert float(torch.as_tensor(u_ref).reshape(-1)[0]) == pytest.approx(MEAN_U)
    assert float(u_ours) == pytest.approx(MEAN_U)
    assert float(torch.as_tensor(v_ref).reshape(-1)[0]) == pytest.approx(v_pin)
    assert float(v_ours) == pytest.approx(v_pin)


def test_gate_closed_parity(ref_utils):
    """bernoulli_p=0 short-circuits to the means in both frameworks
    (utils.py:93-96 else-branch; ops/noise.py:95,104 gate=False)."""
    torch.manual_seed(0)
    u_ref, v_ref = ref_utils.noise_params(
        mean_u=torch.tensor(MEAN_U), mean_v=torch.tensor(0.25),
        std=STD, bernoulli_p=0.0, noise_type="cauchy",
    )
    u_ours, v_ours = noise_mod.noise_params(
        jax.random.PRNGKey(1), mean_u=MEAN_U, mean_v=0.25,
        std=STD, bernoulli_p=0.0, noise_type="cauchy",
    )
    assert float(torch.as_tensor(u_ref).reshape(-1)[0]) == pytest.approx(MEAN_U)
    assert float(u_ours) == pytest.approx(MEAN_U)
    assert float(torch.as_tensor(v_ref).reshape(-1)[0]) == pytest.approx(0.25)
    assert float(v_ours) == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# Statistical: real sampling, empirical distribution parity.
# ---------------------------------------------------------------------------

N_STAT = 5000


def test_normal_distribution_parity(ref_utils):
    """noise_params with normal noise: the kept-sample distribution
    (truncated N(mean, std) inside ±2std, atom at mean outside) must match
    between frameworks: mean, std, and atom-at-mean rate (analytic 4.55%)."""
    torch.manual_seed(0)
    u_ref, _ = _ref_noise_params_batch(
        N_STAT, mean_u=torch.tensor(MEAN_U), std=STD, bernoulli_p=1.0,
        noise_type="normal",
    )
    u_ours, _ = _our_noise_params_batch(
        jax.random.PRNGKey(2), N_STAT, mean_u=MEAN_U, std=STD,
        bernoulli_p=1.0, noise_type="normal",
    )
    for u in (u_ref, u_ours):
        assert abs(u.mean() - MEAN_U) < 0.005
    assert abs(u_ref.std() - u_ours.std()) < 0.006
    rej_ref = np.mean(u_ref == np.float32(MEAN_U))
    rej_ours = np.mean(u_ours == np.float32(MEAN_U))
    p_analytic = 0.0455  # 2*(1-Phi(2))
    assert abs(rej_ref - p_analytic) < 0.015
    assert abs(rej_ours - p_analytic) < 0.015


def test_cauchy_distribution_parity(ref_utils):
    """Cauchy noise: no moments, so compare median, IQR of accepted samples,
    and the atom-at-mean rate (analytic 1 - (2/pi)·atan(2) ≈ 29.5%)."""
    torch.manual_seed(1)
    u_ref, _ = _ref_noise_params_batch(
        N_STAT, mean_u=torch.tensor(MEAN_U), std=STD, bernoulli_p=1.0,
        noise_type="cauchy",
    )
    u_ours, _ = _our_noise_params_batch(
        jax.random.PRNGKey(3), N_STAT, mean_u=MEAN_U, std=STD,
        bernoulli_p=1.0, noise_type="cauchy",
    )
    p_analytic = 1.0 - (2.0 / np.pi) * np.arctan(2.0)
    for u in (u_ref, u_ours):
        assert abs(np.median(u) - MEAN_U) < 0.005
        assert abs(np.mean(u == np.float32(MEAN_U)) - p_analytic) < 0.03
    # IQR of the full mixture (atom collapses to mean): framework-vs-framework
    iqr_ref = np.subtract(*np.percentile(u_ref, [75, 25]))
    iqr_ours = np.subtract(*np.percentile(u_ours, [75, 25]))
    assert abs(iqr_ref - iqr_ours) < 0.01


def test_minimize_rk2_error_recenter_parity(ref_utils):
    """sample_noise(minimize_rk2_error=True) recenters at 2/3 with scale
    (2/3)·sigma and IGNORES the passed mean (quirk 11, utils.py:66-70) —
    both frameworks, checked on raw sample_noise draws."""
    torch.manual_seed(2)
    mu_passed, sigma = 0.3, 0.06  # mu deliberately far from 2/3
    ref = np.asarray(
        ref_utils.sample_noise(
            mu_passed, sigma, noise_type="normal", size=N_STAT,
            minimize_rk2_error=True,
        )
    ).reshape(-1)
    ours = np.asarray(
        noise_mod.sample_noise(
            jax.random.PRNGKey(4), mu_passed, sigma, noise_type="normal",
            minimize_rk2_error=True, shape=(N_STAT,),
        )
    )
    for s in (ref, ours):
        assert abs(s.mean() - 2.0 / 3.0) < 0.003  # NOT mu_passed
        assert abs(s.std() - (2.0 / 3.0) * sigma) < 0.003


def test_minimize_rk2_error_rejection_interaction_parity(ref_utils):
    """With minimize_rk2_error the samples are centered at 2/3 but the
    rejection window stays centered at mean_u (utils.py:87): for
    mean_u=0.5, std=0.0125 the window [0.475, 0.525] almost never contains
    a N(2/3, 2/3·std) draw, so both frameworks collapse to mean_u."""
    torch.manual_seed(3)
    n = 400
    u_ref, _ = _ref_noise_params_batch(
        n, mean_u=torch.tensor(0.5), std=0.0125, bernoulli_p=1.0,
        noise_type="normal", minimize_rk2_error=True,
    )
    u_ours, _ = _our_noise_params_batch(
        jax.random.PRNGKey(5), n, mean_u=0.5, std=0.0125, bernoulli_p=1.0,
        noise_type="normal", minimize_rk2_error=True,
    )
    assert np.mean(u_ref == np.float32(0.5)) > 0.99
    assert np.mean(u_ours == np.float32(0.5)) > 0.99


def test_bernoulli_gate_rate_parity(ref_utils):
    """p=0.35 gate: atom-at-mean rate = (1-p) + p·0.0455 ≈ 0.666 for normal
    noise, matched by both frameworks."""
    torch.manual_seed(4)
    p = 0.35
    u_ref, _ = _ref_noise_params_batch(
        N_STAT, mean_u=torch.tensor(MEAN_U), std=STD, bernoulli_p=p,
        noise_type="normal",
    )
    u_ours, _ = _our_noise_params_batch(
        jax.random.PRNGKey(6), N_STAT, mean_u=MEAN_U, std=STD,
        bernoulli_p=p, noise_type="normal",
    )
    expected = (1 - p) + p * 0.0455
    for u in (u_ref, u_ours):
        assert abs(np.mean(u == np.float32(MEAN_U)) - expected) < 0.025


# ---------------------------------------------------------------------------
# Noised-solver plumbing: pinned (u, v) → rebuilt tableau parity.
# ---------------------------------------------------------------------------

def test_noised_solver_tableau_parity(ref_utils, monkeypatch, capsys):
    """sample_solver_by_noising_params (utils.py:100-110) perturbs u then
    rebuilds the tableau; with an identical pinned u both frameworks must
    produce the same RK2 coefficients (b1, b2, w21, c2)."""
    u_noised = 0.71

    ref_solver = ref_utils.create_solver(
        "rk2", "u", 8, -1, np.float32(0.5), np.float32(-1),
        torch.float32, "cpu",
    )
    ref_solver.freeze_params()
    monkeypatch.setattr(
        ref_utils, "noise_params",
        lambda **kw: (torch.tensor(u_noised), None),
    )
    ref_noised = ref_utils.sample_solver_by_noising_params(ref_solver)
    capsys.readouterr()  # swallow the reference's print (utils.py:109)

    ours = create_solver("rk2", "u", n_steps=8, u0=0.5)
    monkeypatch.setattr(
        noise_mod, "noise_params",
        lambda key, **kw: (jnp.float32(u_noised), None),
    )
    ours_noised = noise_mod.noise_solver(ours, jax.random.PRNGKey(7))
    tab = ours_noised.tableau()

    np.testing.assert_allclose(float(ref_noised.b1), float(tab.b[0]), atol=1e-6)
    np.testing.assert_allclose(float(ref_noised.b2), float(tab.b[1]), atol=1e-6)
    np.testing.assert_allclose(float(ref_noised.w21), float(tab.w[1, 0]), atol=1e-6)
    np.testing.assert_allclose(float(ref_noised.c2), float(tab.c[1]), atol=1e-6)
    # the original is untouched in both frameworks
    assert float(ref_solver.u) == pytest.approx(0.5)
    assert float(ours.u) == pytest.approx(0.5)


def test_ensemble_by_noising_parity(ref_utils, monkeypatch, capsys):
    """create_solver_ensemble_by_noising_params (utils.py:112-117) keeps the
    ORIGINAL solver as member 0 and appends n-1 noised copies — matched by
    solver_ensemble_by_noising (ops/noise.py:132-144)."""
    ref_solver = ref_utils.create_solver(
        "rk2", "u", 8, -1, np.float32(0.5), np.float32(-1),
        torch.float32, "cpu",
    )
    ref_solver.freeze_params()
    torch.manual_seed(5)
    ref_ens = ref_utils.create_solver_ensemble_by_noising_params(
        ref_solver, ensemble_size=3,
        kwargs_noise=dict(std=0.01, noise_type="normal"),
    )
    capsys.readouterr()

    ours = create_solver("rk2", "u", n_steps=8, u0=0.5)
    our_ens = noise_mod.solver_ensemble_by_noising(
        ours, jax.random.PRNGKey(8), ensemble_size=3,
        std=0.01, noise_type="normal",
    )

    assert len(ref_ens) == len(our_ens) == 3
    assert ref_ens[0] is ref_solver  # original-first, by identity
    assert float(our_ens[0].u) == pytest.approx(0.5)
    for m_ref, m_ours in zip(ref_ens[1:], our_ens[1:]):
        # noised members stay inside the ±2std window in both frameworks
        assert abs(float(torch.as_tensor(m_ref.u).reshape(-1)[0]) - 0.5) <= 0.02 + 1e-6
        assert abs(float(m_ours.u) - 0.5) <= 0.02 + 1e-6
