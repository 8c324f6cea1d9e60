"""Every attack cross-validated against the reference's OWN torch classes.

tests/test_attacks.py validates our attacks against hand-built oracles; this
module goes one step further (mirroring tests/test_reference_solver_parity.py
for solvers) and runs the reference implementation imported from
/root/reference/MegaAdversarial/src/attacks/* — FGSM (fgsm.py:8-46),
FGSMRandom (fgsm.py:54-106), PGD (pgd.py:8-57), FGSM2Ensemble
(fgsm.py:109-155) — against ours on the SAME tiny model with identical
weights, identical inputs, and (for FGSMRandom) an identical pinned uniform
draw.  The attacked images must match element-wise.

The reference attack modules need torchvision.transforms.Normalize at
forward time; torchvision is not installed, so a functional shim is bound
into the imported modules' namespaces (works whether this test or the
flagship train-step parity test imports MegaAdversarial first).
"""
import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not available"
)

from neural_ode_metasolver_tpu.attacks import (  # noqa: E402
    fgsm,
    fgsm2ensemble,
    fgsm_random,
    normalize,
    pgd,
)

MEAN = (0.4914, 0.4822, 0.4465)
STD = (0.2023, 0.1994, 0.2010)
B, H, W, C, K = 4, 8, 8, 3, 10


class _Normalize:
    """Functional stand-in for torchvision.transforms.Normalize (batched)."""

    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, x):
        return (x - self.mean.to(x.dtype)) / self.std.to(x.dtype)


@pytest.fixture
def ref_attacks(monkeypatch):
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tv.transforms = tr
        monkeypatch.setitem(sys.modules, "torchvision", tv)
        monkeypatch.setitem(sys.modules, "torchvision.transforms", tr)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from MegaAdversarial.src.attacks import fgsm as ref_fgsm_mod
    from MegaAdversarial.src.attacks import pgd as ref_pgd_mod

    # Bind the functional Normalize into the modules' own namespaces: the
    # reference binds `transforms` at first import, which may have been a
    # bare stub installed by another parity test in this process.
    monkeypatch.setattr(
        ref_fgsm_mod.transforms, "Normalize", _Normalize, raising=False
    )
    monkeypatch.setattr(
        ref_pgd_mod.transforms, "Normalize", _Normalize, raising=False
    )
    return ref_fgsm_mod, ref_pgd_mod


class TinyNet(torch.nn.Module):
    """Conv->GELU->FC probe model; accepts and ignores solver kwargs the way
    the reference forwards them into ``model(x, **kwargs)`` (attack.py)."""

    def __init__(self, seed):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.conv = torch.nn.Conv2d(C, 4, 3, padding=1)
        self.fc = torch.nn.Linear(4 * H * W, K)
        with torch.no_grad():
            self.conv.weight.copy_(
                0.3 * torch.randn(self.conv.weight.shape, generator=g)
            )
            self.conv.bias.copy_(
                0.1 * torch.randn(self.conv.bias.shape, generator=g)
            )
            self.fc.weight.copy_(
                0.1 * torch.randn(self.fc.weight.shape, generator=g)
            )
            self.fc.bias.zero_()

    def forward(self, x, **kwargs):
        h = torch.nn.functional.gelu(self.conv(x))
        return self.fc(h.reshape(h.shape[0], -1))


def _jax_forward(tm):
    w = jnp.asarray(tm.conv.weight.detach().numpy())
    b = jnp.asarray(tm.conv.bias.detach().numpy())
    fw = jnp.asarray(tm.fc.weight.detach().numpy())
    fb = jnp.asarray(tm.fc.bias.detach().numpy())

    def fwd(x):  # x: NHWC
        h = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
        ) + b
        h = jax.nn.gelu(h, approximate=False)
        # match torch's NCHW flatten order
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        return h @ fw.T + fb

    return fwd


def _batch():
    rs = np.random.RandomState(7)
    x01 = rs.uniform(0.05, 0.95, (B, H, W, C)).astype(np.float32)
    xn = np.asarray(normalize(jnp.asarray(x01), MEAN, STD))
    y = rs.randint(0, K, size=B)
    return xn, y


def _to_torch(x_nhwc):
    return torch.tensor(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _assert_match(x_adv_jax, x_adv_torch, atol=1e-5):
    ours = np.asarray(x_adv_jax)
    ref = x_adv_torch.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=0)


def test_fgsm_matches_reference(ref_attacks):
    ref_fgsm_mod, _ = ref_attacks
    tm = TinyNet(0)
    xn, y = _batch()
    atk = ref_fgsm_mod.FGSM(tm, eps=8 / 255, mean=MEAN, std=STD)
    ref_adv, _ = atk(_to_torch(xn), torch.tensor(y), {})

    x_adv, _ = fgsm(
        _jax_forward(tm), jnp.asarray(xn), jnp.asarray(y),
        eps=8 / 255, mean=MEAN, std=STD,
    )
    _assert_match(x_adv, ref_adv)


@pytest.mark.parametrize("with_stats", [True, False])
def test_fgsm_random_matches_reference(ref_attacks, monkeypatch, with_stats):
    """Pins the uniform draw in both frameworks to the same array, covering
    both the per-channel-scaled (mu/std given, fgsm.py:72-81) and the plain
    [0,1]-box (fgsm.py:82-84) paths."""
    ref_fgsm_mod, _ = ref_attacks
    tm = TinyNet(1)
    xn, y = _batch()
    U = np.random.RandomState(3).rand(B, H, W, C).astype(np.float32)
    monkeypatch.setattr(
        torch, "rand_like",
        lambda t, **kw: torch.tensor(U.transpose(0, 3, 1, 2)),
    )
    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape, dtype=jnp.float32, *a, **kw: jnp.asarray(U, dtype),
    )
    kw = dict(mu=MEAN, std=STD) if with_stats else {}
    atk = ref_fgsm_mod.FGSMRandom(
        tm, alpha=10 / 255, epsilon=8 / 255, **kw
    )
    if not with_stats:
        # the no-stats path assumes inputs already live in [0,1]
        xn = np.asarray(jnp.clip(jnp.asarray(xn) * 0.1 + 0.5, 0, 1))
    ref_adv, _ = atk(_to_torch(xn), torch.tensor(y), {})

    ours_kw = dict(mean=MEAN, std=STD) if with_stats else {}
    x_adv, _ = fgsm_random(
        _jax_forward(tm), jax.random.key(0), jnp.asarray(xn),
        jnp.asarray(y), epsilon=8 / 255, alpha=10 / 255, **ours_kw,
    )
    _assert_match(x_adv, ref_adv)


def test_pgd_matches_reference(ref_attacks):
    """Deterministic start; 5 grad-sign iterations with eps-box clamp and
    [0,1] projection (pgd.py:41-53) must track the reference step-for-step."""
    _, ref_pgd_mod = ref_attacks
    tm = TinyNet(2)
    xn, y = _batch()
    atk = ref_pgd_mod.PGD(
        tm, eps=8 / 255, lr=2 / 255, n_iter=5,
        randomized_start=False, mean=MEAN, std=STD,
    )
    ref_adv, _ = atk(_to_torch(xn), torch.tensor(y), {})

    x_adv, _ = pgd(
        _jax_forward(tm), None, jnp.asarray(xn), jnp.asarray(y),
        eps=8 / 255, lr=2 / 255, n_iter=5,
        randomized_start=False, mean=MEAN, std=STD,
    )
    _assert_match(x_adv, ref_adv)


def test_fgsm2ensemble_matches_reference(ref_attacks):
    """Two distinct models; NLL of the log of the softmax-prob average
    (fgsm.py:133-145) vs our fgsm2ensemble over forward closures."""
    ref_fgsm_mod, _ = ref_attacks
    tms = [TinyNet(10), TinyNet(11)]
    xn, y = _batch()
    atk = ref_fgsm_mod.FGSM2Ensemble(tms, eps=8 / 255, mean=MEAN, std=STD)
    ref_adv, _ = atk(_to_torch(xn), torch.tensor(y), [{}, {}])

    x_adv, _ = fgsm2ensemble(
        [_jax_forward(t) for t in tms], jnp.asarray(xn), jnp.asarray(y),
        eps=8 / 255, mean=MEAN, std=STD,
    )
    _assert_match(x_adv, ref_adv)
