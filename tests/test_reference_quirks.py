"""Live observation of the reference's latent CIFAR-stack bugs (SURVEY.md
appendix quirks 7, 8, 10) against the corresponding deliberate decisions
here.  Each test executes the reference's OWN code to pin down the actual
(buggy) behavior, then asserts our counterpart's documented choice.

Quirks 4/5/6 (ss-loss) live in tests/test_reference_ssloss_parity.py;
quirk 11 (minimize_rk2_error recentering) in
tests/test_reference_noise_parity.py; quirk 13 (Euler ignores u0/v0) in
tests/test_reference_solver_parity.py.  The consolidated decision table is
PARITY.md "Appendix: quirk decisions".
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not available"
)


def _ref_modules():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from sopa.src.models.odenet_cifar10 import layers as ref_layers
    from sopa.src.models.odenet_cifar10 import utils as ref_utils

    return ref_layers, ref_utils


def _flagship(ref_layers, ref_utils):
    torch.manual_seed(0)
    return ref_layers.premetanode10(
        norm_layers=(ref_utils.get_normalization("NF"),) * 3,
        param_norm_layers=(ref_utils.get_param_normalization("PNF"),) * 3,
        act_layers=(ref_utils.get_activation("GeLU"),) * 3,
        in_planes=8,
    )


def test_quirk7_is_preactivation_always_false_in_reference():
    """odenet_cifar10/layers.py:339-342 calls ``isinstance`` on the CLASS
    objects passed as ``resblock``/``odefunc``, which is always False — so
    even premetanode* (built from PreBasicBlock/PreBasicBlock2,
    layers.py:520-530) executes the post-activation epilogue.  Our
    ``faithful_preact_bug=True`` default matches this executed behavior
    (models/odenet_cifar10.py:21-25); full forward parity under it is in
    tests/test_torch_parity_cifar.py."""
    ref_layers, ref_utils = _ref_modules()
    tm = _flagship(ref_layers, ref_utils)
    # the bug, observed live: a pre-activation registry model that does
    # not know it is pre-activation
    assert tm.is_preactivation is False

    # the isinstance-on-a-class call at the heart of it:
    assert not isinstance(ref_layers.PreBasicBlock, ref_layers.PreBasicBlock)

    from neural_ode_metasolver_tpu.models import premetanode10

    cfg = premetanode10(in_planes=8)
    assert cfg.faithful_preact_bug is True  # executed-behavior default


def test_quirk8_metalayer_nfe_sums_dict_keys_in_reference():
    """odenet_cifar10/layers.py:306-309: ``sum(per_block_nfe)`` iterates a
    dict, summing its KEYS (0..n-1) — the reported NFE is a constant
    ``n*(n-1)/2`` independent of any RHS evaluation.  Observed live, the
    bug is doubly dead: the per-block value it would read is a stale
    ``MetaODEBlock.nfe`` attribute planted by the construction-time setter
    cascade (MetaNODE.__init__ ``self.nfe = 0`` :393 → layer setter :403 →
    ``block.nfe = value`` :314), while the LIVE counter increments on
    ``block.rhs_func.nfe`` (PreBasicBlock2, :135,:149) and is never read.
    Our NFE is derived statically instead
    (training/metrics.py::nfe_per_solve/nfe_per_forward: premetanode10 @
    8-step RK2 = 2 x 8 x 2 = 32, the BASELINE.md row)."""
    ref_layers, ref_utils = _ref_modules()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from sopa.src.solvers.utils import create_solver as ref_create
    from argparse import Namespace

    tm = _flagship(ref_layers, ref_utils)
    layer = tm.layer1  # MetaLayer with ONE ODE block -> keys == [0]
    assert len(layer.blocks_ode) == 1
    assert layer.nfe == 0  # before any forward: sum of keys, not values

    s = ref_create("rk2", "u", 8, -1, np.float32(0.5), np.float32(-1),
                   torch.float32, "cpu")
    s.freeze_params()
    with torch.no_grad():
        layer(torch.zeros(1, 8, 8, 8), [s],
              Namespace(solver_mode="standalone"))
    # the RHS's own counter advanced (8 steps x 2 stages = 16)...
    assert layer.blocks_ode[0].rhs_func.nfe == 16
    # ...but the per-block attribute the property reads is the stale 0
    # planted by the constructor's setter cascade...
    assert layer.blocks_ode[0].nfe == 0
    # ...and the layer-level property reports sum(dict KEYS) == 0 anyway
    assert layer.nfe == 0

    from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
    from neural_ode_metasolver_tpu.training import (
        nfe_per_forward,
        nfe_per_solve,
    )

    ours = create_solver("rk2", "u", n_steps=8, u0=0.5)
    assert nfe_per_solve(ours) == 16
    assert nfe_per_forward([ours], SolverOptions(), n_ode_blocks=2) == 32


def test_quirk10_conv_init_nameerror_in_reference():
    """odenet_cifar10/utils.py:78-81 uses ``np.sqrt`` but the module never
    imports numpy (utils.py:1-5) -> NameError on any Conv-with-bias module;
    doubly latent because the registry convs use bias=False, so the branch
    is also unreachable in shipped configs.  Our xavier init is implemented
    working (models/nn.py::apply_init_scheme, ``--init xavier``)."""
    _, ref_utils = _ref_modules()
    assert not hasattr(ref_utils, "np")
    biased = torch.nn.Conv2d(3, 4, 3, bias=True)
    with pytest.raises(NameError):
        ref_utils.conv_init(biased)
    # bias=False (every registry conv): silently a no-op, no crash
    ref_utils.conv_init(torch.nn.Conv2d(3, 4, 3, bias=False))

    import jax

    from neural_ode_metasolver_tpu.models import CifarConfig, init_cifar
    from neural_ode_metasolver_tpu.models.nn import apply_init_scheme

    cfg = CifarConfig(in_planes=8)
    params, _ = init_cifar(jax.random.key(0), cfg)
    re_init = apply_init_scheme(jax.random.key(1), params, "xavier")
    k0 = np.asarray(params["conv1"]["kernel"])
    k1 = np.asarray(re_init["conv1"]["kernel"])
    assert k0.shape == k1.shape and not np.allclose(k0, k1)
