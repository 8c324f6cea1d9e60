"""Coverage for the smaller utilities: metrics logger, checkpoint discovery,
activation/norm parity vs torch, data helpers, SVHN reader."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.data import (
    Dataset,
    inf_generator,
    load_svhn,
    synthetic_dataset,
)
from neural_ode_metasolver_tpu.data.datasets import augment_batch
from neural_ode_metasolver_tpu.models import nn as fnn
from neural_ode_metasolver_tpu.training import MetricsLogger, latest_step
from neural_ode_metasolver_tpu.utils import count_parameters, fix_seeds


def test_metrics_logger_jsonl(tmp_path):
    with MetricsLogger(str(tmp_path), config={"model": "mnist"}) as log:
        log.log({"loss": 1.5, "acc": 0.2}, step=1)
        log.log({"loss": jnp.float32(1.2)}, step=2)
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["_type"] == "config"
    assert lines[1]["loss"] == 1.5 and lines[1]["step"] == 1
    assert abs(lines[2]["loss"] - 1.2) < 1e-6


def test_latest_step(tmp_path):
    assert latest_step(str(tmp_path / "nope")) is None
    os.makedirs(tmp_path / "step_00000002" / "state")
    os.makedirs(tmp_path / "step_00000010" / "state")
    assert latest_step(str(tmp_path)) == 10
    # a torn dir (no committed orbax 'state') must not win
    os.makedirs(tmp_path / "step_00000099")
    assert latest_step(str(tmp_path)) == 10


def test_fix_seeds_and_count_parameters():
    key = fix_seeds(7)
    assert key is not None
    a = np.random.rand(3)
    fix_seeds(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    assert count_parameters({"a": jnp.ones((2, 3)), "b": [jnp.ones(4)]}) == 10


REFERENCE_ROOT = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference not available")
def test_shared_utils_match_reference():
    """Live cross-validation of the last shared-utils pieces against the
    reference's own code: RunningAverageMeter (models/utils.py:17-33,
    first-update snap + 0.99 EMA) and count_parameters
    (odenet_mnist/utils.py:21-23) on the same MNIST model."""
    import sys

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    torch = pytest.importorskip("torch")
    from sopa.src.models.utils import RunningAverageMeter as RefMeter
    from sopa.src.models.odenet_mnist.utils import (
        count_parameters as ref_count,
    )
    from sopa.src.models.odenet_mnist.layers import MetaNODE as RefMetaNODE

    from neural_ode_metasolver_tpu.training import RunningAverageMeter
    from neural_ode_metasolver_tpu.models import (
        mnist_params_from_torch_state_dict,
    )

    ours, ref = RunningAverageMeter(momentum=0.97), RefMeter(momentum=0.97)
    rs = np.random.RandomState(0)
    for v in rs.rand(50):
        ours.update(float(v))
        ref.update(float(v))
        assert ours.avg == pytest.approx(ref.avg, abs=1e-12)

    tm = RefMetaNODE(downsampling_method="conv", is_odenet=True)
    params = mnist_params_from_torch_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    assert count_parameters(params) == ref_count(tm)


def test_inf_generator_restarts():
    ds = synthetic_dataset(8, (4, 4, 1), seed=0)

    def make_iter(epoch):
        from neural_ode_metasolver_tpu.data import batch_iterator

        return batch_iterator(ds, 4, seed=epoch)

    gen = inf_generator(make_iter)
    batches = [next(gen) for _ in range(5)]  # 2 per epoch -> crosses restarts
    assert all(b[0].shape == (4, 4, 4, 1) for b in batches)


def test_augment_batch_numpy_properties():
    rs = np.random.RandomState(0)
    x = rs.rand(8, 8, 8, 3).astype(np.float32)
    out = augment_batch(np.random.RandomState(1), x, crop_padding=2,
                        hflip=True)
    assert out.shape == x.shape
    nz = out[out > 0]
    assert np.isin(nz, x).all()  # crops of zero-padded originals


def test_activations_match_torch():
    torch = pytest.importorskip("torch")
    x = jnp.linspace(-3, 3, 61, dtype=jnp.float32)
    xt = torch.tensor(np.asarray(x))
    cases = {
        "ReLU": torch.nn.functional.relu(xt),
        "Softsign": torch.nn.functional.softsign(xt),
        "Tanh": torch.tanh(xt),
        "AF": torch.nn.functional.leaky_relu(xt, negative_slope=1.0),
    }
    for name, expected in cases.items():
        got = fnn.get_activation(name)(x)
        np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                                   atol=1e-6)
    with pytest.raises(NameError):
        fnn.get_activation("Swish")


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = jax.random.normal(jax.random.key(0), (2, 5, 5, 6), jnp.float32)
    y = fnn.instance_norm(x)
    inorm = torch.nn.InstanceNorm2d(6)
    yt = inorm(
        torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)


def test_norm_registry_errors():
    with pytest.raises(NameError):
        fnn.make_norm_def("XX")
    with pytest.raises(NameError):
        fnn.make_param_norm_def("XX")


def test_load_svhn_roundtrip(tmp_path):
    from scipy.io import savemat

    rs = np.random.RandomState(0)
    X = (rs.rand(32, 32, 3, 5) * 255).astype(np.uint8)  # HWCN
    y = np.asarray([[1], [2], [10], [4], [5]], np.uint8)  # '0' stored as 10
    savemat(tmp_path / "train_32x32.mat", {"X": X, "y": y})
    ds = load_svhn(str(tmp_path), "train")
    assert ds.images.shape == (5, 32, 32, 3)
    assert ds.labels.tolist() == [1, 2, 0, 4, 5]
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    with pytest.raises(FileNotFoundError):
        load_svhn(str(tmp_path), "test")


def test_dataset_validation():
    with pytest.raises(AssertionError):
        Dataset(np.zeros((2, 3, 3)), np.zeros(2))  # not 4-D


def test_real_digits_end_to_end_learning():
    """Golden-style validation on REAL data (sklearn's bundled handwritten
    digits, no network needed): a small MetaNODE must learn to high accuracy,
    demonstrating genuine classification — not just synthetic-blob fitting."""
    from neural_ode_metasolver_tpu.data import batch_iterator, load_digits_dataset
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
    from neural_ode_metasolver_tpu.training import (
        accuracy,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    train_ds, test_ds = load_digits_dataset()
    model = build_model("mnist", dim=16)
    tx = make_optimizer("rmsprop", 3e-3)
    ts = create_train_state(model, tx, jax.random.key(0))
    solvers = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
    step = make_train_step(model, tx, solvers, SolverOptions())
    key = jax.random.key(1)
    for epoch in range(6):
        for x, y in batch_iterator(train_ds, 64, seed=epoch):
            key, sub = jax.random.split(key)
            ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), sub)
    acc = accuracy(
        model, ts.params, ts.model_state, solvers, SolverOptions(),
        batch_iterator(test_ds, 128, shuffle=False, drop_last=False),
    )
    assert acc > 0.7, acc


def test_profiler_trace_smoke(tmp_path):
    from neural_ode_metasolver_tpu.training import trace, annotate

    with trace(str(tmp_path)):
        with annotate("tiny"):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # a trace directory with at least one file must exist
    found = [p for p in (tmp_path).rglob("*") if p.is_file()]
    assert found


def test_dsl_minus_one_u0_passes_through_like_reference():
    """create_solver maps -1 to None ONLY for n_steps/step_size (reference
    utils.py:23-27); u0/v0 = -1 pass through verbatim and the tableau
    validity clamp turns them into eps at build (rk2 clamp, rk2:52-62)."""
    from neural_ode_metasolver_tpu.ops import parse_solver_dsl
    from neural_ode_metasolver_tpu.ops.tableau import validity_eps

    (s,) = parse_solver_dsl("rk2,u,8,-1,-1,-1")
    assert float(s.u) == -1.0  # raw param keeps the sentinel value
    eps = validity_eps(jnp.float32)
    assert abs(float(s.tableau().c[1]) - eps) < 1e-12  # c2 == clamp(-1)

    (s3,) = parse_solver_dsl("rk3,uv,8,-1,-1,0.6")
    assert float(s3.u) == -1.0 and abs(float(s3.v) - 0.6) < 1e-7


def test_create_solver_none_defaults_for_python_api():
    from neural_ode_metasolver_tpu.ops import create_solver

    assert float(create_solver("rk2", "u", n_steps=8).u) == 0.5
    s = create_solver("rk3", "uv", n_steps=8)
    assert abs(float(s.u) - 1 / 3) < 1e-6 and abs(float(s.v) - 2 / 3) < 1e-6


def test_nfe_counts_custom_grid():
    from neural_ode_metasolver_tpu.ops import create_solver
    from neural_ode_metasolver_tpu.training import nfe_per_solve

    s = create_solver("rk2", "u", n_steps=4, u0=0.5)
    s = s.replace(n_steps=None, custom_grid=(0.0, 0.1, 0.5, 1.0))
    assert nfe_per_solve(s) == 2 * 3


def test_fused_gn_validates_under_autodiff():
    """The divisibility check must fire for DIFFERENTIATED calls too: the
    custom_vjp primal body is bypassed under jax.grad, so a check living
    only there would let the padded kernel silently mis-normalize."""
    from neural_ode_metasolver_tpu.ops.pallas_kernels import (
        fused_group_norm_act,
    )

    x = jnp.ones((2, 4, 4, 10), jnp.float32)
    scale = jnp.ones((10,))
    bias = jnp.zeros((10,))

    with pytest.raises(ValueError, match="divisible"):
        fused_group_norm_act(x, scale, bias, 4, interpret=True)

    def loss(xi):
        return fused_group_norm_act(xi, scale, bias, 4,
                                    interpret=True).sum()

    with pytest.raises(ValueError, match="divisible"):
        jax.grad(loss)(x)


def test_ensemble_predict_reuse_matches_fresh():
    """make_ensemble_probs / make_ensemble_attacked_probs closures can be
    built once and reused (predict=...) with identical results."""
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
    from neural_ode_metasolver_tpu.training import (
        AttackConfig,
        accuracy_ensemble,
        adversarial_accuracy_ensemble,
        make_ensemble_attacked_probs,
        make_ensemble_probs,
    )

    model = build_model("mnist", dim=8)
    params, state = model.init(jax.random.key(0))
    members = [
        (params, state, [create_solver("rk2", "u", n_steps=2, u0=u)],
         SolverOptions())
        for u in (0.5, 1.0)
    ]
    xs = np.random.RandomState(0).rand(8, 28, 28, 1).astype(np.float32)
    ys = np.arange(8) % 10
    data = lambda: [(xs, ys)]

    a1 = accuracy_ensemble(model, members, data())
    probs = make_ensemble_probs(model, members)
    a2 = accuracy_ensemble(model, members, data(), predict=probs)
    assert a1 == a2

    cfg = AttackConfig(mode="fgsm", eps=0.05)
    b1 = adversarial_accuracy_ensemble(model, members, data(), cfg,
                                       jax.random.key(1))
    att = make_ensemble_attacked_probs(model, members, cfg)
    b2 = adversarial_accuracy_ensemble(model, members, data(), cfg,
                                       jax.random.key(1), predict=att)
    assert b1 == b2
