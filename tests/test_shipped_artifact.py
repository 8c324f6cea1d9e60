"""The shipped trained artifact (the analog of the reference's
examples/mnist/checkpoints/checkpoint_15444.pth): an orbax checkpoint and
a StableHLO serving export of a PGD-adv-trained MNIST MetaNODE on real
digits. Both must load and reproduce the recorded accuracy."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_ode_metasolver_tpu.data import load_digits_dataset
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, parse_solver_dsl
from neural_ode_metasolver_tpu.training import (
    create_train_state,
    make_optimizer,
    restore_checkpoint,
)

ROOT = os.path.join(os.path.dirname(__file__), "..", "examples",
                    "checkpoints")
CKPT = os.path.join(ROOT, "mnist_digits_smoothing")
SERVED = os.path.join(ROOT, "mnist_digits_smoothing_served")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CKPT), reason="shipped artifact not present"
)


def _test_batch(n=256):
    _, test_ds = load_digits_dataset(seed=0)
    return test_ds.images[:n], test_ds.labels[:n]


def test_orbax_artifact_reproduces_recorded_accuracy():
    model = build_model("mnist", dim=64)
    tx = make_optimizer("rmsprop", 1e-3, weight_decay=5e-4)
    ts = create_train_state(model, tx, jax.random.key(0))
    ts, cfg = restore_checkpoint(CKPT, ts)
    assert cfg["model"] == "mnist"

    solvers = parse_solver_dsl(cfg["solvers"])
    x, y = _test_batch()
    logits, _, _ = model.apply(
        ts.params, ts.model_state, jnp.asarray(x), solvers, SolverOptions()
    )
    acc = float((np.asarray(jnp.argmax(logits, -1)) == y).mean())
    # recorded on the full test split; this 256-image batch should be close
    assert acc >= float(cfg["clean_acc"]) - 0.05
    assert acc > 0.85


def test_serving_artifact_matches_checkpoint():
    from neural_ode_metasolver_tpu.serving import load_model

    served = load_model(SERVED)
    model = build_model("mnist", dim=64)
    tx = make_optimizer("rmsprop", 1e-3, weight_decay=5e-4)
    ts = create_train_state(model, tx, jax.random.key(0))
    ts, cfg = restore_checkpoint(CKPT, ts)
    solvers = parse_solver_dsl(cfg["solvers"])

    x, _ = _test_batch(64)
    live, _, _ = model.apply(
        ts.params, ts.model_state, jnp.asarray(x), solvers, SolverOptions()
    )
    np.testing.assert_allclose(
        np.asarray(served(jnp.asarray(x))), np.asarray(live),
        atol=1e-4, rtol=1e-4,
    )
    assert served.config["pgd_robust_acc"] > 0.7


def test_artifact_config_sidecar():
    import glob

    step_dirs = sorted(glob.glob(os.path.join(CKPT, "step_*")))
    assert step_dirs
    with open(os.path.join(step_dirs[-1], "config.json")) as f:
        cfg = json.load(f)
    assert "pgd_robust_acc" in cfg and "adv_training" in cfg
