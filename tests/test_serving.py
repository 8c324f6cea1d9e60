"""Serving export: StableHLO artifact roundtrip — exported forward equals
the live model, is batch-polymorphic, and loads without model code."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
from neural_ode_metasolver_tpu.serving import export_model, load_model

SOLVERS = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
OPTS = SolverOptions()


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("served") / "mnist")
    model = build_model("mnist", dim=16)
    params, state = model.init(jax.random.key(0))
    export_model(
        path, model, params, state, SOLVERS, OPTS,
        input_shape=(1, 28, 28, 1),
        config={"model": "mnist", "solvers": "rk2,u,2,-1,0.5,-1"},
    )
    return path, model, params, state


def test_export_roundtrip_matches_live_model(artifact):
    path, model, params, state = artifact
    served = load_model(path)
    x = jax.random.normal(jax.random.key(1), (4, 28, 28, 1), jnp.float32)
    live, _, _ = model.apply(params, state, x, SOLVERS, OPTS)
    np.testing.assert_allclose(
        np.asarray(served(x)), np.asarray(live), atol=1e-5, rtol=1e-5
    )
    assert served.config["model"] == "mnist"


def test_export_is_batch_polymorphic(artifact):
    path, *_ = artifact
    served = load_model(path)
    for b in (1, 3, 16):
        out = served(jnp.zeros((b, 28, 28, 1), jnp.float32))
        assert out.shape == (b, 10)


def test_artifact_files(artifact):
    path, *_ = artifact
    assert os.path.exists(os.path.join(path, "model.stablehlo"))
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["batch_polymorphic"] is True
    assert cfg["input_shape"] == [1, 28, 28, 1]


def test_static_batch_export(tmp_path):
    model = build_model("mnist", dim=16)
    params, state = model.init(jax.random.key(0))
    path = str(tmp_path / "static")
    export_model(
        path, model, params, state, SOLVERS, OPTS,
        input_shape=(4, 28, 28, 1), batch_polymorphic=False,
    )
    served = load_model(path)
    assert served(jnp.zeros((4, 28, 28, 1), jnp.float32)).shape == (4, 10)
