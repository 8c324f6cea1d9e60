"""Reference-checkpoint EXPORT: the inverse interop direction.

``torch_import`` proves reference -> JAX; these tests prove JAX ->
reference: a model trained here exports to the reference's own
checkpoint schemas and loads through the reference's OWN code paths —
``load_model`` (sopa/src/models/utils.py:36-48) for the MNIST
``model_best_{id}.pth`` schema and the Evaluate-notebook rebuild
(``Namespace(**ckpt['wandb_config'])`` + ``load_state_dict``,
examples/cifar10 notebook cells 4-6) for the CIFAR
``amp_checkpoint_{itr}.pth`` schema — with forward parity on the way
back.
"""
import os
import sys
from decimal import Decimal

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_ode_metasolver_tpu.models import (  # noqa: E402
    MnistConfig,
    apply_cifar,
    apply_mnist,
    cifar_params_from_torch_state_dict,
    cifar_state_dict_from_params,
    init_cifar,
    init_mnist,
    metanode10,
    mnist_params_from_torch_state_dict,
    mnist_state_dict_from_params,
    premetanode10,
    reference_wandb_config,
    save_cifar_reference_checkpoint,
    save_mnist_reference_checkpoint,
)
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver  # noqa: E402

REFERENCE_ROOT = "/root/reference"
GOLDEN_CKPT = os.path.join(
    REFERENCE_ROOT, "examples/mnist/checkpoints/checkpoint_15444.pth"
)
ref_available = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not available"
)


class _RefOpts:
    solver_mode = "standalone"
    switch_probs = None


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for path, leaf in la:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(lb[tuple(path)]),
                                      err_msg=str(path))


# ----------------------------------------------------- torch-free roundtrips


def test_mnist_export_import_roundtrip():
    params = init_mnist(jax.random.key(0), MnistConfig(dim=16))
    sd = mnist_state_dict_from_params(params)
    back = mnist_params_from_torch_state_dict(sd)
    _tree_equal(params, back)


@pytest.mark.parametrize("factory,block_type", [
    (premetanode10, "prebasic"),
    (metanode10, "basic"),
])
def test_cifar_export_import_roundtrip(factory, block_type):
    cfg = factory(in_planes=16)
    params, _ = init_cifar(jax.random.key(1), cfg)
    sd = cifar_state_dict_from_params(params)
    back = cifar_params_from_torch_state_dict(sd, block_type=block_type)
    _tree_equal(params, back)


def test_cifar_export_rejects_norm_bearing_tree():
    cfg = premetanode10(in_planes=16, norms=("GN", "GN", "GN"))
    params, _ = init_cifar(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="norm-free"):
        cifar_state_dict_from_params(params)


def test_mnist_export_rejects_multi_block_trees():
    params = init_mnist(jax.random.key(0), MnistConfig(dim=16))
    params = dict(params, blocks=params["blocks"] * 2)
    with pytest.raises(ValueError, match="exactly 1 ODE block"):
        mnist_state_dict_from_params(params)


def test_reference_wandb_config_fields_and_unknown_registry():
    cfg = premetanode10(in_planes=64, acts=("GeLUpoly",) * 3)
    wc = reference_wandb_config(cfg, seed=7)
    assert wc["network"] == "premetanode10"
    assert wc["in_planes"] == 64
    # GeLUpoly is this framework's fast exact-GELU; the reference registry
    # only has the erf form it approximates
    assert wc["activation_odeblock"] == "GeLU"
    assert wc["normalization_bn1"] == "NF"
    assert wc["seed"] == 7
    from neural_ode_metasolver_tpu.models import CifarConfig

    with pytest.raises(ValueError, match="no reference registry"):
        reference_wandb_config(CifarConfig(num_blocks=((3, 2),)))


# -------------------------------------------- through the reference's code


@ref_available
def test_mnist_export_loads_through_reference_load_model(tmp_path):
    """save_mnist_reference_checkpoint -> the reference's own load_model
    -> forward parity (the full JAX -> reference handoff)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import argparse

    from sopa.src.models.utils import load_model as ref_load_model
    from sopa.src.solvers.utils import create_solver as ref_create_solver

    # torch>=2.6 defaults torch.load to weights_only=True; the reference's
    # schema carries an argparse.Namespace (utils.py:37), so its own
    # load_model needs the class allowlisted on modern torch
    torch.serialization.add_safe_globals([argparse.Namespace])

    cfg = MnistConfig()  # dim=64: the reference MetaNODE's fixed width
    params = init_mnist(jax.random.key(2), cfg)
    path = str(tmp_path / "model_best_0.pth")
    save_mnist_reference_checkpoint(
        path, params, args={"solvers": [["rk2", "u", 8, -1, 0.5, -1]]},
        solver_id=0,
    )

    tm, model_args = ref_load_model(path)
    tm.eval()
    assert model_args.network == "odenet"
    assert model_args.solvers == [["rk2", "u", 8, -1, 0.5, -1]]

    rs = ref_create_solver(
        "rk2", "u", n_steps=8, step_size=-1,
        u0=Decimal("0.5"), v0=Decimal("-1"),
        dtype=torch.float32, device="cpu",
    )
    rs.freeze_params()
    x = np.random.RandomState(3).rand(8, 28, 28, 1).astype(np.float32)
    solver = create_solver("rk2", "u", n_steps=8, u0=0.5)
    logits, _ = apply_mnist(
        params, jnp.asarray(x), [solver], SolverOptions(), cfg=cfg
    )
    with torch.no_grad():
        t_logits = tm(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            solvers=[rs], solver_options=_RefOpts(),
        ).numpy()
    np.testing.assert_allclose(np.asarray(logits), t_logits, atol=1e-4)


@ref_available
def test_cifar_export_loads_through_notebook_rebuild(tmp_path):
    """save_cifar_reference_checkpoint -> the Evaluate notebook's exact
    rebuild recipe (getattr(cifar10_models, config.network)(norms,
    param_norms, acts, in_planes) + load_state_dict(strict=True)) ->
    forward parity with the reference's own solver classes."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from argparse import Namespace

    import sopa.src.models.odenet_cifar10.layers as cifar10_models
    from sopa.src.models.odenet_cifar10.utils import (
        get_activation,
        get_normalization,
        get_param_normalization,
    )
    from sopa.src.solvers.utils import create_solver as ref_create_solver

    cfg = premetanode10(in_planes=16)
    params, state = init_cifar(jax.random.key(4), cfg)
    path = str(tmp_path / "amp_checkpoint_0.pth")
    save_cifar_reference_checkpoint(path, params, cfg,
                                    wandb_config_extra={"seed": 502})

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    assert set(checkpoint) == {"model", "optimizer", "amp", "lr_scheduler",
                               "iter", "wandb_config"}
    config = Namespace(**checkpoint["wandb_config"])
    assert config.seed == 502
    norm_layers = (get_normalization(config.normalization_resblock),
                   get_normalization(config.normalization_odeblock),
                   get_normalization(config.normalization_bn1))
    param_norm_layers = (
        get_param_normalization(config.param_normalization_resblock),
        get_param_normalization(config.param_normalization_odeblock),
        get_param_normalization(config.param_normalization_bn1),
    )
    act_layers = (get_activation(config.activation_resblock),
                  get_activation(config.activation_odeblock),
                  get_activation(config.activation_bn1))
    tm = getattr(cifar10_models, config.network)(
        norm_layers, param_norm_layers, act_layers, config.in_planes,
        is_odenet=config.is_odenet,
    )
    tm.load_state_dict(checkpoint["model"], strict=True)
    tm.eval()

    rs = ref_create_solver(
        "rk2", "u", n_steps=8, step_size=-1,
        u0=Decimal("0.5"), v0=Decimal("-1"),
        dtype=torch.float32, device="cpu",
    )
    rs.freeze_params()
    x = np.random.RandomState(5).rand(4, 32, 32, 3).astype(np.float32)
    solver = create_solver("rk2", "u", n_steps=8, u0=0.5)
    logits, _, _ = apply_cifar(
        params, state, jnp.asarray(x), [solver], SolverOptions(), cfg=cfg
    )
    with torch.no_grad():
        t_logits = tm(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            solvers=[rs], solver_options=_RefOpts(),
        ).numpy()
    np.testing.assert_allclose(np.asarray(logits), t_logits, atol=3e-4)


@ref_available
def test_cifar_export_inverts_reference_state_dict_exactly():
    """import(reference sd) -> export must reproduce the reference's own
    state_dict key-for-key and bit-for-bit (transposes are lossless)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import sopa.src.models.odenet_cifar10.layers as cifar10_models
    from sopa.src.models.odenet_cifar10.utils import (
        get_activation,
        get_normalization,
        get_param_normalization,
    )

    torch.manual_seed(9)
    tm = cifar10_models.premetanode10(
        norm_layers=(get_normalization("NF"),) * 3,
        param_norm_layers=(get_param_normalization("PNF"),) * 3,
        act_layers=(get_activation("GeLU"),) * 3,
        in_planes=16,
    )
    ref_sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    out = cifar_state_dict_from_params(
        cifar_params_from_torch_state_dict(ref_sd))
    assert set(out) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_array_equal(out[k], ref_sd[k], err_msg=k)


@pytest.mark.skipif(not os.path.exists(GOLDEN_CKPT),
                    reason="reference checkpoint not available")
def test_golden_checkpoint_survives_export_roundtrip(tmp_path):
    """The reference's REAL trained artifact: unpickle -> import -> export
    -> the reference's load_model again; the round-tripped state_dict must
    be bit-identical to the original trained weights."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import argparse

    from sopa.src.models.utils import load_model as ref_load_model

    torch.serialization.add_safe_globals([argparse.Namespace])
    tm = torch.load(GOLDEN_CKPT, map_location="cpu", weights_only=False)
    ref_sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = mnist_params_from_torch_state_dict(ref_sd)

    path = str(tmp_path / "roundtrip.pth")
    save_mnist_reference_checkpoint(path, params, solver_id=1)
    tm2, args2 = ref_load_model(path)
    assert args2.in_channels == 1
    sd2 = {k: v.numpy() for k, v in tm2.state_dict().items()}
    assert set(sd2) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_array_equal(sd2[k], ref_sd[k], err_msg=k)
