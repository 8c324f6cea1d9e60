"""Export trained JAX param trees as reference (torch) checkpoints.

The inverse of :mod:`torch_import`: a model trained in this framework can
be handed back to a reference user as a checkpoint their own code loads —
``sopa/src/models/utils.py:36`` ``load_model`` for MNIST
(``{'state_dict', 'args', 'solver_id'}`` — the ``model_best_{id}.pth``
schema, odenet_mnist/runner.py:225-226) and the CIFAR full-checkpoint
schema (``{'model', 'optimizer', 'amp', 'lr_scheduler', 'iter',
'wandb_config'}``, examples/cifar10/train_and_attack.py:548-557) that the
Evaluate notebook reconstructs from (cells 4-6: ``Namespace(**
checkpoint['wandb_config'])`` + ``model.load_state_dict(
checkpoint['model'])``).

Layout conversions mirror the importer exactly: JAX HWIO conv kernel ->
torch OIHW ``weight``, JAX (in, out) linear kernel -> torch (out, in),
``scale``/``bias`` -> norm ``weight``/``bias``.

The ``*_state_dict_from_params`` functions are torch-free (they emit
``OrderedDict[str, np.ndarray]`` in the reference module's natural
parameter order); the ``save_*_reference_checkpoint`` wrappers do the
``torch.save`` with real ``torch.Tensor`` leaves so the artifact unpickles
in a stock reference environment.

Note for torch>=2.6 consumers: the MNIST schema carries an
``argparse.Namespace`` (exactly as the reference writes it,
runner.py:225-226), which the new ``weights_only=True`` default rejects —
load with ``torch.serialization.add_safe_globals([argparse.Namespace])``
or ``weights_only=False``, the same accommodation the reference's own
artifacts need on modern torch.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any, Mapping, Optional

import numpy as np

__all__ = [
    "mnist_state_dict_from_params",
    "cifar_state_dict_from_params",
    "reference_wandb_config",
    "save_mnist_reference_checkpoint",
    "save_cifar_reference_checkpoint",
]


def _np(leaf) -> np.ndarray:
    return np.asarray(leaf, dtype=np.float32)


def _hwio_to_oihw(kernel) -> np.ndarray:
    """JAX conv kernel (H, W, I, O) -> torch Conv2d weight (O, I, H, W) —
    the inverse of torch_import._oihw_to_hwio."""
    return _np(kernel).transpose(3, 2, 0, 1)


def _put_conv(out: OrderedDict, prefix: str, conv: Mapping[str, Any]):
    out[prefix + ".weight"] = _hwio_to_oihw(conv["kernel"])
    if conv.get("bias") is not None:
        out[prefix + ".bias"] = _np(conv["bias"])


def _put_norm(out: OrderedDict, prefix: str, norm: Mapping[str, Any]):
    out[prefix + ".weight"] = _np(norm["scale"])
    out[prefix + ".bias"] = _np(norm["bias"])


def _put_linear(out: OrderedDict, prefix: str, lin: Mapping[str, Any]):
    out[prefix + ".weight"] = _np(lin["kernel"]).T
    if lin.get("bias") is not None:
        out[prefix + ".bias"] = _np(lin["bias"])


def mnist_state_dict_from_params(params: Mapping[str, Any]) -> OrderedDict:
    """``init_mnist`` param tree -> reference MNIST MetaNODE state_dict
    (odenet, conv downsampling — the exact inverse of
    ``mnist_params_from_torch_state_dict``).

    Keys follow the reference module's registration order
    (odenet_mnist/layers.py:96-209): ``downsampling_layers.{0,1,3,4,6}``,
    ``blocks.0.rhs_func.{norm1,conv1._layer,norm2,conv2._layer,norm3}``,
    ``fc_layers.{0,4}``.
    """
    out: OrderedDict = OrderedDict()
    down = params["down"]
    _put_conv(out, "downsampling_layers.0", down["conv0"])
    _put_norm(out, "downsampling_layers.1", down["norm0"])
    _put_conv(out, "downsampling_layers.3", down["conv1"])
    _put_norm(out, "downsampling_layers.4", down["norm1"])
    _put_conv(out, "downsampling_layers.6", down["conv2"])
    blocks = params["blocks"]
    if len(blocks) != 1:
        raise ValueError(
            f"reference MNIST MetaNODE has exactly 1 ODE block; params "
            f"carry {len(blocks)}"
        )
    b = blocks[0]
    _put_norm(out, "blocks.0.rhs_func.norm1", b["norm1"])
    _put_conv(out, "blocks.0.rhs_func.conv1._layer", b["conv1"])
    _put_norm(out, "blocks.0.rhs_func.norm2", b["norm2"])
    _put_conv(out, "blocks.0.rhs_func.conv2._layer", b["conv2"])
    _put_norm(out, "blocks.0.rhs_func.norm3", b["norm3"])
    _put_norm(out, "fc_layers.0", params["head"]["norm"])
    _put_linear(out, "fc_layers.4", params["head"]["fc"])
    return out


def cifar_state_dict_from_params(params: Mapping[str, Any]) -> OrderedDict:
    """``init_cifar`` param tree -> reference CIFAR (pre)MetaNODE
    state_dict — the exact inverse of ``cifar_params_from_torch_state_dict``
    (same NF/PNF norm-free family contract: bias-free convs everywhere,
    one final linear; odenet_cifar10/layers.py:380-530).

    Norm-bearing trees (non-None ``bn*`` leaves) raise: their running
    statistics live in model_state and need a config-aware export.
    """
    out: OrderedDict = OrderedDict()
    _require_normfree(params.get("bn1"), "bn1")
    _put_conv(out, "conv1", params["conv1"])
    for lname in sorted(k for k in params if k.startswith("layer")):
        layer = params[lname]
        for kind, torch_kind, rhs in (("res", "blocks_res", ""),
                                      ("ode", "blocks_ode", "rhs_func.")):
            for i, b in enumerate(layer.get(kind, [])):
                prefix = f"{lname}.{torch_kind}.{i}."
                _require_normfree(b.get("bn1"), prefix + "bn1")
                _require_normfree(b.get("bn2"), prefix + "bn2")
                _require_normfree(b.get("sc_bn"), prefix + "sc_bn")
                _put_conv(out, prefix + rhs + "conv1", b["conv1"])
                _put_conv(out, prefix + rhs + "conv2", b["conv2"])
                if b.get("sc_conv") is not None:
                    _put_conv(out, prefix + "shortcut.0", b["sc_conv"])
    _put_linear(out, "fc_layers.2", params["fc"])
    return out


def _require_normfree(leaf, name: str):
    if leaf is not None:
        raise ValueError(
            f"norm-bearing param tree ({name} is not None) — only the "
            "norm-free NF/PNF family exports to the reference state_dict "
            "schema (running statistics need a config-aware export)"
        )


# ------------------------------------------------------------ torch.save --


def _torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked in here
        raise ImportError(
            "saving a reference .pth checkpoint needs torch on the "
            "exporting side; use *_state_dict_from_params for the "
            "torch-free mapping"
        ) from e
    return torch


def _tensor_state_dict(sd: Mapping[str, np.ndarray]):
    torch = _torch()
    # torch.tensor copies — the numpy views coming off JAX arrays are
    # read-only, and from_numpy on those warns about undefined behavior
    return OrderedDict((k, torch.tensor(np.asarray(v)))
                       for k, v in sd.items())


def save_mnist_reference_checkpoint(
    path: str,
    params: Mapping[str, Any],
    *,
    args: Optional[Mapping[str, Any]] = None,
    solver_id: int = 0,
) -> None:
    """Write a ``model_best_{id}.pth``-schema checkpoint the reference's
    ``load_model`` (sopa/src/models/utils.py:36-48) reconstructs.

    ``load_model`` destructures the top-level dict *by insertion order*
    (``(_, state_dict), (_, model_args), (_, solver_id) = ....items()``),
    so key order here is part of the format. ``args`` entries are merged
    over the minimal defaults ``load_model`` reads (``network``,
    ``downsampling_method``, ``in_channels``); pass e.g.
    ``{"solvers": [["rk2", "u", 8, -1, 0.5, -1]]}`` to make the artifact
    consumable by the reference's attacks_runner solver rebuild
    (odenet_mnist/attacks_runner.py:65).
    """
    import argparse

    torch = _torch()
    ns = {"network": "odenet", "downsampling_method": "conv",
          "in_channels": 1}
    ns.update(dict(args or {}))
    ckpt = OrderedDict()
    ckpt["state_dict"] = _tensor_state_dict(
        mnist_state_dict_from_params(params))
    ckpt["args"] = argparse.Namespace(**ns)
    ckpt["solver_id"] = solver_id
    torch.save(ckpt, path)


def reference_wandb_config(cfg, **extra) -> dict:
    """Build the ``wandb_config`` dict the reference Evaluate notebook
    rebuilds a CIFAR model from (cells 4-6): network/in_planes/is_odenet
    plus the 9 normalization/param-normalization/activation selector
    strings (examples/cifar10/train_and_attack.py:161-182).

    ``cfg`` is a :class:`CifarConfig`; the registry name is derived from
    its ``num_blocks``/``block_type`` when it matches a registry entry
    (the notebook does ``getattr(cifar10_models, config.network)``, so a
    non-registry ``num_blocks`` has no reference-side constructor and
    raises here). GeLUpoly/GeLUtanh export as ``GeLU`` — the reference
    registry has only the erf form, which they approximate to 3.4e-6 /
    3e-4 (models/nn.py).
    """
    from .odenet_cifar10 import MODEL_REGISTRY

    name = None
    for reg_name, factory in MODEL_REGISTRY.items():
        ref = factory()
        if (ref.num_blocks == cfg.num_blocks
                and ref.block_type == cfg.block_type):
            name = reg_name
            break
    if name is None:
        raise ValueError(
            f"num_blocks={cfg.num_blocks!r} block_type={cfg.block_type!r} "
            "matches no reference registry constructor "
            "(metanode*/premetanode*) — the reference cannot rebuild it "
            "from a wandb_config"
        )
    ref_act = {"GeLUpoly": "GeLU", "GeLUtanh": "GeLU"}
    config = {
        "network": name,
        "in_planes": cfg.in_planes,
        "is_odenet": cfg.is_odenet,
        "normalization_resblock": cfg.norms[0],
        "normalization_odeblock": cfg.norms[1],
        "normalization_bn1": cfg.norms[2],
        "param_normalization_resblock": cfg.param_norms[0],
        "param_normalization_odeblock": cfg.param_norms[1],
        "param_normalization_bn1": cfg.param_norms[2],
        "activation_resblock": ref_act.get(cfg.acts[0], cfg.acts[0]),
        "activation_odeblock": ref_act.get(cfg.acts[1], cfg.acts[1]),
        "activation_bn1": ref_act.get(cfg.acts[2], cfg.acts[2]),
    }
    config.update(extra)
    return config


def save_cifar_reference_checkpoint(
    path: str,
    params: Mapping[str, Any],
    cfg,
    *,
    iter: int = 0,
    wandb_config_extra: Optional[Mapping[str, Any]] = None,
) -> None:
    """Write an ``amp_checkpoint_{itr}.pth``-schema checkpoint
    (examples/cifar10/train_and_attack.py:548-557) the reference Evaluate
    notebook loads.

    The notebook consumes only ``model`` + ``wandb_config``; the
    reference's other slots (``optimizer``/``amp``/``lr_scheduler``) hold
    torch/apex state this framework does not produce (optax state is
    checkpointed natively via orbax) — they are emitted as ``None`` to
    keep the key schema intact for tooling that indexes by key.
    """
    torch = _torch()
    ckpt = OrderedDict()
    ckpt["model"] = _tensor_state_dict(cifar_state_dict_from_params(params))
    ckpt["optimizer"] = None
    ckpt["amp"] = None
    ckpt["lr_scheduler"] = None
    ckpt["iter"] = iter
    ckpt["wandb_config"] = reference_wandb_config(
        cfg, **dict(wandb_config_extra or {}))
    torch.save(ckpt, path)
