"""Import trained reference (torch) checkpoints into JAX param trees.

The reference ships trained artifacts as pickled torch modules /
state_dicts (``sopa/src/models/utils.py:36`` ``load_model``,
``examples/mnist/checkpoints/checkpoint_15444.pth``).  A user migrating
from the reference can convert those weights into this package's MNIST
MetaNODE params and keep serving the exact trained model — layout
conversions are torch OIHW conv -> JAX HWIO kernel, torch (out, in)
linear -> JAX (in, out) kernel, and norm ``weight``/``bias`` ->
``scale``/``bias``.

This module is torch-free: it consumes any mapping of state_dict names to
array-likes (torch cpu tensors, numpy arrays, lists).  Do the
``torch.load`` on the caller side, e.g.::

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = mnist_params_from_torch_state_dict(sd)
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

__all__ = [
    "mnist_params_from_torch_state_dict",
    "cifar_params_from_torch_state_dict",
]


def _arr(sd: Mapping[str, Any], name: str) -> np.ndarray:
    if name not in sd:
        raise KeyError(
            f"state_dict is missing {name!r} — not a conv-downsampling "
            f"odenet MNIST MetaNODE checkpoint? keys: {sorted(sd)[:8]}..."
        )
    return np.asarray(sd[name], dtype=np.float32)


def _oihw_to_hwio(arr):
    """torch Conv2d weight (O, I, H, W) -> JAX kernel (H, W, I, O) — the
    ONE place the conv layout conversion lives (both importers use it)."""
    return jnp.asarray(arr.transpose(2, 3, 1, 0))


def _conv(sd, prefix):
    out = {"kernel": _oihw_to_hwio(_arr(sd, prefix + ".weight"))}
    if prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(_arr(sd, prefix + ".bias"))
    return out


def _norm(sd, prefix):
    return {
        "scale": jnp.asarray(_arr(sd, prefix + ".weight")),
        "bias": jnp.asarray(_arr(sd, prefix + ".bias")),
    }


def _linear(sd, prefix):
    out = {"kernel": jnp.asarray(_arr(sd, prefix + ".weight").T)}
    if prefix + ".bias" in sd:
        out["bias"] = jnp.asarray(_arr(sd, prefix + ".bias"))
    return out


def cifar_params_from_torch_state_dict(sd: Mapping[str, Any],
                                       block_type: str = "prebasic"):
    """Convert a reference CIFAR (pre)MetaNODE state_dict into
    ``init_cifar``'s param-tree layout (odenet_cifar10/layers.py:380-530).

    Covers the norm-free flagship family (NF/PNF configs — bias-free convs
    everywhere, one final linear).  Name map:

      ``conv1.weight``                              -> ``conv1.kernel``
      ``layerL.blocks_res.i.conv{1,2}.weight``      -> ``layerL.res[i].conv{1,2}.kernel``
      ``layerL.blocks_res.i.shortcut.0.weight``     -> ``layerL.res[i].sc_conv.kernel``
      ``layerL.blocks_ode.i.rhs_func.conv{1,2}.weight`` -> ``layerL.ode[i].conv{1,2}.kernel``
      ``fc_layers.K.{weight,bias}``                 -> ``fc.{kernel,bias}``

    Norm-bearing checkpoints (BN/GN weights present) raise with the
    offending keys — their running statistics belong in model_state and
    need a config-aware import.

    ``block_type``: ``"prebasic"`` (premetanode*, default) or ``"basic"``
    (metanode*) — NF checkpoints have identical torch names for both, but
    ``init_cifar`` emits an extra ``sc_bn=None`` leaf on basic-block
    shortcuts (odenet_cifar10.py:109-110), so the target family must be
    stated for the imported tree to be structure-identical.
    """
    import re

    if block_type not in ("prebasic", "basic"):
        raise ValueError(f"unknown block_type {block_type!r}")
    out: dict = {}
    unknown = []
    for name, v in sd.items():
        arr = np.asarray(v, dtype=np.float32)
        if name == "conv1.weight":
            out.setdefault("conv1", {})["kernel"] = _oihw_to_hwio(arr)
            continue
        m = re.fullmatch(
            r"layer(\d+)\.blocks_(res|ode)\.(\d+)\."
            r"(?:rhs_func\.)?conv([12])\.weight",
            name,
        )
        if m:
            layer, kind, idx, ci = m.groups()
            blocks = out.setdefault(f"layer{layer}", {}).setdefault(kind, {})
            blocks.setdefault(int(idx), {})[f"conv{ci}"] = {
                "kernel": _oihw_to_hwio(arr)
            }
            continue
        m = re.fullmatch(
            r"layer(\d+)\.blocks_res\.(\d+)\.shortcut\.0\.weight", name
        )
        if m:
            layer, idx = m.groups()
            blocks = out.setdefault(f"layer{layer}", {}).setdefault("res", {})
            blocks.setdefault(int(idx), {})["sc_conv"] = {
                "kernel": _oihw_to_hwio(arr)
            }
            continue
        m = re.fullmatch(r"fc_layers\.\d+\.(weight|bias)", name)
        if m:
            fc = out.setdefault("fc", {})
            slot = "kernel" if m.group(1) == "weight" else "bias"
            if slot in fc:
                raise ValueError(
                    f"multiple linear layers in fc_layers ({name} would "
                    "overwrite an earlier one) — unsupported head layout"
                )
            fc[slot] = jnp.asarray(arr.T if slot == "kernel" else arr)
            continue
        unknown.append(name)
    if unknown:
        raise ValueError(
            "unsupported state_dict entries (norm-bearing checkpoints need "
            f"a config-aware import): {unknown}"
        )
    # index dicts -> lists, matching init_cifar's block lists.  init_cifar
    # always emits BOTH kinds per layer (odenet_cifar10.py:253), so a layer
    # with zero blocks of one kind (e.g. premetanode4: no res blocks;
    # is_odenet=False: no ode blocks) still needs the empty list — apply
    # would KeyError otherwise.  NF norms are None leaves ('bn1'/'bn2' per
    # block plus the top-level 'bn1'); emit them too so the imported tree
    # is structure-identical to init_cifar's (tx.init / device_put /
    # tree_map against an init tree all require it).
    for lname, layer in out.items():
        if not lname.startswith("layer"):
            continue
        for kind in ("res", "ode"):
            blocks = layer.get(kind, {})
            for b in blocks.values():
                b.setdefault("bn1", None)
                b.setdefault("bn2", None)
                if (kind == "res" and block_type == "basic"
                        and "sc_conv" in b):
                    # BasicBlock shortcuts carry a norm slot (None under NF)
                    b.setdefault("sc_bn", None)
            layer[kind] = [blocks[i] for i in sorted(blocks)]
    out.setdefault("bn1", None)
    return out


def mnist_params_from_torch_state_dict(sd: Mapping[str, Any]):
    """Convert a reference MNIST MetaNODE state_dict into ``init_mnist``'s
    param-tree layout (odenet, conv downsampling — layers.py:96-209).

    Expected names: ``downsampling_layers.{0,3,6}`` convs with norms at
    ``{1,4}``, one ``blocks.0.rhs_func`` ODEfunc (norm1/conv1/norm2/conv2/
    norm3 with ConcatConv2d ``._layer`` nesting), and a
    ``fc_layers.{0,4}`` head (norm + linear).  Any OTHER entry (extra ODE
    blocks, res-downsampling variants) raises rather than being silently
    dropped.
    """
    expected = set()
    for prefix in ("downsampling_layers.0", "downsampling_layers.3",
                   "downsampling_layers.6", "blocks.0.rhs_func.conv1._layer",
                   "blocks.0.rhs_func.conv2._layer", "fc_layers.4"):
        expected.update({prefix + ".weight", prefix + ".bias"})
    for prefix in ("downsampling_layers.1", "downsampling_layers.4",
                   "blocks.0.rhs_func.norm1", "blocks.0.rhs_func.norm2",
                   "blocks.0.rhs_func.norm3", "fc_layers.0"):
        expected.update({prefix + ".weight", prefix + ".bias"})
    extra = sorted(set(sd) - expected)
    if extra:
        raise ValueError(
            "state_dict has entries this importer does not map (a different "
            f"MetaNODE variant?): {extra}"
        )
    return {
        "down": {
            "conv0": _conv(sd, "downsampling_layers.0"),
            "norm0": _norm(sd, "downsampling_layers.1"),
            "conv1": _conv(sd, "downsampling_layers.3"),
            "norm1": _norm(sd, "downsampling_layers.4"),
            "conv2": _conv(sd, "downsampling_layers.6"),
        },
        "blocks": [
            {
                "norm1": _norm(sd, "blocks.0.rhs_func.norm1"),
                "conv1": _conv(sd, "blocks.0.rhs_func.conv1._layer"),
                "norm2": _norm(sd, "blocks.0.rhs_func.norm2"),
                "conv2": _conv(sd, "blocks.0.rhs_func.conv2._layer"),
                "norm3": _norm(sd, "blocks.0.rhs_func.norm3"),
            }
        ],
        "head": {
            "norm": _norm(sd, "fc_layers.0"),
            "fc": _linear(sd, "fc_layers.4"),
        },
    }
