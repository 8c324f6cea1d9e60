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

__all__ = ["mnist_params_from_torch_state_dict"]


def _arr(sd: Mapping[str, Any], name: str) -> np.ndarray:
    if name not in sd:
        raise KeyError(
            f"state_dict is missing {name!r} — not a conv-downsampling "
            f"odenet MNIST MetaNODE checkpoint? keys: {sorted(sd)[:8]}..."
        )
    return np.asarray(sd[name], dtype=np.float32)


def _conv(sd, prefix):
    # torch Conv2d weight (O, I, H, W) -> JAX kernel (H, W, I, O)
    out = {"kernel": jnp.asarray(_arr(sd, prefix + ".weight").transpose(2, 3, 1, 0))}
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


def mnist_params_from_torch_state_dict(sd: Mapping[str, Any]):
    """Convert a reference MNIST MetaNODE state_dict into ``init_mnist``'s
    param-tree layout (odenet, conv downsampling — layers.py:96-209).

    Expected names: ``downsampling_layers.{0,3,6}`` convs with norms at
    ``{1,4}``, one ``blocks.0.rhs_func`` ODEfunc (norm1/conv1/norm2/conv2/
    norm3 with ConcatConv2d ``._layer`` nesting), and a
    ``fc_layers.{0,4}`` head (norm + linear).
    """
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
