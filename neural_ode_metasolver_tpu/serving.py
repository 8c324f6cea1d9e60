"""Serving export: freeze a trained MetaNODE into a portable StableHLO
artifact.

The reference's deployment story is "pickle the torch module"
(examples/mnist/train_and_attack.py:319) — loading requires the training
codebase.  The TPU-native equivalent is ahead-of-time export: the jitted
forward (params baked in or passed at call time) is serialized as
versioned StableHLO via ``jax.export``, loadable and callable from any
JAX process — no model code, no Python class definitions, stable across
releases — and compilable for TPU or CPU.

Artifacts are a directory::

    <path>/model.stablehlo   serialized exported function
    <path>/config.json       model/solver metadata for provenance

Example::

    export_model(dir, model, params, state, solvers, opts,
                 input_shape=(1, 32, 32, 3))
    served = load_model(dir)
    logits = served(x)          # any batch size if batch_polymorphic
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_model", "load_model", "ServedModel"]


def export_model(
    path: str,
    model,
    params,
    state,
    solvers,
    solver_options,
    *,
    input_shape: Tuple[int, ...],
    input_dtype=jnp.float32,
    batch_polymorphic: bool = True,
    platforms: Optional[Sequence[str]] = None,
    config: Optional[dict] = None,
) -> None:
    """Serialize ``model.apply`` with the given weights/solvers baked in.

    ``input_shape`` includes the batch dim; with ``batch_polymorphic`` the
    exported function accepts ANY batch size (symbolic leading dim).
    ``platforms`` defaults to the current backend; pass
    ``("tpu", "cpu")`` for a single artifact servable on both.
    """

    def forward(x):
        logits, _, _ = model.apply(params, state, x, solvers, solver_options)
        return logits

    if batch_polymorphic:
        dims = jax_export.symbolic_shape(
            "b, " + ", ".join(str(d) for d in input_shape[1:])
        )
        arg = jax.ShapeDtypeStruct(dims, input_dtype)
    else:
        arg = jax.ShapeDtypeStruct(tuple(input_shape), input_dtype)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(forward), **kwargs)(arg)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    # user config first: the reserved keys describe the artifact itself and
    # must win — a colliding user entry would desynchronize config.json
    # from the serialized StableHLO (wrong shape/dtype/platforms on load)
    meta = {
        **(config or {}),
        "input_shape": list(input_shape),
        "input_dtype": jnp.dtype(input_dtype).name,
        "batch_polymorphic": batch_polymorphic,
        "platforms": list(exported.platforms),
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(meta, f, indent=1)


class ServedModel:
    """A loaded export: call it like a function; weights are inside."""

    def __init__(self, exported, config: dict):
        self._exported = exported
        self.config = config

    def __call__(self, x):
        return self._exported.call(x)


def load_model(path: str) -> ServedModel:
    """Load an :func:`export_model` artifact.  Needs only jax — none of
    the model-building code."""
    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    cfg_path = os.path.join(path, "config.json")
    config = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return ServedModel(exported, config)
