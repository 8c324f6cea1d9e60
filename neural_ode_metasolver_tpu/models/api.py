"""Uniform model interface for the training/eval engine.

A ``Model`` bundles ``init(key) -> (params, state)`` and a uniform
``apply(params, state, x, solvers, solver_options, *, key, train, ss_loss,
ss_loss_abs, remat, unroll) -> (logits, new_state, aux)`` regardless of the
underlying family (the MNIST net is stateless; its adapter threads an empty
state dict).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Tuple

import jax

from .odenet_cifar10 import CifarConfig, apply_cifar, init_cifar
from .odenet_mnist import MnistConfig, apply_mnist, init_mnist

Array = jax.Array


def _solver_args(cfg, solvers, solver_options):
    """Normalize the adapter's optional solver args: a None options
    record means the default SolverOptions(); a missing solver list on an
    ODE-mode config is a clear error here instead of a TypeError deep in
    meta_integrate."""
    if solver_options is None:
        from ..ops.regimes import SolverOptions

        solver_options = SolverOptions()
    if solvers is None and getattr(cfg, "is_odenet", True):
        raise ValueError(
            "this config integrates ODE blocks: pass solvers=[...] "
            "(e.g. [create_solver('rk2', 'u', n_steps=8, u0=0.5)])"
        )
    return solvers, solver_options

__all__ = ["Model", "make_mnist_model", "make_cifar_model", "build_model"]


@dataclass(frozen=True)
class Model:
    init: Callable[[Array], Tuple[Any, Any]]
    apply: Callable[..., Tuple[Array, Any, Dict[str, Array]]]
    cfg: Any
    input_shape: Tuple[int, int, int]  # (H, W, C)


def make_mnist_model(cfg: MnistConfig = MnistConfig()) -> Model:
    def init(key):
        return init_mnist(key, cfg), {}

    def apply(params, state, x, solvers=None, solver_options=None, *,
              key=None, train=False, ss_loss=False, ss_loss_abs=False,
              remat=False, unroll=1, integration_method="backprop"):
        del train  # MNIST net is stateless (GN only)
        solvers, solver_options = _solver_args(cfg, solvers, solver_options)
        logits, aux = apply_mnist(
            params, x, solvers, solver_options, cfg=cfg, key=key,
            ss_loss=ss_loss, ss_loss_abs=ss_loss_abs, remat=remat,
            unroll=unroll, integration_method=integration_method,
        )
        return logits, state, aux

    return Model(init=init, apply=apply, cfg=cfg,
                 input_shape=(28, 28, cfg.in_channels))


def make_cifar_model(cfg: CifarConfig = CifarConfig(), *,
                     pipeline=None) -> Model:
    """``pipeline`` (a ``parallel.PipelineConfig``) makes the forward route
    same-shape ODE-block stacks through GPipe over its mesh's pp axis —
    the deep-registry (metanode34/premetanode34 and custom multi-ODE
    configs) sharding the `--mesh pp=` CLI axis maps to."""

    def init(key):
        return init_cifar(key, cfg)

    def apply(params, state, x, solvers=None, solver_options=None, *,
              key=None, train=False, ss_loss=False, ss_loss_abs=False,
              remat=False, unroll=1, integration_method="backprop"):
        solvers, solver_options = _solver_args(cfg, solvers, solver_options)
        return apply_cifar(
            params, state, x, solvers, solver_options, cfg=cfg, key=key,
            train=train, ss_loss=ss_loss, ss_loss_abs=ss_loss_abs,
            remat=remat, unroll=unroll, integration_method=integration_method,
            pipeline=pipeline,
        )

    return Model(init=init, apply=apply, cfg=cfg, input_shape=(32, 32, 3))


def build_model(name: str, **overrides) -> Model:
    """Registry entry point: 'mnist' or any metanode*/premetanode* name."""
    if name == "mnist":
        return make_mnist_model(MnistConfig(**overrides))
    from .odenet_cifar10 import MODEL_REGISTRY

    if name in MODEL_REGISTRY:
        return make_cifar_model(MODEL_REGISTRY[name](**overrides))
    raise ValueError(f"unknown model {name!r}")
