"""MNIST MetaNODE: conv/res downsampling -> one meta-ODE block -> GN head.

Re-design of ``sopa/src/models/odenet_mnist/layers.py`` as pure init/apply
functions.  Architecture parity (layers.py:96-209):

  downsampling 'conv': Conv(in,64,k3,s1) -> GN -> ReLU -> Conv(64,64,k4,s2,p1)
                       -> GN -> ReLU -> Conv(64,64,k4,s2,p1)
  downsampling 'res':  Conv(in,64,k3,s1) -> ResBlock(s2) -> ResBlock(s2)
  ODE RHS (ODEfunc):   GN -> ReLU -> ConcatConv2d(t) -> GN -> ReLU ->
                       ConcatConv2d(t) -> GN        (layers.py:134-171)
  head:                GN -> ReLU -> AvgPool(1,1) -> Flatten -> Linear(64,10)

Faithful-behavior notes:
  * ``activation_type`` is accepted but the reference's ODEfunc constructs the
    requested activation and then *uses ReLU anyway* in forward
    (layers.py:139-151 vs :162-166).  We match the executed behavior (ReLU);
    set ``use_activation_type=True`` for the evidently-intended behavior.
  * ``ss_loss`` re-integrates over t in [1, 2] from the block output and
    penalizes mean ||z(2) - z(1)||_2 (layers.py:53-93).  The reference's
    ``partial(rhs, ss_loss=True).func`` bug silently drops the |RHS| variant
    (SURVEY.md quirk 4); ``ss_loss_abs=False`` (default) matches that executed
    behavior, True enables the intended absolute-value RHS.

The NFE counter of the reference (layers.py:156-159) is statically derivable
here: ``nfe = sum(n_steps_i * stages_i)`` per solve — see
:func:`neural_ode_metasolver_tpu.training.metrics.nfe_per_forward`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.regimes import SolverOptions, meta_integrate
from . import nn as fnn

Array = jax.Array
Params = Dict[str, Any]


@dataclass(frozen=True)
class MnistConfig:
    downsampling_method: str = "conv"  # 'conv' | 'res'
    is_odenet: bool = True
    activation_type: str = "relu"
    use_activation_type: bool = False  # False = faithful (ReLU always)
    in_channels: int = 1
    dim: int = 64
    num_classes: int = 10


def _norm_groups(dim: int) -> int:
    return min(32, dim)  # reference norm() (layers.py:208)


def _act(cfg: MnistConfig):
    if not cfg.use_activation_type:
        return jax.nn.relu
    return {
        "tanh": jnp.tanh,
        "softplus": jax.nn.softplus,
        "softsign": jax.nn.soft_sign,
        "relu": jax.nn.relu,
    }[cfg.activation_type]


# ----------------------------------------------------------- sub-modules --


def _odefunc_init(key: Array, dim: int) -> Params:
    ks = jax.random.split(key, 2)
    return {
        "norm1": fnn.group_norm_init(dim),
        "conv1": fnn.conv2d_init(ks[0], dim + 1, dim, 3),  # ConcatConv2d
        "norm2": fnn.group_norm_init(dim),
        "conv2": fnn.conv2d_init(ks[1], dim + 1, dim, 3),
        "norm3": fnn.group_norm_init(dim),
    }


def _concat_conv(params: Params, t: Array, x: Array) -> Array:
    """ConcatConv2d (layers.py:240-253): append a constant-t channel, conv."""
    tt = jnp.full(x.shape[:-1] + (1,), t, dtype=x.dtype)
    return fnn.conv2d(params, jnp.concatenate([tt, x], axis=-1), padding=1)


def _odefunc_apply(
    params: Params, t: Array, x: Array, act, ss_abs: bool = False
) -> Array:
    g = _norm_groups(x.shape[-1])
    out = fnn.group_norm(params["norm1"], x, g)
    out = act(out)
    out = _concat_conv(params["conv1"], t, out)
    out = fnn.group_norm(params["norm2"], out, g)
    out = act(out)
    out = _concat_conv(params["conv2"], t, out)
    out = fnn.group_norm(params["norm3"], out, g)
    if ss_abs:
        out = jnp.abs(out)
    return out


def _resblock_init(
    key: Array, inplanes: int, planes: int, downsample: bool
) -> Params:
    ks = jax.random.split(key, 3)
    p: Params = {
        "norm1": fnn.group_norm_init(inplanes),
        "conv1": fnn.conv2d_init(ks[0], inplanes, planes, 3, use_bias=False),
        "norm2": fnn.group_norm_init(planes),
        "conv2": fnn.conv2d_init(ks[1], planes, planes, 3, use_bias=False),
    }
    if downsample:
        p["downsample"] = fnn.conv2d_init(ks[2], inplanes, planes, 1,
                                          use_bias=False)
    return p


def _resblock_apply(params: Params, x: Array, stride: int) -> Array:
    """MNIST ResBlock (layers.py:212-237): pre-act, downsample on the
    activated tensor."""
    out = jax.nn.relu(
        fnn.group_norm(params["norm1"], x, _norm_groups(x.shape[-1]))
    )
    shortcut = x
    if "downsample" in params:
        shortcut = fnn.conv2d(params["downsample"], out, stride=stride)
    out = fnn.conv2d(params["conv1"], out, stride=stride, padding=1)
    out = fnn.group_norm(params["norm2"], out, _norm_groups(out.shape[-1]))
    out = jax.nn.relu(out)
    out = fnn.conv2d(params["conv2"], out, padding=1)
    return out + shortcut


# ----------------------------------------------------------------- model --


def init_mnist(key: Array, cfg: MnistConfig = MnistConfig()) -> Params:
    keys = jax.random.split(key, 16)
    dim = cfg.dim
    params: Params = {}
    if cfg.downsampling_method == "conv":
        params["down"] = {
            "conv0": fnn.conv2d_init(keys[0], cfg.in_channels, dim, 3),
            "norm0": fnn.group_norm_init(dim),
            "conv1": fnn.conv2d_init(keys[1], dim, dim, 4),
            "norm1": fnn.group_norm_init(dim),
            "conv2": fnn.conv2d_init(keys[2], dim, dim, 4),
        }
    elif cfg.downsampling_method == "res":
        params["down"] = {
            "conv0": fnn.conv2d_init(keys[0], cfg.in_channels, dim, 3),
            "res1": _resblock_init(keys[1], dim, dim, downsample=True),
            "res2": _resblock_init(keys[2], dim, dim, downsample=True),
        }
    else:
        raise ValueError(cfg.downsampling_method)

    if cfg.is_odenet:
        params["blocks"] = [_odefunc_init(keys[3], dim)]
    else:
        params["blocks"] = [
            _resblock_init(keys[3 + i], dim, dim, downsample=False)
            for i in range(6)
        ]

    params["head"] = {
        "norm": fnn.group_norm_init(dim),
        "fc": fnn.linear_init(keys[10], dim, cfg.num_classes),
    }
    return params


def _downsample(params: Params, x: Array, cfg: MnistConfig) -> Array:
    d = params["down"]
    if cfg.downsampling_method == "conv":
        g = _norm_groups(cfg.dim)
        x = fnn.conv2d(d["conv0"], x, stride=1, padding=0)
        x = jax.nn.relu(fnn.group_norm(d["norm0"], x, g))
        x = fnn.conv2d(d["conv1"], x, stride=2, padding=1)
        x = jax.nn.relu(fnn.group_norm(d["norm1"], x, g))
        x = fnn.conv2d(d["conv2"], x, stride=2, padding=1)
    else:
        x = fnn.conv2d(d["conv0"], x, stride=1, padding=0)
        x = _resblock_apply(d["res1"], x, stride=2)
        x = _resblock_apply(d["res2"], x, stride=2)
    return x


def apply_mnist(
    params: Params,
    x: Array,
    solvers: Optional[Sequence] = None,
    solver_options: SolverOptions = SolverOptions(),
    *,
    cfg: MnistConfig = MnistConfig(),
    key: Optional[Array] = None,
    ss_loss: bool = False,
    ss_loss_abs: bool = False,
    remat: bool = False,
    unroll: int = 1,
    integration_method: str = "backprop",
) -> Tuple[Array, Dict[str, Array]]:
    """Forward pass.  Returns ``(logits, aux)`` with ``aux['ss_loss']``.

    ``x`` is NHWC.  For ODE mode, ``solvers`` + ``solver_options`` pick the
    meta-solver regime; ``key`` seeds switch/ensemble choices.
    """
    act = _act(cfg)
    x = _downsample(params, x, cfg)

    ss_total = jnp.zeros((), x.dtype)
    if cfg.is_odenet:
        for i, block in enumerate(params["blocks"]):
            bkey = None
            if key is not None:
                key, bkey = jax.random.split(key)
            rhs = lambda t, y, _p=block: _odefunc_apply(_p, t, y, act)
            x, aux = meta_integrate(
                solvers, rhs, x, solver_options, bkey,
                remat=remat, unroll=unroll,
                adjoint=integration_method == "adjoint",
                rhs_params=block,
                rhs_with_params=lambda p, t, y: _odefunc_apply(p, t, y, act),
            )
            if ss_loss:
                # Re-integrate t in [1, 2] from the block output, replaying
                # the same regime choice (layers.py:53-93).
                rhs_ss = lambda t, y, _p=block: _odefunc_apply(
                    _p, t, y, act, ss_abs=ss_loss_abs
                )
                z, _ = meta_integrate(
                    solvers, rhs_ss, x, solver_options, None,
                    t0=1.0, t1=2.0, aux_in=aux,
                    remat=remat, unroll=unroll,
                )
                # f32 reduction (same rationale as the CIFAR ss-loss path)
                diff = (z - x).reshape(x.shape[0], -1).astype(jnp.float32)
                ss_total = ss_total + jnp.mean(
                    jnp.linalg.norm(diff, axis=1)
                ).astype(ss_total.dtype)
    else:
        for block in params["blocks"]:
            x = _resblock_apply(block, x, stride=1)

    h = params["head"]
    x = jax.nn.relu(fnn.group_norm(h["norm"], x, _norm_groups(cfg.dim)))
    x = fnn.global_avg_pool(x)
    logits = fnn.linear(h["fc"], x)
    return logits, {"ss_loss": ss_total}
