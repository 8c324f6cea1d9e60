"""Pallas megakernel: a full RK2 ODE-block solve resident in VMEM.

The flagship CIFAR configuration (premetanode10, NF norms, GeLU) has the
autonomous RHS  f(y) = conv2(gelu(conv1(gelu(y))))  (PreBasicBlock2 with
identity norms, odenet_cifar10/layers.py:148-161), integrated 8 RK2 steps.
Under XLA each conv round-trips the (N, H, W, C) activation through HBM:
~4 convs x n_steps reads+writes per solve.  The compiled flagship train step
measures **bandwidth-bound** (SCALING.md: 58% of HBM roofline), so the win
is locality, not FLOPs: this kernel tiles the batch, loads a tile's
activations into VMEM once, runs the ENTIRE n_steps x 2-stage solve there
(convs as 9 shifted MXU matmuls over a zero-padded copy), and writes the
final state once.  HBM traffic per solve drops from O(n_steps) tensor
round-trips to exactly one read + one write.

Scope: forward/inference path for the norm-free GeLU RHS (the flagship eval
configuration); training still uses the XLA path.  Falls back transparently
off-TPU; interpret mode exercises the same code in tests.

MEASURED OUTCOME (v5e, 256x32x32x64 bf16, 8 steps): 21.98 ms vs 9.11 ms for
the XLA lowering — the megakernel is 2.4x SLOWER despite the traffic
savings.  Two causes: (1) the nine 1-pixel spatial shifts misalign Mosaic's
(8, 128) tiling, forcing relayout copies per shifted matmul; (2) small
per-tile matmuls execute serially inside one grid program with no
DMA/compute overlap.  XLA's native TPU conv lowering already pipelines and
avoids the relayouts, so it wins.  Kept as a tested, documented experiment —
NOT wired into the model path (see SCALING.md "Pallas findings").
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

__all__ = ["ode_block_rk2_forward", "reference_ode_block_rk2"]


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf approximation (|error| <= 1.5e-7).

    Mosaic lowers neither erf nor erfc; this uses only mul/add/exp.
    """
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact (erf-based) GeLU to ~1.5e-7 (jax.nn.gelu(approximate=False)
    # parity); see _erf for why it is hand-rolled
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * (2.0 ** -0.5)))).astype(x.dtype)


def reference_ode_block_rk2(y0, w1, w2, u, n_steps, dtype=None):
    """jnp reference of the same computation (for tests / fallback).

    y0: (N, H, W, C); w1, w2: (3, 3, C, C) HWIO; u: rk2 parameter.
    """
    if dtype is not None:
        y0 = y0.astype(dtype)

    def f(y):
        h = lax.conv_general_dilated(
            _gelu(y), w1.astype(y.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return lax.conv_general_dilated(
            _gelu(h), w2.astype(y.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    b2 = 1.0 / (2.0 * u)
    b1 = 1.0 - b2
    dt = 1.0 / n_steps

    def step(y, _):
        k1 = f(y)
        k2 = f((y + (u * dt) * k1).astype(y.dtype))
        y1 = (y + dt * (b1 * k1 + b2 * k2)).astype(y.dtype)
        return y1, None

    y, _ = lax.scan(step, y0, None, length=n_steps)
    return y


def _conv3x3_vmem(x, w, h, wdt, c):
    """3x3 same-conv of a VMEM-resident (BN, H, W, C) tile via 9 shifted
    matmuls on the MXU.  Zero padding at the spatial borders is realized by
    slicing a padded scratch copy."""
    bn = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + h, dx : dx + wdt, :]
            flat = patch.reshape(bn * h * wdt, c)
            contrib = jnp.dot(flat, w[dy, dx],
                              preferred_element_type=jnp.float32)
            out = contrib if out is None else out + contrib
    return out.reshape(bn, h, wdt, c)


def _ode_block_kernel(y_ref, w1_ref, w2_ref, out_ref, *, h, wdt, c,
                      n_steps, u, compute_dtype):
    y = y_ref[:].astype(compute_dtype)
    w1 = w1_ref[:].astype(compute_dtype)
    w2 = w2_ref[:].astype(compute_dtype)

    b2 = 1.0 / (2.0 * u)
    b1 = 1.0 - b2
    dt = 1.0 / n_steps

    def f(yy):
        h1 = _conv3x3_vmem(_gelu(yy), w1, h, wdt, c).astype(compute_dtype)
        return _conv3x3_vmem(_gelu(h1), w2, h, wdt, c)

    for _ in range(n_steps):  # static unroll: the whole solve in VMEM
        k1 = f(y)
        k2 = f((y + (u * dt) * k1).astype(compute_dtype))
        y = (y + dt * (b1 * k1 + b2 * k2)).astype(compute_dtype)

    out_ref[:] = y.astype(out_ref.dtype)


def ode_block_rk2_forward(
    y0: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    u: float,
    n_steps: int,
    *,
    batch_tile: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """VMEM-resident RK2 solve of the norm-free GeLU double-conv RHS.

    Args:
      y0: (N, H, W, C) activations (f32 or bf16).
      w1, w2: (3, 3, C, C) HWIO conv kernels.
      u: static RK2 parameter (Python float — the tableau is baked into the
         kernel; use the XLA path for traced/trainable u).
      n_steps: static step count.
      batch_tile: images per kernel program (default: sized to ~6 MB VMEM
         working set).
    """
    n, h, wdt, c = y0.shape
    compute_dtype = y0.dtype
    if batch_tile is None:
        # size by the ACTUAL element width: an f32 input doubles the
        # working set vs bf16, so a hardcoded 2-byte assumption would
        # pick a 2x-too-large tile and blow the VMEM budget
        per_img = h * wdt * c * compute_dtype.itemsize
        # live set: y, k1, k2, padded copy, stage intermediate, f32 conv
        # accumulator (2x), plus double-buffered in/out blocks — ~12 tensor
        # equivalents must fit the 16 MB VMEM budget
        batch_tile = max(1, min(n, (2 * 1024 * 1024) // max(4 * per_img, 1)))
    while n % batch_tile:
        batch_tile -= 1

    kernel = functools.partial(
        _ode_block_kernel, h=h, wdt=wdt, c=c, n_steps=int(n_steps),
        u=float(u), compute_dtype=compute_dtype,
    )
    if pltpu is not None and not interpret:
        mem = {"memory_space": pltpu.VMEM}
    else:
        mem = {}
    return pl.pallas_call(
        kernel,
        grid=(n // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, h, wdt, c), lambda i: (i, 0, 0, 0),
                         **mem),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0), **mem),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((batch_tile, h, wdt, c),
                               lambda i: (i, 0, 0, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((n, h, wdt, c), y0.dtype),
        interpret=interpret,
    )(y0, w1, w2)
