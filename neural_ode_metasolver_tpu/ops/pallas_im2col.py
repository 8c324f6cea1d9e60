"""Aligned im2col/GEMM Pallas conv — the round-3 swing at the conv floor.

Round 2's profiler attribution (SCALING.md) put 99.3% of flagship step
time in XLA conv fusions running at ~55-60% of their own mixed roofline,
and diagnosed the round-1 Pallas megakernel's 2.4x loss as Mosaic (8,128)
tile misalignment from nine 1-pixel *shifted* matmuls inside the kernel
(`ops/pallas_ode_block.py`).  This module tries the one standard fix that
was never measured: reformulate conv3x3 as ONE dense GEMM over an im2col
patch matrix with perfectly aligned tiles.

  im2col (XLA):  x (N,H,W,C) -> pad -> 9 static slices concat on channels
                 -> A (N*H*W, 9C); XLA's pad/slice/concat fuse into fast
                 pipelined copies, so all misaligned data movement happens
                 OUTSIDE the kernel.
  GEMM (Pallas): A (M, K=9C) @ W (K, Cout) tiled (M_TILE, K) x (K, Cout),
                 f32 accumulation, lane-dim sizes padded to 128 multiples.

Tradeoff being measured: the GEMM kernel sees only aligned tiles (no
relayouts) but materializes 9x the activation bytes through HBM; the XLA
emitter re-reads overlapping windows from cache-resident tiles instead.
Measured outcome on-chip recorded in SCALING.md ("Pallas findings").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["conv3x3_im2col_gemm", "im2col_patches", "reference_conv3x3"]


def reference_conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """XLA conv3x3 SAME, NHWC x HWIO -> NHWC (the emitter to beat)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def im2col_patches(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N*H*W, 9*C) patch matrix via 9 static slices of a
    zero-padded copy (taps in (di, dj) row-major order, matching a
    (3, 3, C, Cout) kernel reshaped to (9C, Cout))."""
    n, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, di:di + h, dj:dj + wd, :]
         for di in range(3) for dj in range(3)],
        axis=-1,
    )
    return cols.reshape(n * h * wd, 9 * c)


def _gemm_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.dot(
        a_ref[...], b_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("m_tile", "interpret"))
def conv3x3_im2col_gemm(
    x: jax.Array,
    w: jax.Array,
    *,
    m_tile: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """conv3x3 SAME as im2col + aligned Pallas GEMM.

    ``x`` (N, H, W, C), ``w`` (3, 3, C, Cout).  K = 9C and Cout are
    zero-padded up to multiples of 128 so every Mosaic tile is aligned;
    the M grid dim tiles the patch rows.
    """
    n, h, wd, c = x.shape
    cout = w.shape[-1]
    a = im2col_patches(x)                       # (M, 9C)
    b = w.reshape(9 * c, cout).astype(x.dtype)  # (9C, Cout)

    m, k = a.shape
    k_pad = (-k) % 128
    co_pad = (-cout) % 128
    if k_pad:
        a = jnp.pad(a, ((0, 0), (0, k_pad)))
        b = jnp.pad(b, ((0, k_pad), (0, 0)))
    if co_pad:
        b = jnp.pad(b, ((0, 0), (0, co_pad)))
    if m % m_tile:
        raise ValueError(f"M={m} not divisible by m_tile={m_tile}")

    out = pl.pallas_call(
        _gemm_kernel,
        grid=(m // m_tile,),
        in_specs=[
            pl.BlockSpec((m_tile, a.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((a.shape[1], b.shape[1]), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_tile, b.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, b.shape[1]), x.dtype),
        interpret=interpret,
    )(a, b)
    return out[:, :cout].reshape(n, h, wd, cout)
