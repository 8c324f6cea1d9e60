"""Validate + microbenchmark the Pallas fused GroupNorm+act kernel on real TPU.

Run: python scripts/pallas_tpu_check.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from neural_ode_metasolver_tpu.ops.pallas_kernels import (
    fused_group_norm_act,
    group_norm_reference,
)


def bench(fn, x, *args, iters=50):
    """Chained timing: each iteration consumes the previous output, and the
    final sum is pulled to host — the remote platform's block_until_ready
    alone under-reports (returns before execution completes)."""
    out = fn(x, *args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        cur = fn(cur, *args)
    float(jnp.sum(cur))
    return (time.perf_counter() - t0) / iters, fn(x, *args)


def main():
    print(jax.devices())
    for (n, h, w, c, g) in [(256, 32, 32, 64, 32), (256, 16, 16, 128, 32),
                            (128, 6, 6, 64, 32)]:
        kx, ks, kb = jax.random.split(jax.random.key(0), 3)
        x = jax.random.normal(kx, (n, h, w, c), jnp.float32)
        scale = jax.random.uniform(ks, (c,), jnp.float32) + 0.5
        bias = jax.random.normal(kb, (c,), jnp.float32)

        fused = jax.jit(
            lambda x, s, b: fused_group_norm_act(x, s, b, g, 1e-5, "relu")
        )
        ref = jax.jit(
            lambda x, s, b: group_norm_reference(x, s, b, g, 1e-5, "relu")
        )
        t_f, out_f = bench(fused, x, scale, bias)
        t_r, out_r = bench(ref, x, scale, bias)
        err = float(jnp.max(jnp.abs(out_f - out_r)))
        bytes_ = x.size * 4 * 2  # read + write
        print(
            f"({n},{h},{w},{c}) g={g}: pallas {t_f*1e6:8.1f}us "
            f"({bytes_/t_f/1e9:6.1f} GB/s)  xla {t_r*1e6:8.1f}us "
            f"({bytes_/t_r/1e9:6.1f} GB/s)  max|diff|={err:.2e}"
        )
        assert err < 1e-3, "pallas kernel mismatch on TPU"
    print("pallas TPU check OK")


if __name__ == "__main__":
    main()
