"""On-chip A/B: XLA conv3x3 emitter vs the aligned im2col/GEMM Pallas conv
(`ops/pallas_im2col.py`) on the flagship shape (256 x 32 x 32 x 64 bf16).

Timing per SCALING.md methodology: a jitted fori_loop chains R dependent
conv applications (dispatch amortized, no per-call host sync); wall time
over the chain / R = per-conv time.  Results recorded in SCALING.md
"Pallas findings".

Run on the real chip (no cpu forcing):  python scripts/bench_im2col.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402

bench_env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_ode_metasolver_tpu.ops.pallas_im2col import (  # noqa: E402
    conv3x3_im2col_gemm,
    reference_conv3x3,
)

N, H, W, C = 256, 32, 32, 64
R = 50        # chained convs per call
CALLS = 5


def chain(fn):
    @jax.jit
    def run(x, w):
        return jax.lax.fori_loop(0, R, lambda i, y: fn(y, w), x)

    return run


def timeit(run, x, w, label):
    y = run(x, w)
    float(jnp.sum(y.astype(jnp.float32)))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(CALLS):
        y = run(y, w)
    float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (CALLS * R)
    print(f"{label}: {dt * 1e3:.3f} ms/conv")
    return dt


def main():
    kx, kw = jax.random.split(jax.random.key(0))
    x = (jax.random.normal(kx, (N, H, W, C)) * 0.1).astype(jnp.bfloat16)
    w = (jax.random.normal(kw, (3, 3, C, C)) * 0.01).astype(jnp.bfloat16)

    # correctness on-chip first (bf16 tolerance)
    ref = reference_conv3x3(x[:8], w)
    got = conv3x3_im2col_gemm(x[:8], w, m_tile=1024)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"max abs err vs XLA conv (batch 8): {err:.2e}")

    dt_xla = timeit(chain(lambda y, w_: reference_conv3x3(y, w_)), x, w,
                    "XLA conv emitter")
    results = {"xla_ms": dt_xla * 1e3, "err": err}
    for mt in (512, 1024, 2048):
        dt = timeit(
            chain(lambda y, w_, mt=mt: conv3x3_im2col_gemm(y, w_, m_tile=mt)),
            x, w, f"im2col+Pallas GEMM (m_tile={mt})",
        )
        results[f"pallas_mt{mt}_ms"] = dt * 1e3
    print(json.dumps(results))


if __name__ == "__main__":
    main()
