#!/usr/bin/env python
"""Serving-path throughput on the real chip: exported StableHLO artifact
vs direct jit, f32 vs bf16.

The reference has no serving story at all (deployment = pickle the torch
module, examples/mnist/train_and_attack.py:319); this measures the
TPU-native one (`serving.py`): the flagship premetanode10 forward
(8-step RK2 u=0.5, standalone) exported via jax.export and called as a
black-box artifact.

Timing per SCALING.md methodology: chained dispatch of N calls, then one
host transfer to drain the stream; artifact inputs are device arrays (no
per-call upload).

  python scripts/bench_serving.py [batch] [acts]

``acts`` (default GeLU) lets the serving measurement ride the activation
registry — e.g. GeLUpoly (parity-grade fast exact GELU, SCALING.md
"erf-GELU tax") or GeLUtanh.
"""
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench_env  # noqa: E402

bench_env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N_CALLS = 50


def _time_fn(fn, x, n=N_CALLS):
    out = fn(x)  # warmup / compile
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(x)
    float(jnp.sum(out))  # drain the dispatch stream
    return (time.perf_counter() - t0) / n


def main(batch=256, acts="GeLU"):
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions, parse_solver_dsl
    from neural_ode_metasolver_tpu.serving import export_model, load_model
    from neural_ode_metasolver_tpu.training.train import _cast_model

    model = build_model("premetanode10", in_planes=64, acts=(acts,) * 3)
    solvers = parse_solver_dsl("rk2,u,8,-1,0.5,-1")
    opts = SolverOptions()
    params, state = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (batch, 32, 32, 3), jnp.float32)

    rows = []

    def direct(m):
        def f(xi):
            logits, _, _ = m.apply(params, state, xi, solvers, opts)
            return logits
        return jax.jit(f)

    for name, m in [("direct_jit_f32", model),
                    ("direct_jit_bf16", _cast_model(model, jnp.bfloat16))]:
        dt = _time_fn(direct(m), x)
        rows.append({"config": name, "ms_per_call": round(dt * 1e3, 2),
                     "img_per_s": round(batch / dt, 1)})
        print(json.dumps(rows[-1]), flush=True)

    for name, m in [("served_stablehlo_f32", model),
                    ("served_stablehlo_bf16", _cast_model(model, jnp.bfloat16))]:
        with tempfile.TemporaryDirectory() as d:
            export_model(d, m, params, state, solvers, opts,
                         input_shape=(batch, 32, 32, 3),
                         batch_polymorphic=True)
            served = load_model(d)
            dt = _time_fn(served, x)
            rows.append({"config": name, "ms_per_call": round(dt * 1e3, 2),
                         "img_per_s": round(batch / dt, 1)})
            print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"batch": batch, "acts": acts, "n_calls": N_CALLS,
                      "rows": rows}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         sys.argv[2] if len(sys.argv) > 2 else "GeLU")
