#!/usr/bin/env python
"""Flagship-step throughput probe for one activation registry key.

Measures the bench.py workload (premetanode10 in_planes=64, 8-step RK2
u=0.5, FGSM-random adversarial step, bf16, unroll=8, bundle fusion flag)
on the real chip with the given activation, so activation variants are
compared on the program that actually ships.  Evidence from the round-3
erf-GELU campaign lives in results/gelu_tax/*.json (GeLU 84.3 ms,
GeLUpoly 69.6, GeLUtanh 55.3, ReLU 51.0 at batch 256 — SCALING.md
"erf-GELU tax").

  GELU_BATCH=256 python scripts/gelu_probe.py NAME ACTS [flag=value ...]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench_env  # noqa: E402

bench_env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_ode_metasolver_tpu.data import CIFAR10_MEAN, CIFAR10_STD  # noqa: E402
from neural_ode_metasolver_tpu.models.api import build_model  # noqa: E402
from neural_ode_metasolver_tpu.ops import SolverOptions, parse_solver_dsl  # noqa: E402
from neural_ode_metasolver_tpu.training import (  # noqa: E402
    AttackConfig, NoiseConfig, create_train_state, cyclic_lr,
    make_optimizer, make_train_step,
)

name = sys.argv[1]          # variant tag
acts = sys.argv[2]          # GeLU | GeLUpoly | GeLUtanh | ReLU | ...
extra_flags = {}
for arg in sys.argv[3:]:
    k, _, v = arg.partition("=")
    extra_flags[k] = v.capitalize() if v.lower() in ("true", "false") else v

batch = int(os.environ.get("GELU_BATCH", "256"))
model = build_model("premetanode10", in_planes=64, acts=(acts,) * 3)
solvers = parse_solver_dsl("rk2,u,8,-1,0.5,-1")
tx = make_optimizer("sgd", cyclic_lr(1e-7, 0.1, 3186), momentum=0.9,
                    weight_decay=5e-4)
ts = create_train_state(model, tx, jax.random.key(0))
step = make_train_step(
    model, tx, solvers, SolverOptions(),
    attack_cfg=AttackConfig(mode="fgsm_random", eps=8 / 255, alpha=10 / 255,
                            mean=CIFAR10_MEAN, std=CIFAR10_STD),
    noise_cfg=NoiseConfig(noise_type="normal", sigma=0.0125, prob=1.0),
    compute_dtype=jnp.bfloat16, unroll=8, remat=False, jit_compile=False,
)
opts = {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "True",
        **extra_flags}
jstep = jax.jit(step, donate_argnums=(0,), compiler_options=opts)
x = jax.random.normal(jax.random.key(1), (batch, 32, 32, 3), jnp.float32)
y = jax.random.randint(jax.random.key(2), (batch,), 0, 10)
t0 = time.perf_counter()
ts, m = jstep(ts, x, y, jax.random.key(10))
l0 = float(m["loss"])
compile_s = time.perf_counter() - t0
STEPS = 20
t0 = time.perf_counter()
for i in range(STEPS):
    ts, m = jstep(ts, x, y, jax.random.key(100 + i))
float(m["loss"])
jax.block_until_ready(ts)
dt = (time.perf_counter() - t0) / STEPS
print(json.dumps({"variant": name, "acts": acts, "flags": opts,
                  "first_loss": round(l0, 6),
                  "step_ms": round(dt * 1e3, 2),
                  "img_per_s": round(batch / dt, 1),
                  "compile_s": round(compile_s, 1)}))
