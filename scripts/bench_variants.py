#!/usr/bin/env python
"""Measure flagship-step variants on the real chip: timing + XLA cost
analysis (FLOPs, HBM bytes), to attribute the roofline gap.

  python scripts/bench_variants.py <name> [compiler_flag=value ...]

Variants: base (bf16 u8), remat8 (bf16 u8 remat), remat1 (bf16 u1 remat),
batch512 (bf16 u8 batch 512), f32 (parity policy), u2/u4/u16 (unroll
re-tune).  Trailing args are forwarded as XLA compiler options — used
for the round-3 re-tune of (batch, unroll) under
xla_tpu_use_bundle_aware_cost_model_for_fusions=true (the knobs were
originally tuned before that flag existed).
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

VARIANTS = {
    "base": dict(compute_dtype="bf16", unroll=8, remat=False, batch=256),
    "remat8": dict(compute_dtype="bf16", unroll=8, remat=True, batch=256),
    "remat1": dict(compute_dtype="bf16", unroll=1, remat=True, batch=256),
    "batch512": dict(compute_dtype="bf16", unroll=8, remat=False, batch=512),
    "f32": dict(compute_dtype=None, unroll=8, remat=False, batch=256),
    "u2": dict(compute_dtype="bf16", unroll=2, remat=False, batch=256),
    "u4": dict(compute_dtype="bf16", unroll=4, remat=False, batch=256),
    "u16": dict(compute_dtype="bf16", unroll=16, remat=False, batch=256),
    "batch128": dict(compute_dtype="bf16", unroll=8, remat=False, batch=128),
    "batch64": dict(compute_dtype="bf16", unroll=8, remat=False, batch=64),
    "batch192": dict(compute_dtype="bf16", unroll=8, remat=False, batch=192),
}


def main(name, compiler_options=None, acts="GeLUpoly"):
    # acts default = the shipped bench.py flagship (GeLUpoly since the
    # round-3 erf-GELU recovery); pass GELU_ACTS=... to tune a different
    # activation's program — variant sweeps must measure the program
    # bench.py actually ships
    cfg = VARIANTS[name]
    from neural_ode_metasolver_tpu.data import CIFAR10_MEAN, CIFAR10_STD
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import SolverOptions, parse_solver_dsl
    from neural_ode_metasolver_tpu.training import (
        AttackConfig, NoiseConfig, create_train_state, cyclic_lr,
        make_optimizer, make_train_step,
    )

    batch = cfg["batch"]
    model = build_model("premetanode10", in_planes=64, acts=(acts,) * 3)
    solvers = parse_solver_dsl("rk2,u,8,-1,0.5,-1")
    tx = make_optimizer("sgd", cyclic_lr(1e-7, 0.1, 3186), momentum=0.9,
                        weight_decay=5e-4)
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(
        model, tx, solvers, SolverOptions(),
        attack_cfg=AttackConfig(mode="fgsm_random", eps=8 / 255,
                                alpha=10 / 255, mean=CIFAR10_MEAN,
                                std=CIFAR10_STD),
        noise_cfg=NoiseConfig(noise_type="normal", sigma=0.0125, prob=1.0),
        compute_dtype=jnp.bfloat16 if cfg["compute_dtype"] == "bf16" else None,
        unroll=cfg["unroll"],
        remat=cfg["remat"],
        jit_compile=False,
    )

    x = jax.random.normal(jax.random.key(1), (batch, 32, 32, 3), jnp.float32)
    y = jax.random.randint(jax.random.key(2), (batch,), 0, 10)

    jit_kwargs = {}
    if compiler_options:
        jit_kwargs["compiler_options"] = compiler_options
    jstep = jax.jit(step, donate_argnums=(0,), **jit_kwargs)
    t0 = time.perf_counter()
    lowered = jstep.lower(ts, x, y, jax.random.key(10))
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)

    ts, m = jstep(ts, x, y, jax.random.key(10))
    float(m["loss"])

    STEPS = 20
    t0 = time.perf_counter()
    for i in range(STEPS):
        ts, m = jstep(ts, x, y, jax.random.key(100 + i))
    float(m["loss"])
    jax.block_until_ready(ts)
    dt = (time.perf_counter() - t0) / STEPS

    print(json.dumps({
        "variant": name, "acts": acts, **cfg,
        "compiler_options": compiler_options or {},
        "step_ms": round(dt * 1e3, 2),
        "img_per_s": round(batch / dt, 1),
        "gflop": round(flops / 1e9, 1),
        "hbm_gb": round(bytes_acc / 1e9, 2),
        "tflops_per_s": round(flops / dt / 1e12, 1),
        "hbm_gb_per_s": round(bytes_acc / dt / 1e9, 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    # normalizes boolean spellings to the one form both the local PJRT
    # parser and the remote compile helper accept ("True"/"False")
    from neural_ode_metasolver_tpu.runners.common import (
        parse_compiler_options,
    )

    main(sys.argv[1] if len(sys.argv) > 1 else "base",
         parse_compiler_options(sys.argv[2:]),
         acts=os.environ.get("GELU_ACTS", "GeLUpoly"))
