#!/usr/bin/env python
"""Training-equivalence check for an activation variant vs exact-erf GeLU.

Runs 192 flagship adversarial training steps (premetanode10 in_planes=64,
bf16, bundle flag) from identical init/keys/batch order with the given
activation and compares the sampled loss trajectory + final synthetic
accuracy against the stored exact-GeLU arm
(results/gelu_tax/gelu_equiv2.json — chip runs are bit-deterministic, so
the stored arm is reusable).  Also reports the f32 full-model forward max
|logit diff| with identical weights.

  python scripts/gelu_equiv.py [ACTS]        # default GeLUpoly
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench_env  # noqa: E402

bench_env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_ode_metasolver_tpu.data import (  # noqa: E402
    CIFAR10_MEAN, CIFAR10_STD, batch_iterator, synthetic_dataset,
)
from neural_ode_metasolver_tpu.models.api import build_model  # noqa: E402
from neural_ode_metasolver_tpu.ops import SolverOptions, parse_solver_dsl  # noqa: E402
from neural_ode_metasolver_tpu.training import (  # noqa: E402
    AttackConfig, NoiseConfig, accuracy, create_train_state, cyclic_lr,
    make_optimizer, make_train_step,
)

ACTS = sys.argv[1] if len(sys.argv) > 1 else "GeLUpoly"
STORED = os.path.join(REPO, "results", "gelu_tax", "gelu_equiv2.json")

solvers = parse_solver_dsl("rk2,u,8,-1,0.5,-1")
train_ds = synthetic_dataset(2048, (32, 32, 3), template_seed=7)
test_ds = synthetic_dataset(512, (32, 32, 3), template_seed=7, seed=1)


def run(acts):
    model = build_model("premetanode10", in_planes=64, acts=(acts,) * 3)
    tx = make_optimizer("sgd", cyclic_lr(1e-7, 0.05, 48), momentum=0.9,
                        weight_decay=5e-4)
    ts = create_train_state(model, tx, jax.random.key(0))
    step = make_train_step(
        model, tx, solvers, SolverOptions(),
        attack_cfg=AttackConfig(mode="fgsm_random", eps=8 / 255,
                                alpha=10 / 255, mean=CIFAR10_MEAN,
                                std=CIFAR10_STD),
        noise_cfg=NoiseConfig(noise_type="normal", sigma=0.0125, prob=1.0),
        compute_dtype=jnp.bfloat16, unroll=8, remat=False,
        jit_compile=False,
    )
    jstep = jax.jit(step, donate_argnums=(0,), compiler_options={
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "True"})
    losses = []
    key = jax.random.key(42)
    it = 0
    for epoch in range(24):
        for x, y in batch_iterator(train_ds, 256, seed=epoch, shuffle=True):
            key, k = jax.random.split(key)
            ts, m = jstep(ts, jnp.asarray(x), jnp.asarray(y), k)
            if it % 24 == 0:
                losses.append(round(float(m["loss"]), 4))
            it += 1
    acc = accuracy(model, ts.params, ts.model_state, solvers,
                   SolverOptions(),
                   list(batch_iterator(test_ds, 256, shuffle=False,
                                       drop_last=False)))
    return losses, float(acc)


# forward agreement with identical weights (f32)
m_exact = build_model("premetanode10", in_planes=64)
m_var = build_model("premetanode10", in_planes=64, acts=(ACTS,) * 3)
p, s = m_exact.init(jax.random.key(0))
x0 = jax.random.normal(jax.random.key(9), (64, 32, 32, 3))
le, _, _ = m_exact.apply(p, s, x0, solvers, SolverOptions())
lv, _, _ = m_var.apply(p, s, x0, solvers, SolverOptions())
fwd_diff = float(jnp.max(jnp.abs(le - lv)))

l_var, a_var = run(ACTS)
stored = json.load(open(STORED))
print(json.dumps({
    "acts": ACTS,
    "fwd_logits_maxdiff_identical_weights": fwd_diff,
    "acc_exact_stored": stored["acc_exact"], "acc_variant": a_var,
    "loss_exact_stored": stored["loss_exact"], "loss_variant": l_var,
}))
