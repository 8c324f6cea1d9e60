#!/usr/bin/env python
"""Whole-schedule (36-epoch) training equivalence: GeLUpoly vs exact erf.

Round-3 banked GeLUpoly (the bench activation, models/nn.py::gelu_poly)
on 192-step loss-trajectory equality + 3e-4 forward parity
(results/gelu_tax/gelu_equiv_poly.json).  This extends the evidence to a
FULL flagship schedule: the exact flagship36 recipe (premetanode10
in_planes=64, FGSM-random adv training + Normal(0.0125) solver
smoothing, batch 256, cyclic triangular2 LR 1e-7 -> 0.1 step_size_up
3186, grad clip 1.0, bf16, 36 epochs over 50k CIFAR-shaped synthetic
images — results/flagship36_*/metrics.jsonl config) is run three times:

    erf @ seed 602      (baseline arm)
    GeLUpoly @ seed 602 (identical init/keys/batch order)
    erf @ seed 603      (the seed-noise yardstick)

Clean accuracy saturates at 1.0 on this separable synthetic task (round-2
finding), so the discriminative endpoints are FGSM(8/255) and
PGD(8/255, 2/255, 7) robust accuracy plus the final/peak train losses.
Equivalence bar: |poly@602 - erf@602| <= max(|erf@602 - erf@603|, 0.01)
per robust endpoint — the activation swap must not move results by more
than a seed does.

  python scripts/gelu_equiv_36ep.py [--nepochs 36] \
      [--out results/gelu_tax/gelu_equiv_36ep.json]
"""
import argparse
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

from neural_ode_metasolver_tpu.data import (  # noqa: E402
    CIFAR10_MEAN, CIFAR10_STD, batch_iterator, synthetic_dataset,
)
from neural_ode_metasolver_tpu.models.api import build_model  # noqa: E402
from neural_ode_metasolver_tpu.ops import (  # noqa: E402
    SolverOptions, parse_solver_dsl,
)
from neural_ode_metasolver_tpu.training import (  # noqa: E402
    AttackConfig, NoiseConfig, accuracy, adversarial_accuracy,
    create_train_state, cyclic_lr, make_optimizer, make_train_step,
)

SOLVERS = parse_solver_dsl("rk2,u,8,-1,0.5,-1")
OPTS = SolverOptions()


def run(acts, seed, nepochs, train_ds, test_ds):
    model = build_model("premetanode10", in_planes=64, acts=(acts,) * 3)
    tx = make_optimizer("sgd", cyclic_lr(1e-7, 0.1, 3186), momentum=0.9,
                        weight_decay=5e-4, grad_clip=1.0)
    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    ts = create_train_state(model, tx, k_init)
    step = make_train_step(
        model, tx, SOLVERS, OPTS,
        attack_cfg=AttackConfig(mode="fgsm_random", eps=8 / 255,
                                alpha=10 / 255, mean=CIFAR10_MEAN,
                                std=CIFAR10_STD),
        noise_cfg=NoiseConfig(noise_type="normal", sigma=0.0125, prob=1.0),
        compute_dtype=jnp.bfloat16, unroll=8, jit_compile=False,
    )
    jstep = jax.jit(step, donate_argnums=(0,), compiler_options={
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "True"})
    t0 = time.time()
    losses = []
    peak_loss = None
    for epoch in range(nepochs):
        last = None
        for x, y in batch_iterator(train_ds, 256, seed=seed + epoch,
                                   crop_padding=4, mean=CIFAR10_MEAN,
                                   std=CIFAR10_STD):
            key, k = jax.random.split(key)
            ts, m = jstep(ts, jnp.asarray(x), jnp.asarray(y), k)
            last = m["loss"]
        losses.append(round(float(last), 5))
        if epoch == nepochs // 2 - 1:
            peak_loss = losses[-1]
    t_train = time.time() - t0

    def data():
        return batch_iterator(test_ds, 256, shuffle=False, drop_last=False,
                              mean=CIFAR10_MEAN, std=CIFAR10_STD)

    clean = accuracy(model, ts.params, ts.model_state, SOLVERS, OPTS,
                     data())
    key, k1 = jax.random.split(key)
    fgsm = adversarial_accuracy(
        model, ts.params, ts.model_state, SOLVERS, OPTS, data(),
        AttackConfig(mode="fgsm", eps=8 / 255, mean=CIFAR10_MEAN,
                     std=CIFAR10_STD), k1)
    key, k2 = jax.random.split(key)
    pgd = adversarial_accuracy(
        model, ts.params, ts.model_state, SOLVERS, OPTS, data(),
        AttackConfig(mode="at", eps=8 / 255, pgd_lr=2 / 255, pgd_niter=7,
                     mean=CIFAR10_MEAN, std=CIFAR10_STD), k2)
    out = {"acts": acts, "seed": seed, "nepochs": nepochs,
           "clean": float(clean),
           "fgsm": float(fgsm), "pgd": float(pgd),
           "final_loss": losses[-1], "peak_loss": peak_loss,
           "epoch_losses": losses, "train_s": round(t_train, 1)}
    print(json.dumps({k: v for k, v in out.items()
                      if k != "epoch_losses"}), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nepochs", type=int, default=36)
    p.add_argument("--out", type=str,
                   default="results/gelu_tax/gelu_equiv_36ep.json")
    p.add_argument("--arms", type=str,
                   default="GeLU:602,GeLUpoly:602,GeLU:603",
                   help="comma list of acts:seed arms; arms already in "
                        "--out are reused (idempotent chunking)")
    args = p.parse_args()

    train_ds = synthetic_dataset(50000, (32, 32, 3), template_seed=7)
    test_ds = synthetic_dataset(10000, (32, 32, 3), template_seed=7,
                                seed=1)

    done = {}
    if os.path.exists(args.out):
        done = {(r["acts"], r["seed"]): r
                for r in json.load(open(args.out))["arms"]}
    arms = []
    for spec in args.arms.split(","):
        acts, seed = spec.split(":")
        k = (acts, int(seed))
        # reuse only arms trained at THIS epoch count — a smoke-length
        # invocation must never contaminate the full-schedule verdict
        if k in done and done[k].get("nepochs") == args.nepochs:
            print(f"reusing stored arm {k}", flush=True)
            arms.append(done[k])
        else:
            arms.append(run(acts, int(seed), args.nepochs, train_ds,
                            test_ds))
            # persist after EVERY arm: chunk-resumable on a timeout
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump({"nepochs": args.nepochs, "arms": arms}, f,
                          indent=1)

    by = {(a["acts"], a["seed"]): a for a in arms}
    needed = [("GeLU", 602), ("GeLUpoly", 602), ("GeLU", 603)]
    if all(k in by for k in needed):
        e2, p2, e3 = (by[needed[0]], by[needed[1]], by[needed[2]])
        verdict = {}
        for ep in ("fgsm", "pgd", "clean"):
            act_d = abs(p2[ep] - e2[ep])
            seed_d = abs(e3[ep] - e2[ep])
            verdict[ep] = {"activation_delta": round(act_d, 4),
                           "seed_delta": round(seed_d, 4),
                           "within_seed_noise":
                               act_d <= max(seed_d, 0.01)}
        with open(args.out, "w") as f:
            json.dump({"nepochs": args.nepochs, "arms": arms,
                       "verdict": verdict}, f, indent=1)
        print(json.dumps(verdict, indent=1), flush=True)


if __name__ == "__main__":
    main()
