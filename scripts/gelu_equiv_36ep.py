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

plus an OPTIONAL fourth arm, GeLUpoly @ seed 603 (round-5 phase 6),
which completes the 2x2 activation x seed matrix: when banked, the
verdict binds on BOTH paired activation deltas (poly-vs-erf at 602 AND
at 603), each against the same erf seed yardstick.

ALL accuracy endpoints (clean AND robust) saturate at 1.0 on this
separable synthetic task (round-4 finding: the banked erf arm reports
clean=fgsm=pgd=1.0), so accuracies are recorded but non-binding.  The
BINDING equivalence basis is the epoch-loss trajectory, which does
discriminate: per-epoch |poly@602 - erf@602| (mean and max over the 36
epochs) must not exceed the seed yardstick |erf@603 - erf@602| (floors
0.01 mean / 0.05 max) — the activation swap must not move the training
trajectory by more than a seed change does.

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


def run(acts, seed, nepochs, train_ds, test_ds, eval_batch=64):
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
        return batch_iterator(test_ds, eval_batch, shuffle=False,
                              drop_last=False, mean=CIFAR10_MEAN,
                              std=CIFAR10_STD)

    clean = accuracy(model, ts.params, ts.model_state, SOLVERS, OPTS,
                     data())
    # Round-4 postmortem (/tmp/r4_phase3.log): the batch-256 GeLUpoly
    # FGSM-eval program needed 36.13G HBM at compile (24G unpadded f32
    # scan residuals + 12G fragmentation) vs the chip's 15.75G.  The
    # adversarial evals therefore run at a small batch WITH scan
    # rematerialization — accuracy is a per-example mean, so neither
    # changes the value.
    key, k1 = jax.random.split(key)
    fgsm = adversarial_accuracy(
        model, ts.params, ts.model_state, SOLVERS, OPTS, data(),
        AttackConfig(mode="fgsm", eps=8 / 255, mean=CIFAR10_MEAN,
                     std=CIFAR10_STD), k1, remat=True)
    key, k2 = jax.random.split(key)
    pgd = adversarial_accuracy(
        model, ts.params, ts.model_state, SOLVERS, OPTS, data(),
        AttackConfig(mode="at", eps=8 / 255, pgd_lr=2 / 255, pgd_niter=7,
                     mean=CIFAR10_MEAN, std=CIFAR10_STD), k2, remat=True)
    out = {"acts": acts, "seed": seed, "nepochs": nepochs,
           "eval_batch": eval_batch,
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
    p.add_argument("--eval_batch", type=int, default=64,
                   help="adversarial-eval batch; 256 OOMs HBM at compile "
                        "(round-4 postmortem in run())")
    args = p.parse_args()

    train_ds = synthetic_dataset(50000, (32, 32, 3), template_seed=7)
    test_ds = synthetic_dataset(10000, (32, 32, 3), template_seed=7,
                                seed=1)

    # Stored arms are keyed by (acts, seed, nepochs) and NEVER dropped on
    # rewrite — a smoke-length invocation must neither contaminate the
    # full-schedule verdict nor erase full-schedule arms banked earlier.
    # Verdicts are likewise keyed by epoch count in "verdicts"; the
    # top-level "verdict" key (what the chip drivers' done-checks look
    # for) is reserved for the FULL 36-epoch schedule, so a smoke run
    # can never mark the chip task complete or overwrite its verdict.
    stored, verdicts = [], {}
    if os.path.exists(args.out):
        old = json.load(open(args.out))
        stored = old["arms"]
        verdicts = old.get("verdicts", {})
        # legacy (pre-"verdicts") files only: new-format files always
        # carry "verdicts", and their top-level "nepochs" is just the
        # LAST invocation's epoch count — migrating from it would
        # re-record a 36-epoch verdict under a smoke epoch key
        if "verdict" in old and "verdicts" not in old:
            verdicts[str(old["nepochs"])] = old["verdict"]
    done = {(r["acts"], r["seed"], r.get("nepochs")): r for r in stored}

    def persist():
        from neural_ode_metasolver_tpu.utils import atomic_write

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        doc = {"nepochs": args.nepochs, "arms": list(done.values()),
               "verdicts": verdicts}
        if "36" in verdicts:
            doc["verdict"] = verdicts["36"]
        with atomic_write(args.out) as f:
            json.dump(doc, f, indent=1)

    arms = []
    for spec in args.arms.split(","):
        acts, seed = spec.split(":")
        k = (acts, int(seed), args.nepochs)
        if k in done:
            print(f"reusing stored arm {k}", flush=True)
            arms.append(done[k])
        else:
            done[k] = run(acts, int(seed), args.nepochs, train_ds,
                          test_ds, args.eval_batch)
            arms.append(done[k])
            # persist after EVERY arm: chunk-resumable on a timeout
            persist()

    by = {(a["acts"], a["seed"]): a for a in arms}

    def traj_delta_pair(a, b):
        ds = [abs(x - y) for x, y in
              zip(a["epoch_losses"], b["epoch_losses"])]
        return {"mean": round(sum(ds) / len(ds), 5),
                "max": round(max(ds), 5)}

    # 3x2-matrix branch — the PRE-REGISTERED permutation protocol
    # (docs/R5_QUEUE.md "PRE-REGISTERED (phase 7 protocol)"): with >= 3
    # seeds carrying both activations, a single seed pair is too noisy
    # a yardstick (the 2x2 matrix flipped on a 7% mean excess while the
    # poly-family pure-seed delta was the LARGEST of all six pairs), so
    # the verdict becomes a one-sided exact permutation test of the
    # activation-pair deltas against the within-family seed-pair
    # deltas, on mean and max epoch-loss delta separately.
    common = sorted(s for s in {k[1] for k in by}
                    if ("GeLU", s) in by and ("GeLUpoly", s) in by)
    if len(common) >= 3:
        A = {s: traj_delta_pair(by[("GeLUpoly", s)], by[("GeLU", s)])
             for s in common}
        S = {}
        for fam in ("GeLU", "GeLUpoly"):
            for i, s in enumerate(common):
                for t in common[i + 1:]:
                    S[f"{fam}:{s}-{t}"] = traj_delta_pair(
                        by[(fam, s)], by[(fam, t)])

        def perm_p(stat):
            # exact one-sided permutation p for "activation deltas are
            # large": P(sum of a random |A|-subset of the pooled deltas
            # >= the observed activation sum).  Caveat (pre-registered):
            # the deltas share underlying runs, so the null is
            # approximate — descriptive-grade.
            from itertools import combinations

            avals = [A[s][stat] for s in common]
            svals = [v[stat] for v in S.values()]
            pool = avals + svals
            obs = sum(avals)
            hits = total = 0
            for combo in combinations(range(len(pool)), len(avals)):
                total += 1
                if sum(pool[i] for i in combo) >= obs - 1e-12:
                    hits += 1
            return round(hits / total, 4)

        p_mean, p_max = perm_p("mean"), perm_p("max")
        acc = {}
        saturated = True
        for ep in ("fgsm", "pgd", "clean"):
            act_d = max(abs(by[("GeLUpoly", s)][ep] - by[("GeLU", s)][ep])
                        for s in common)
            seed_d = max(abs(by[(fam, s)][ep] - by[(fam, t)][ep])
                         for fam in ("GeLU", "GeLUpoly")
                         for i, s in enumerate(common)
                         for t in common[i + 1:])
            saturated &= all(by[k][ep] == 1.0 for k in by)
            acc[ep] = {"activation_delta": round(act_d, 4),
                       "seed_delta": round(seed_d, 4),
                       "within_seed_noise": act_d <= max(seed_d, 0.01)}
        acc_ok = all(v["within_seed_noise"] for v in acc.values())
        verdict = {
            "basis": ("PRE-REGISTERED 3x2-matrix permutation protocol "
                      "(docs/R5_QUEUE.md phase 7): one-sided exact "
                      "permutation test of activation-pair vs "
                      "within-family seed-pair trajectory deltas "
                      "(alpha 0.10, mean and max separately) + "
                      "accuracy endpoints (floor 0.01)"),
            "activation_pairs": {str(s): A[s] for s in common},
            "seed_pairs": S,
            "p_mean": p_mean,
            "p_max": p_max,
            "alpha": 0.10,
            "paired_points": len(common),
            "accuracies": acc,
            "accuracies_saturated": saturated,
            "equivalent": bool(p_mean >= 0.10 and p_max >= 0.10
                               and acc_ok),
        }
        verdicts[str(args.nepochs)] = verdict
        persist()
        print(json.dumps(verdict, indent=1), flush=True)
        return

    needed = [("GeLU", 602), ("GeLUpoly", 602), ("GeLU", 603)]
    if all(k in by for k in needed):
        e2, p2, e3 = (by[needed[0]], by[needed[1]], by[needed[2]])
        # Accuracy endpoints saturate at 1.0 on this separable synthetic
        # task (round-4 weak #4) — they are recorded but carry zero
        # discriminating power when saturated.  The BINDING equivalence
        # basis is the epoch-loss trajectory: the activation swap must
        # not move the trajectory by more than a seed change does.
        # optional second paired point (GeLUpoly @ the yardstick seed):
        # when present, BOTH activation deltas must clear the same bar
        p3 = by.get(("GeLUpoly", 603))
        acc = {}
        saturated = True
        for ep in ("fgsm", "pgd", "clean"):
            act_d = abs(p2[ep] - e2[ep])
            if p3 is not None:
                act_d = max(act_d, abs(p3[ep] - e3[ep]))
            seed_d = abs(e3[ep] - e2[ep])
            saturated &= all(a[ep] == 1.0 for a in (e2, p2, e3)
                             + ((p3,) if p3 is not None else ()))
            acc[ep] = {"activation_delta": round(act_d, 4),
                       "seed_delta": round(seed_d, 4),
                       "within_seed_noise": act_d <= max(seed_d, 0.01)}

        def traj_delta(a, b):
            ds = [abs(x - y) for x, y in
                  zip(a["epoch_losses"], b["epoch_losses"])]
            return {"mean": round(sum(ds) / len(ds), 5),
                    "max": round(max(ds), 5)}

        act_t = traj_delta(p2, e2)
        seed_t = traj_delta(e3, e2)
        act_pairs = {"602": act_t}
        if p3 is not None:
            act_pairs["603"] = traj_delta(p3, e3)
        traj_ok = all(t["mean"] <= max(seed_t["mean"], 0.01)
                      and t["max"] <= max(seed_t["max"], 0.05)
                      for t in act_pairs.values())
        acc_ok = all(v["within_seed_noise"] for v in acc.values())
        verdict = {
            "basis": ("epoch-loss trajectories (binding); accuracy "
                      "endpoints saturated at 1.0 on this task => "
                      "recorded, vacuously satisfied" if saturated else
                      "epoch-loss trajectories AND accuracy endpoints "
                      "(both binding — accuracies did not saturate)"),
            "loss_trajectory": {
                "activation_delta": act_t, "seed_delta": seed_t,
                "activation_delta_seed603": act_pairs.get("603"),
                "final_loss_activation_delta":
                    round(abs(p2["final_loss"] - e2["final_loss"]), 5),
                "final_loss_seed_delta":
                    round(abs(e3["final_loss"] - e2["final_loss"]), 5),
                "within_seed_noise": traj_ok,
            },
            "paired_points": len(act_pairs),
            "accuracies": acc,
            "accuracies_saturated": saturated,
            "equivalent": bool(traj_ok and acc_ok),
        }
        verdicts[str(args.nepochs)] = verdict
        persist()
        print(json.dumps(verdict, indent=1), flush=True)


if __name__ == "__main__":
    main()
