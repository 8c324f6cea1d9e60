"""Smoothing confirmation at the reference's model_best endpoint.

The n=192 final-iterate confirmation (results/RESULTS.md) found its paired
sd inflated by rare LAST-EPOCH loss excursions that best-checkpoint
selection — which both this framework's fit loop and the reference's
``validate_standalone`` (model_best_{id}.pth, train_validate.py:150-162)
perform during real training — fully rescues.  This driver re-runs the
CRN-paired 72-epoch digits protocol with that endpoint made primary:
after every epoch the clean test accuracy is evaluated in one jitted
forward and the best-so-far (params, model_state) snapshot is kept ON
DEVICE (a jnp.where over the pytree — no host sync in the epoch loop);
robust accuracy is then measured at the best-clean iterate, exactly the
reference's protocol for its published tables (checkpoints selected on
eval accuracy, attacked afterwards — SURVEY.md §3.4/§6).

PRNG discipline: the training chain (init key, per-batch step keys, batch
order, final-eval key) consumes splits in EXACTLY the order of
``digits_smoothing_experiment.py``, so a stored seed re-run here must
reproduce its final_clean/final_robust bit for bit (numerics-neutrality
check); the best-iterate robust eval draws its key AFTER the original
chain.

  python scripts/digits_smoothing_best_iterate.py --seeds 300,301 \
      --nepochs 72 --output_csv results/chunk.csv
"""
import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from neural_ode_metasolver_tpu.data import batch_iterator, load_digits_dataset
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
from neural_ode_metasolver_tpu.training import (
    AttackConfig,
    NoiseConfig,
    adversarial_accuracy,
    create_train_state,
    make_optimizer,
    make_train_step,
)

FIELDS = ["regime", "seed", "clean_acc", "robust_acc", "final_clean",
          "final_robust", "best_epoch"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=lambda s: [int(i) for i in s.split(",")],
                   default=[300, 301])
    p.add_argument("--nepochs", type=int, default=72)
    p.add_argument("--n_steps", type=int, default=8)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--sigma", type=float, default=0.0125)
    p.add_argument("--eps", type=float, default=0.3)
    p.add_argument("--output_csv", type=str,
                   default="results/digits_smoothing_best_iterate.csv")
    p.add_argument("--force_cpu", action="store_true",
                   help="smoke-test on local CPU (the env var alone is "
                        "overridden by sitecustomize)")
    p.add_argument("--fleet", action="store_true",
                   help="train every seed of each arm as ONE vmapped fleet "
                        "program (scripts/fleet_smoothing_lib.py), with the "
                        "per-epoch best-clean snapshot tracked on device "
                        "per member — same per-seed PRNG chains and CRN "
                        "pairing; a separate numerics stream from "
                        "sequential rows (training/fleet.py note)")
    p.add_argument("--fleet_chunk", type=int, default=None,
                   help="members per fleet program (default: all seeds); "
                        "every chunk reuses one compilation")
    args = p.parse_args()
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache_cpu"))

    train_ds, test_ds = load_digits_dataset(seed=0)
    model = build_model("mnist", dim=args.dim)
    solvers = [create_solver("rk2", "u", n_steps=args.n_steps, u0=0.5)]
    opts = SolverOptions()
    tx = make_optimizer("rmsprop", 1e-3, weight_decay=5e-4)
    attack = AttackConfig(mode="at", eps=args.eps, pgd_lr=2 / 255,
                          pgd_niter=7)
    pgd_eval = AttackConfig(mode="at", eps=args.eps, pgd_lr=2 / 255,
                            pgd_niter=7)

    noise_cfgs = {
        "standalone": NoiseConfig(),
        "smoothing": NoiseConfig(noise_type="normal", sigma=args.sigma,
                                 prob=1.0),
    }

    if args.fleet:
        from fleet_smoothing_lib import run_fleet_regime

        rows = []
        for regime, ncfg in noise_cfgs.items():
            rows += run_fleet_regime(
                regime, model, tx, solvers, opts, attack, ncfg,
                train_ds, test_ds, args.seeds, args.nepochs,
                eval_attack_cfg=pgd_eval, track_best=True,
                chunk_size=args.fleet_chunk,
            )
        _finish(args, rows)
        return

    steps = {
        regime: make_train_step(model, tx, solvers, opts,
                                attack_cfg=attack, noise_cfg=ncfg)
        for regime, ncfg in noise_cfgs.items()
    }

    # whole 359-sample test set as one device-resident batch
    test_x = jnp.asarray(test_ds.images)
    test_y = jnp.asarray(test_ds.labels)

    @jax.jit
    def clean_acc_fn(params, state):
        logits, _, _ = model.apply(params, state, test_x, solvers, opts)
        return jnp.mean(jnp.argmax(logits, -1) == test_y)

    @jax.jit
    def track_best(best, params, state, epoch):
        """best = (acc, epoch, params, state); keep the argmax-by-clean
        snapshot on device (strict > : earliest best wins ties, matching
        a sequential is-better checkpoint rule)."""
        acc = clean_acc_fn(params, state)
        improved = acc > best[0]
        take = lambda new, old: jnp.where(improved, new, old)
        return (take(acc, best[0]), take(epoch, best[1]),
                jax.tree.map(take, params, best[2]),
                jax.tree.map(take, state, best[3]))

    rows = []
    for regime, step in steps.items():
        for seed in args.seeds:
            key = jax.random.key(seed)
            key, k_init = jax.random.split(key)
            ts = create_train_state(model, tx, k_init)
            # copy the init snapshot: the train step DONATES its TrainState,
            # so best[] must never alias buffers a step call will consume
            copy = lambda t: jax.tree.map(lambda a: jnp.array(a, copy=True), t)
            best = (jnp.float32(-1.0), jnp.int32(-1), copy(ts.params),
                    copy(ts.model_state))
            for epoch in range(args.nepochs):
                for x, y in batch_iterator(train_ds, 128,
                                           seed=seed * 977 + epoch,
                                           crop_padding=4):
                    key, sub = jax.random.split(key)
                    ts, _ = step(ts, jnp.asarray(x), jnp.asarray(y), sub)
                best = track_best(best, ts.params, ts.model_state,
                                  jnp.int32(epoch))
            # batch 256 (NOT the full set in one batch): adversarial_accuracy
            # splits its key PER BATCH, so the batching is part of the PRNG
            # chain the stored campaign used — changing it changes the
            # robust numbers (found by the seed-187 cross-check)
            data = lambda: batch_iterator(test_ds, 256, shuffle=False,
                                          drop_last=False)
            final_clean = float(clean_acc_fn(ts.params, ts.model_state))
            # original chain position: final-iterate robust eval
            key, k_adv = jax.random.split(key)
            final_robust = adversarial_accuracy(
                model, ts.params, ts.model_state, solvers, opts, data(),
                pgd_eval, k_adv,
            )
            # NEW consumption after the original chain: best-iterate robust
            key, k_adv_best = jax.random.split(key)
            best_clean = float(best[0])
            best_epoch = int(best[1])
            best_robust = adversarial_accuracy(
                model, best[2], best[3], solvers, opts, data(),
                pgd_eval, k_adv_best,
            )
            print(f"{regime:10s} seed={seed} best@{best_epoch:02d} "
                  f"clean={best_clean:.4f} pgd={best_robust:.4f} "
                  f"(final clean={final_clean:.4f} pgd={final_robust:.4f})",
                  flush=True)
            rows.append({"regime": regime, "seed": seed,
                         "clean_acc": best_clean, "robust_acc": best_robust,
                         "final_clean": final_clean,
                         "final_robust": final_robust,
                         "best_epoch": best_epoch})

    _finish(args, rows)


def _finish(args, rows):
    os.makedirs(os.path.dirname(args.output_csv) or ".", exist_ok=True)
    # temp+rename: a timeout SIGTERM mid-write must never leave a
    # truncated CSV that campaign drivers would treat as a done chunk
    tmp = args.output_csv + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)
    os.replace(tmp, args.output_csv)
    print("wrote", args.output_csv)

    from merge_smoothing_results import paired_report

    print("-- best-iterate endpoints --")
    paired_report(rows)
    print("-- final-iterate endpoints (continuity with the n=192 table) --")
    paired_report([{**r, "clean_acc": r["final_clean"],
                    "robust_acc": r["final_robust"]} for r in rows])


if __name__ == "__main__":
    main()
