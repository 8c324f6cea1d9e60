"""The reference's headline claim, on real offline data: does *solver
smoothing* (per-batch Normal noise on the RK2 coefficient u) improve
adversarial robustness? (README.md:52-66 of the reference, CIFAR-10; here on
sklearn's real handwritten digits since no CIFAR is reachable offline.)

Protocol per seed: PGD adversarial training (eps=0.3, the reference's MNIST
CONFIG_PGD_TRAIN, train_validate.py:16) of the MNIST MetaNODE
with an 8-step RK2(u=0.5) solver, with and without smoothing
(Normal sigma=0.0125, prob=1), then clean + PGD(0.3, 2/255, 7) eval.

Common random numbers across arms (paired design): for a given seed both
arms replay the IDENTICAL PRNG chain — same init key, same batch order,
same per-batch step key, hence same attack draws (the step splits its key
as (noise, attack, attack-fwd, fwd, data); the standalone arm simply never
consumes the noise subkey) — so the per-seed difference isolates the
smoothing draw's effect, and the script reports the PAIRED mean
difference with a t-interval, not just per-arm spreads.

  python scripts/digits_smoothing_experiment.py --seeds 1,2,3 --nepochs 12
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
    accuracy,
    adversarial_accuracy,
    create_train_state,
    make_optimizer,
    make_train_step,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=lambda s: [int(i) for i in s.split(",")],
                   default=[1, 2, 3])
    p.add_argument("--nepochs", type=int, default=12)
    p.add_argument("--n_steps", type=int, default=8)
    p.add_argument("--sigma", type=float, default=0.0125)
    p.add_argument("--eps", type=float, default=0.3)
    p.add_argument("--output_csv", type=str,
                   default="results/digits_smoothing.csv")
    p.add_argument("--fleet", action="store_true",
                   help="train every seed of each arm as ONE vmapped fleet "
                        "program (scripts/fleet_smoothing_lib.py) — same "
                        "per-seed PRNG chains and CRN pairing, one device "
                        "dispatch per step; a separate numerics stream "
                        "from sequential rows (training/fleet.py note)")
    p.add_argument("--fleet_chunk", type=int, default=None,
                   help="members per fleet program (default: all seeds); "
                        "every chunk reuses one compilation")
    p.add_argument("--force_cpu", action="store_true",
                   help="smoke-test on local CPU (the env var alone is "
                        "overridden by sitecustomize)")
    args = p.parse_args()
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache_cpu"))

    train_ds, test_ds = load_digits_dataset(seed=0)
    model = build_model("mnist", dim=64)
    solvers = [create_solver("rk2", "u", n_steps=args.n_steps, u0=0.5)]
    opts = SolverOptions()
    tx = make_optimizer("rmsprop", 1e-3, weight_decay=5e-4)
    # single-step FGSM at eps=0.3 from scratch collapses to constant
    # predictions (catastrophic overfitting); PGD training is the reference's
    # MNIST setting and is stable
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
                eval_attack_cfg=pgd_eval, chunk_size=args.fleet_chunk,
            )
        _finish(args, rows)
        return

    steps = {
        regime: make_train_step(model, tx, solvers, opts,
                                attack_cfg=attack, noise_cfg=ncfg)
        for regime, ncfg in noise_cfgs.items()
    }

    rows = []
    for regime, step in steps.items():
        for seed in args.seeds:
            key = jax.random.key(seed)
            key, k_init = jax.random.split(key)
            ts = create_train_state(model, tx, k_init)
            for epoch in range(args.nepochs):
                for x, y in batch_iterator(train_ds, 128,
                                           seed=seed * 977 + epoch,
                                           crop_padding=4):
                    key, sub = jax.random.split(key)
                    ts, _ = step(ts, jnp.asarray(x), jnp.asarray(y), sub)
            data = lambda: batch_iterator(test_ds, 256, shuffle=False,
                                          drop_last=False)
            clean = accuracy(model, ts.params, ts.model_state, solvers, opts,
                             data())
            key, k_adv = jax.random.split(key)
            robust = adversarial_accuracy(
                model, ts.params, ts.model_state, solvers, opts, data(),
                pgd_eval, k_adv,
            )
            print(f"{regime:10s} seed={seed} clean={clean:.4f} "
                  f"pgd={robust:.4f}", flush=True)
            rows.append({"regime": regime, "seed": seed, "clean_acc": clean,
                         "robust_acc": robust})

    _finish(args, rows)


def _finish(args, rows):
    from neural_ode_metasolver_tpu.utils import atomic_write

    os.makedirs(os.path.dirname(args.output_csv) or ".", exist_ok=True)
    with atomic_write(args.output_csv, newline="") as f:
        w = csv.DictWriter(f, fieldnames=["regime", "seed", "clean_acc",
                                          "robust_acc"])
        w.writeheader()
        w.writerows(rows)
    print("wrote", args.output_csv)

    # Paired analysis: the arms share all randomness except the smoothing
    # draw (see module docstring), so per-seed differences are the CRN
    # estimator of the smoothing effect.  The report logic is shared with
    # the chunk-merging driver so the two can never drift.
    from merge_smoothing_results import paired_report

    paired_report(rows)


if __name__ == "__main__":
    main()
