"""On-chip fleet campaign: a whole multi-seed (optionally multi-u) digits
experiment as ONE jitted vmapped program.

The science campaigns this repo ran in rounds 2-3 (u-sweep, smoothing
confirmations — results/RESULTS.md) trained seeds SEQUENTIALLY, exactly like
the reference replicates its 9-seed MNIST u-sweep as separate processes
(reference README.md:48); at digits scale each run underutilizes the chip
and pays ~0.7 ms tunnel dispatch per step.  `training/fleet.py` stacks S
member TrainStates and advances them in one dispatch.  This driver runs the
standard digits protocol (PGD adversarial training, 8-step RK2, rmsprop —
the same recipe as scripts/digits_smoothing_experiment.py's standalone arm,
same per-seed PRNG chains) as a fleet, measures the per-member step-time
amortization against the single-run step, and evaluates every member's
clean + PGD(eps, 2/255, 7) accuracy with the fleet eval kernel (per-member
dynamic solver coefficients, so a u-sweep is trained AND evaluated under
each member's own u).

  python scripts/fleet_digits_campaign.py --seeds 1,2,3,4 --nepochs 12
  python scripts/fleet_digits_campaign.py --u_grid 0.3,0.5,0.6667,1.0 \
      --seeds 1,2,3 --nepochs 36 --output_csv results/fleet_u_sweep.csv
"""
import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from neural_ode_metasolver_tpu.data import batch_iterator, load_digits_dataset
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
from neural_ode_metasolver_tpu.training import (
    AttackConfig,
    create_fleet_state,
    create_train_state,
    fleet_keys,
    make_fleet_eval_step,
    make_fleet_train_step,
    make_optimizer,
    make_train_step,
    stack_fleet_solvers,
)


def _split_fleet(keys):
    """Vmapped (carry, sub) = split(key) — the fleet twin of the
    single-run scripts' ``key, sub = jax.random.split(key)`` chain."""
    pairs = jax.vmap(jax.random.split)(keys)
    return pairs[:, 0], pairs[:, 1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=lambda s: [int(i) for i in s.split(",")],
                   default=[1, 2, 3, 4])
    p.add_argument("--u_grid",
                   type=lambda s: [float(v) for v in s.split(",")],
                   default=None,
                   help="optional RK2 u values; members = u_grid x seeds")
    p.add_argument("--nepochs", type=int, default=12)
    p.add_argument("--n_steps", type=int, default=8)
    p.add_argument("--eps", type=float, default=0.3)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--compare_single", type=int, default=1,
                   help="also time the single-run step for the "
                        "amortization comparison (epochs of steps: 1)")
    p.add_argument("--output_csv", type=str,
                   default="results/fleet_digits_campaign.csv")
    p.add_argument("--force_oversize", action="store_true",
                   help="launch a single fleet program beyond the "
                        "measured 32-member HBM envelope anyway")
    p.add_argument("--timing_only", action="store_true",
                   help="stop after the step-time measurement (skips the "
                        "eval kernels and CSV) — for the amortization "
                        "curve, where only ms/step matters")
    args = p.parse_args()

    us = args.u_grid if args.u_grid else [0.5]
    members = [(u, s) for u in us for s in args.seeds]
    S = len(members)
    # Preflight the fleet HBM bound: this tool compiles ALL members into
    # ONE program by design (it measures per-program amortization) — it
    # must refuse sizes beyond the measured envelope instead of OOMing
    # the chip mid-campaign (the round-4 96-member failure, SCALING.md
    # "Fleet HBM bound").  S=32 is the largest size that has compiled
    # and run; chunked campaigns belong in u_sweep --fleet/--fleet_chunk
    # or fleet_smoothing_lib.
    if S > 32 and not args.force_oversize:
        raise SystemExit(
            f"refusing a single {S}-member fleet program: 96 members "
            f"OOM'd HBM and 32 is the largest measured-safe size "
            f"(SCALING.md 'Fleet HBM bound'); chunk the campaign "
            f"(u_sweep --fleet_chunk / fleet_smoothing_lib) or pass "
            f"--force_oversize to try anyway")
    print(f"fleet: {S} members = {len(us)} u x {len(args.seeds)} seeds on "
          f"{jax.devices()[0].device_kind}", flush=True)

    train_ds, test_ds = load_digits_dataset(seed=0)
    model = build_model("mnist", dim=64)
    opts = SolverOptions()
    tx = make_optimizer("rmsprop", 1e-3, weight_decay=5e-4)
    attack = AttackConfig(mode="at", eps=args.eps, pgd_lr=2 / 255,
                          pgd_niter=7)

    member_solvers = [
        [create_solver("rk2", "u", n_steps=args.n_steps, u0=u)]
        for (u, _) in members
    ]
    dyn = stack_fleet_solvers(member_solvers)
    base_solvers = member_solvers[0]

    # per-member PRNG chains identical to the sequential scripts':
    # key = key(seed); key, k_init = split(key); per step key, sub = split
    carry, inits = _split_fleet(fleet_keys([s for (_, s) in members]))
    fts = create_fleet_state(model, tx, inits)
    fstep = make_fleet_train_step(model, tx, base_solvers, opts,
                                  attack_cfg=attack)

    n_train_steps = 0
    t_compile = None
    t_steady = 0.0
    steady_steps = 0
    t0 = time.time()
    for epoch in range(args.nepochs):
        iters = [
            batch_iterator(train_ds, args.batch, seed=s * 977 + epoch,
                           crop_padding=4)
            for (_, s) in members
        ]
        for batches in zip(*iters):
            x = jnp.asarray(np.stack([b[0] for b in batches]))
            y = jnp.asarray(np.stack([b[1] for b in batches]))
            carry, subs = _split_fleet(carry)
            te = time.time()
            fts, metrics = fstep(fts, x, y, subs, dyn)
            # drain EVERY step (float() empties the dispatch queue —
            # CLAUDE.md): step 0 so the compile time is clean, the rest
            # of epoch 0 so no device backlog lands on epoch 1's first
            # timed step and inflates t_steady
            float(jnp.sum(metrics["loss"]))
            if n_train_steps == 0:
                t_compile = time.time() - te
            elif epoch >= 1:
                t_steady += time.time() - te
                steady_steps += 1
            n_train_steps += 1
        print(f"epoch {epoch + 1}/{args.nepochs} "
              f"({time.time() - t0:.1f}s)", flush=True)
    fleet_ms = 1e3 * t_steady / max(steady_steps, 1)
    compile_str = f"{t_compile:.1f}s" if t_compile is not None else "n/a"
    print(f"fleet step: {fleet_ms:.1f} ms for S={S} "
          f"({fleet_ms / S:.2f} ms/member); first-call (compile) "
          f"{compile_str}; {n_train_steps} steps total", flush=True)
    if args.compare_single and steady_steps == 0:
        print("warning: --compare_single needs >= 2 epochs for a "
              "steady-state fleet timing; skipping the comparison",
              flush=True)
        args.compare_single = 0
    if args.timing_only:
        _compare_single(args, model, tx, base_solvers, opts, attack,
                        train_ds, members, S, fleet_ms)
        return

    # -- eval: whole test set as one batch, per-member solvers ------------
    xt = jnp.asarray(test_ds.images)
    yt = jnp.asarray(test_ds.labels)
    xts = jnp.broadcast_to(xt[None], (S,) + xt.shape)
    yts = jnp.broadcast_to(yt[None], (S,) + yt.shape)
    clean_fn = make_fleet_eval_step(model, base_solvers, opts)
    pgd_fn = make_fleet_eval_step(
        model, base_solvers, opts,
        attack_cfg=AttackConfig(mode="at", eps=args.eps, pgd_lr=2 / 255,
                                pgd_niter=7),
    )
    carry, k_eval = _split_fleet(carry)
    n_test = len(test_ds)
    clean = np.asarray(clean_fn(fts.params, fts.model_state, xts, yts,
                                k_eval, dyn)) / n_test
    carry, k_adv = _split_fleet(carry)
    robust = np.asarray(pgd_fn(fts.params, fts.model_state, xts, yts,
                               k_adv, dyn)) / n_test

    rows = []
    for i, (u, s) in enumerate(members):
        rows.append({"u0": u, "seed": s, "clean_acc": float(clean[i]),
                     "robust_acc": float(robust[i])})
        print(f"u={u:<7g} seed={s} clean={clean[i]:.4f} "
              f"pgd={robust[i]:.4f}", flush=True)
    for u in us:
        cs = [r["clean_acc"] for r in rows if r["u0"] == u]
        rs = [r["robust_acc"] for r in rows if r["u0"] == u]
        print(f"u={u:<7g} mean clean={np.mean(cs):.4f} "
              f"mean pgd={np.mean(rs):.4f} (n={len(cs)})", flush=True)

    os.makedirs(os.path.dirname(args.output_csv) or ".", exist_ok=True)
    with open(args.output_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["u0", "seed", "clean_acc",
                                          "robust_acc"])
        w.writeheader()
        w.writerows(rows)
    print("wrote", args.output_csv, flush=True)

    # -- single-run comparator: same step, S=1, steady-state ms/step ------
    _compare_single(args, model, tx, base_solvers, opts, attack, train_ds,
                    members, S, fleet_ms)


def _compare_single(args, model, tx, base_solvers, opts, attack, train_ds,
                    members, S, fleet_ms):
    if not args.compare_single:
        return
    sstep = make_train_step(model, tx, base_solvers, opts,
                            attack_cfg=attack)
    key = jax.random.key(members[0][1])
    key, k_init = jax.random.split(key)
    ts = create_train_state(model, tx, k_init)
    t_single = 0.0
    n_single = 0
    for epoch in range(2):
        for x, y in batch_iterator(train_ds, args.batch,
                                   seed=members[0][1] * 977 + epoch,
                                   crop_padding=4):
            key, sub = jax.random.split(key)
            te = time.time()
            ts, m = sstep(ts, jnp.asarray(x), jnp.asarray(y), sub)
            float(m["loss"])
            if epoch >= 1:
                t_single += time.time() - te
                n_single += 1
    single_ms = 1e3 * t_single / max(n_single, 1)
    print(f"single-run step: {single_ms:.2f} ms; sequential campaign "
          f"estimate {single_ms * S:.1f} ms/step-row vs fleet "
          f"{fleet_ms:.1f} ms -> amortization x"
          f"{single_ms * S / fleet_ms:.1f}", flush=True)


if __name__ == "__main__":
    main()
