"""MNIST robust-accuracy-vs-u sweep — the experiment behind the reference's
README.md:46-50 figure (RK2 parametrization sweep, PGD eval eps=0.3,
lr=2/255, 7 iters, multiple seeds).

For each u0 in the grid and each seed: train an MNIST MetaNODE with a frozen
RK2(u0) solver, evaluate clean + PGD robust accuracy, and write a CSV of
(u0, seed, clean_acc, robust_acc) — the data for the mean±sem curve.

TPU-native sweep efficiency: the solver's u enters the jitted train/eval
steps as a *traced argument* (``dynamic_solvers``), so the entire sweep
shares ONE compilation per step function — u is data, not a compile-time
constant.

  python -m neural_ode_metasolver_tpu.runners.u_sweep \
      --u_grid 0.1,0.3,0.5,0.6667,0.8,1.0 --seeds 1,2,3 \
      --nepochs 3 --data_root /path/to/mnist
"""
from __future__ import annotations

import argparse
import csv

import jax
import jax.numpy as jnp

from ..attacks import cross_entropy, pgd
from ..data import batch_iterator, load_mnist, synthetic_dataset
from ..models.api import build_model
from ..ops import SolverOptions, create_solver
from ..training import (
    create_train_state,
    learning_rate_with_decay,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from ..utils import get_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--u_grid",
                   type=lambda s: [float(i) for i in s.split(",")],
                   default=[0.1, 0.3, 0.5, 2 / 3, 0.8, 1.0])
    p.add_argument("--seeds",
                   type=lambda s: [int(i) for i in s.split(",")],
                   default=[1, 2, 3])
    p.add_argument("--n_steps", type=int, default=8)
    p.add_argument("--nepochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--optim", type=str, default="rmsprop")
    p.add_argument("--adv_training_mode", type=str, default="clean",
                   choices=["clean", "at"])
    p.add_argument("--eps", type=float, default=0.3)
    p.add_argument("--pgd_lr", type=float, default=2 / 255)
    p.add_argument("--pgd_niter", type=int, default=7)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--fallback_dataset", type=str, default="synthetic",
                   choices=["synthetic", "digits"])
    p.add_argument("--synthetic_train_size", type=int, default=2048)
    p.add_argument("--synthetic_test_size", type=int, default=512)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--output_csv", type=str, default="mnist_u_sweep.csv")
    p.add_argument("--fleet", action="store_true",
                   help="train every (u, seed) arm as ONE vmapped fleet "
                        "program (training/fleet.py) instead of "
                        "sequentially — same per-seed PRNG chains, one "
                        "device dispatch per step across all arms")
    p.add_argument("--fleet_chunk", type=int, default=None,
                   help="members per fleet program (default: auto — all "
                        "members in one program up to the measured "
                        "HBM-safe optimum of 16; beyond that, ONE "
                        "equal chunk size in (8, 16] chosen to "
                        "minimize padded throwaway members (a "
                        "different size is a different grouped-conv "
                        "numerics stream — pass --fleet_chunk 16 to "
                        "pin the S=16 stream for cross-campaign "
                        "comparability); 96 members in one program "
                        "OOMs a single core at 72 epochs — SCALING.md "
                        "'Fleet HBM bound')")
    return p.parse_args(argv)


# Measured fleet amortization optimum AND HBM-safe program size on the
# v5e core (SCALING.md round-4 curve: S=16 -> 2.29x per-member
# amortization; the 96-member single program OOMs HBM).  Used as the
# auto-chunk size when --fleet_chunk is unset and the member count
# exceeds it, so an oversized grid chunks instead of compiling one
# doomed program.
FLEET_SAFE_CHUNK = 16


def main(argv=None):
    args = parse_args(argv)
    logger = get_logger("u_sweep.log", name="u_sweep")

    if args.data_root:
        train_ds = load_mnist(args.data_root, train=True)
        test_ds = load_mnist(args.data_root, train=False)
    elif args.fallback_dataset == "digits":
        from ..data import load_digits_dataset

        logger.warning("no --data_root: real sklearn handwritten digits")
        train_ds, test_ds = load_digits_dataset(seed=0)
    else:
        logger.warning("no --data_root: synthetic data")
        train_ds = synthetic_dataset(args.synthetic_train_size, (28, 28, 1),
                                     seed=0)
        test_ds = synthetic_dataset(args.synthetic_test_size, (28, 28, 1),
                                    seed=1)

    model = build_model("mnist", dim=args.dim)
    opts = SolverOptions()
    ref_solver = create_solver("rk2", "u", n_steps=args.n_steps, u0=0.5)

    batches_per_epoch = max(len(train_ds) // args.batch_size, 1)
    sched = learning_rate_with_decay(
        args.lr, args.batch_size, batches_per_epoch
    )
    tx = make_optimizer(args.optim, sched, weight_decay=5e-4)
    from ..training.train import AttackConfig

    train_attack = AttackConfig(
        mode=args.adv_training_mode, eps=args.eps,
        pgd_lr=args.pgd_lr, pgd_niter=args.pgd_niter,
    )
    # ONE compiled step/predict reused for every (u, seed) configuration.
    step = make_train_step(model, tx, [ref_solver], opts,
                           attack_cfg=train_attack)
    predict = make_eval_step(model, [ref_solver], opts)

    @jax.jit
    def pgd_logits(params, state, x, y, key, solvers):
        def fwd(xi):
            logits, _, _ = model.apply(params, state, xi, list(solvers), opts,
                                       train=False)
            return logits

        xa, _ = pgd(fwd, key, x, y, args.eps, args.pgd_lr, args.pgd_niter)
        return fwd(xa)

    def evaluate(ts, solvers, key):
        correct = adv_correct = total = 0
        for x, y in batch_iterator(test_ds, 256, shuffle=False,
                                   drop_last=False):
            x, y = jnp.asarray(x), jnp.asarray(y)
            logits = predict(ts.params, ts.model_state, x,
                             dynamic_solvers=solvers)
            correct += int(jnp.sum(jnp.argmax(logits, -1) == y))
            key, sub = jax.random.split(key)
            alogits = pgd_logits(ts.params, ts.model_state, x, y, sub,
                                 tuple(solvers))
            adv_correct += int(jnp.sum(jnp.argmax(alogits, -1) == y))
            total += int(y.shape[0])
        return correct / total, adv_correct / total

    if args.fleet:
        rows = _run_fleet(args, model, tx, ref_solver, opts, train_attack,
                          train_ds, test_ds, logger)
        _write_csv(args.output_csv, rows)
        logger.info(f"wrote {len(rows)} rows to {args.output_csv}")
        return

    rows = []
    for u0 in args.u_grid:
        # vary ONLY the traced u leaf: u0 is a static pytree-treedef field
        # (ops/solver.py), so create_solver(u0=...) per grid point would
        # change the treedef and retrace/recompile the step for every u —
        # exactly the cost the dynamic_solvers design exists to avoid
        solvers = [ref_solver.replace(u=jnp.asarray(u0, jnp.float32))]
        for seed in args.seeds:
            key = jax.random.key(seed)
            key, k_init = jax.random.split(key)
            ts = create_train_state(model, tx, k_init)
            for epoch in range(args.nepochs):
                for x, y in batch_iterator(train_ds, args.batch_size,
                                           seed=seed * 1000 + epoch,
                                           crop_padding=4):
                    key, sub = jax.random.split(key)
                    ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), sub,
                                 dynamic_solvers=solvers)
            key, k_eval = jax.random.split(key)
            clean_acc, robust_acc = evaluate(ts, solvers, k_eval)
            logger.info(
                f"u0={u0:.4f} seed={seed} clean={clean_acc:.4f} "
                f"pgd={robust_acc:.4f}"
            )
            rows.append({"u0": u0, "seed": seed, "clean_acc": clean_acc,
                         "robust_acc": robust_acc})

    _write_csv(args.output_csv, rows)
    logger.info(f"wrote {len(rows)} rows to {args.output_csv}")


def _write_csv(path, rows):
    from ..utils import atomic_write

    with atomic_write(path, newline="") as f:
        w = csv.DictWriter(f, fieldnames=["u0", "seed", "clean_acc",
                                          "robust_acc"])
        w.writeheader()
        w.writerows(rows)


def _run_fleet(args, model, tx, ref_solver, opts, train_attack,
               train_ds, test_ds, logger):
    """The whole (u_grid x seeds) sweep as a fleet, chunked if asked.

    Per-member semantics are the sequential path's: member (u0, seed)
    consumes the identical per-seed PRNG chain (key(seed) -> init split ->
    per-step splits) and the identical per-epoch batch order
    (seed*1000+epoch), just advanced in one vmapped device dispatch per
    step.  Per-member params match the sequential stream to float
    tolerance (not bit-for-bit — see training/fleet.py numerics note), and
    the PGD eval draws its random starts from a differently-shaped key
    split, so robust accuracies are the same estimator, not the same
    sample.

    --fleet_chunk bounds members per compiled program: per-member HBM
    footprint is independent across members, so the full 4u x 24seed
    72-epoch sweep (96 members) overflows a single core while the same
    members in 24-member programs fit; equal-size chunks reuse one
    compilation.  Member results are chunk-order-invariant (per-member
    PRNG chains are derived from the seed, not the chunk).  When unset,
    member counts above FLEET_SAFE_CHUNK auto-chunk at that measured
    bound instead of compiling one doomed program.  A short tail chunk
    is padded with duplicate members to keep S constant — a smaller S is
    a different grouped-conv lowering (different numerics stream), and
    one campaign CSV must not mix two streams (the fleet_smoothing_lib
    pattern); padded duplicate rows are dropped.
    """
    members = [(u0, seed) for u0 in args.u_grid for seed in args.seeds]
    chunk = args.fleet_chunk
    if chunk is not None and chunk < 1:
        raise ValueError(f"--fleet_chunk must be >= 1, got {chunk} "
                         f"(omit the flag to auto-chunk at the measured "
                         f"HBM-safe bound {FLEET_SAFE_CHUNK})")
    if chunk is None:
        chunk = len(members)
        if chunk > FLEET_SAFE_CHUNK:
            # equal-size chunks only (one compilation, one numerics
            # stream); among HBM-safe sizes in (FLEET_SAFE_CHUNK/2,
            # FLEET_SAFE_CHUNK], minimize padded throwaway members —
            # each pad is a full-schedule training — then prefer the
            # larger chunk (fewer programs)
            n = len(members)
            chunk = min(range(FLEET_SAFE_CHUNK, FLEET_SAFE_CHUNK // 2, -1),
                        key=lambda c: (-(-n // c) * c - n, -c))
            logger.warning(
                f"--fleet_chunk unset with {len(members)} members: "
                f"auto-chunking at {chunk} (measured HBM-safe optimum "
                f"{FLEET_SAFE_CHUNK} — SCALING.md 'Fleet HBM bound'); "
                f"pass --fleet_chunk to override")
    n_chunks = -(-len(members) // chunk)
    rows = []
    for lo in range(0, len(members), chunk):
        part = members[lo:lo + chunk]
        n_real = len(part)
        if n_real < chunk and n_chunks > 1:
            logger.info(f"padding tail chunk {n_real} -> {chunk} members "
                        f"to keep one numerics stream")
            part = part + [part[0]] * (chunk - n_real)
        if n_chunks > 1:
            logger.info(f"fleet chunk {lo // chunk + 1}/{n_chunks}: "
                        f"{n_real} members")
        rows += _run_fleet_members(args, model, tx, ref_solver, opts,
                                   train_attack, train_ds, test_ds,
                                   logger, part)[:n_real]
    return rows


def _run_fleet_members(args, model, tx, ref_solver, opts, train_attack,
                       train_ds, test_ds, logger, members):
    import numpy as np

    from ..training import (
        create_fleet_state,
        fleet_keys,
        make_fleet_eval_step,
        make_fleet_train_step,
        stack_fleet_solvers,
    )
    from ..training.train import AttackConfig

    S = len(members)
    member_solvers = [
        [ref_solver.replace(u=jnp.asarray(u0, jnp.float32))]
        for (u0, _) in members
    ]
    dyn = stack_fleet_solvers(member_solvers)
    logger.info(f"fleet sweep: {S} members (of "
                f"{len(args.u_grid) * len(args.seeds)} total) in one "
                f"program")

    pairs = jax.vmap(jax.random.split)(
        fleet_keys([s for (_, s) in members]))
    carry, inits = pairs[:, 0], pairs[:, 1]
    fts = create_fleet_state(model, tx, inits)
    step = make_fleet_train_step(model, tx, [ref_solver], opts,
                                 attack_cfg=train_attack)
    for epoch in range(args.nepochs):
        iters = [
            batch_iterator(train_ds, args.batch_size,
                           seed=s * 1000 + epoch, crop_padding=4)
            for (_, s) in members
        ]
        for batches in zip(*iters):
            x = jnp.asarray(np.stack([b[0] for b in batches]))
            y = jnp.asarray(np.stack([b[1] for b in batches]))
            pairs = jax.vmap(jax.random.split)(carry)
            carry, subs = pairs[:, 0], pairs[:, 1]
            fts, _ = step(fts, x, y, subs, dyn)

    clean_fn = make_fleet_eval_step(model, [ref_solver], opts)
    pgd_fn = make_fleet_eval_step(
        model, [ref_solver], opts,
        attack_cfg=AttackConfig(mode="at", eps=args.eps,
                                pgd_lr=args.pgd_lr,
                                pgd_niter=args.pgd_niter),
    )
    counts_c = jnp.zeros(S, jnp.int32)
    counts_a = jnp.zeros(S, jnp.int32)
    total = 0
    for x, y in batch_iterator(test_ds, 256, shuffle=False,
                               drop_last=False):
        xs = jnp.broadcast_to(jnp.asarray(x)[None], (S,) + x.shape)
        ys = jnp.broadcast_to(jnp.asarray(y)[None], (S,) + y.shape)
        # one split per consumer (the campaign script's k_eval/k_adv
        # pattern): the clean path's key is unused at train=False today,
        # but sharing it with PGD would correlate the streams if clean
        # eval ever consumed it (e.g. regime sampling)
        pairs = jax.vmap(jax.random.split)(carry)
        carry, k_clean = pairs[:, 0], pairs[:, 1]
        pairs = jax.vmap(jax.random.split)(carry)
        carry, k_adv = pairs[:, 0], pairs[:, 1]
        counts_c = counts_c + clean_fn(fts.params, fts.model_state,
                                       xs, ys, k_clean, dyn)
        counts_a = counts_a + pgd_fn(fts.params, fts.model_state,
                                     xs, ys, k_adv, dyn)
        total += int(y.shape[0])
    clean = np.asarray(counts_c) / total
    robust = np.asarray(counts_a) / total

    rows = []
    for i, (u0, seed) in enumerate(members):
        logger.info(f"u0={u0:.4f} seed={seed} clean={clean[i]:.4f} "
                    f"pgd={robust[i]:.4f}")
        rows.append({"u0": u0, "seed": seed,
                     "clean_acc": float(clean[i]),
                     "robust_acc": float(robust[i])})
    return rows


if __name__ == "__main__":
    main()
