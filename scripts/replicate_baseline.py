"""One-command BASELINE.md replication driver.

Runs the full reference parity matrix (BASELINE.md; reference artifacts
``/root/reference/examples/cifar10/checkpoints/accuracy/*.pkl``,
README.md:52-66):

    3 seeds x {standalone, smoothing} FGSM-random adversarial training of
    premetanode10 (8-step RK2, cyclic LR triangular2, 36 epochs)
      -> clean / FGSM(8/255) / PGD(8/255, 2/255, 7) test accuracy
      -> sn_test step-count sweep written as reference-schema pickles
      -> delta table vs the BASELINE.md values with a 0.5% pass/fail bar

Usage:
    python scripts/replicate_baseline.py --data_root /path/to/cifar10
    python scripts/replicate_baseline.py --subset smoke   # prove the
        driver end-to-end on synthetic data in minutes (reduced epochs /
        steps grid; deltas reported as informational — the 0.5% bar only
        means something on real CIFAR-10)

Outputs under --out_dir (default results/baseline_replication):
    <arm>_seed<k>/            runner save_dirs (checkpoints, metrics.jsonl)
    accuracy/<arm>_<mode>.pkl reference-schema step-sweep tables (+ .csv)
    report.json, report.md    the delta table and pass/fail verdict
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BASELINE.md values at 8 steps, one per seed (pkl row order).
BASELINE = {
    ("standalone", "clean"): [0.8253, 0.8214, 0.8263],
    ("standalone", "fgsm"): [0.4047, 0.4107, 0.4067],
    ("standalone", "pgd"): [0.3534, 0.3617, 0.3554],
    ("smoothing", "clean"): [0.8293, 0.8279, 0.8283],
    ("smoothing", "fgsm"): [0.4131, 0.4162, 0.4125],
    ("smoothing", "pgd"): [0.3623, 0.3665, 0.3634],
}
# Evaluate-notebook regime rows on the smoothing checkpoint
# (BASELINE.md rows 7-10: single run, clean / FGSM at 8 steps).
BASELINE_REGIMES = {
    ("standalone", "clean"): 0.8279,
    ("standalone", "fgsm"): 0.4162,
    ("switch[0.6,0.4]", "clean"): 0.8277,
    ("switch[0.6,0.4]", "fgsm"): 0.4162,
    ("solver_ens[0.6,0.4]", "clean"): 0.8278,
    ("solver_ens[0.6,0.4]", "fgsm"): 0.4163,
    ("model_ensembling", "clean"): 0.8279,
    ("model_ensembling", "fgsm"): 0.4163,
}
PASS_BAR = 0.005  # BASELINE.json north star: within 0.5%


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None,
                   help="CIFAR-10 root (cifar-10-batches-py layout); "
                        "omit with --subset smoke for synthetic data")
    p.add_argument("--subset", choices=["full", "smoke"], default="full")
    p.add_argument("--out_dir", type=str,
                   default="results/baseline_replication")
    p.add_argument("--seeds", type=lambda s: [int(v) for v in s.split(",")],
                   default=None, help="default: 602,603,604 (full) / "
                                      "602 (smoke)")
    p.add_argument("--arms", type=lambda s: s.split(","),
                   default=["standalone", "smoothing"])
    p.add_argument("--nepochs", type=int, default=None,
                   help="override epochs (default 36 full / 1 smoke)")
    p.add_argument("--precision", default=None,
                   choices=[None, "f32", "bf16"],
                   help="default f32 (parity); bf16 for ~1.8x faster runs")
    p.add_argument("--eval_batches", type=int, default=None,
                   help="cap eval batches (smoke uses 2)")
    p.add_argument("--adv_eval_batch", type=int, default=None,
                   help="adversarial-eval batch size (default: 64 on "
                        "full, test_batch_size on smoke) — batch-256 "
                        "attack programs OOM HBM at compile at high "
                        "step counts; accuracy is batch-invariant")
    p.add_argument("--skip_training", action="store_true",
                   help="reuse existing checkpoints under --out_dir")
    p.add_argument("--force_cpu", action="store_true",
                   help="run on the local 8-device virtual CPU mesh "
                        "(smoke does this automatically)")
    p.add_argument("--grad_clip", type=float, default=None,
                   help="global-norm gradient clipping for the training "
                        "arms (cifar_runner --grad_clipping_threshold). "
                        "Real CIFAR-10 keeps gradients bounded without "
                        "it; --allow_synthetic rehearsals NEED ~1.0 — "
                        "norm-free premetanode10 diverges on separable "
                        "synthetic data at any precision (RESULTS.md "
                        "round-2 flagship finding)")
    p.add_argument("--allow_synthetic", action="store_true",
                   help="dress rehearsal: run --subset full at the real "
                        "protocol shape (premetanode10 width 64, 36 "
                        "epochs, batch 256, full steps grid, CIFAR-scale "
                        "synthetic data) WITHOUT --data_root; deltas are "
                        "informational like smoke — this exists to "
                        "exercise and time the parity-day path end to "
                        "end before real data is available")
    p.add_argument("--isolate", dest="isolate", action="store_true",
                   default=None,
                   help="run each train/eval unit in a fresh subprocess "
                        "(default on for --subset full off-cpu): the "
                        "tunneled-TPU client leaks ~3-5 MB of host RSS "
                        "per dispatched batch, so a 6-arm run in ONE "
                        "process crosses the host's 125 GB and gets "
                        "OOM-killed (round-5 postmortem: 126 GB anon-rss "
                        "kill at 9850 s); per-unit processes cap the "
                        "leak at one unit's footprint (~25 GB)")
    p.add_argument("--no_isolate", dest="isolate", action="store_false")
    p.add_argument("--stage", type=str, default=None,
                   help="internal: run ONE unit ('train:<arm>:<seed>' | "
                        "'eval:<arm>:<seed>' | 'regimes:<arm>:<seed>') "
                        "and exit; spawned by the --isolate parent")
    return p.parse_args(argv)


def train_arm(arm, seed, save_dir, args):
    from neural_ode_metasolver_tpu.runners import cifar_runner

    smoke = args.subset == "smoke"
    argv = [
        "--network", "premetanode10",
        "--solvers", ("rk2,u,2,-1,0.5,-1" if smoke
                      else "rk2,u,8,-1,0.5,-1"),
        "--adv_training_mode", "fgsm_random",
        "--adv_testing_mode", "clean",
        "--seed", str(seed),
        "--nepochs", str(args.nepochs or (1 if smoke else 36)),
        "--save_dir", save_dir,
        "--precision", args.precision or "f32",
    ]
    if arm == "smoothing":
        argv += ["--noise_type", "normal", "--noise_sigma", "0.0125",
                 "--noise_prob", "1.0"]
    if args.grad_clip is not None:
        argv += ["--grad_clipping_threshold", str(args.grad_clip)]
    if smoke:
        argv += ["--in_planes", "8", "--batch_size", "32",
                 "--test_batch_size", "32",
                 "--synthetic_train_size", "64",
                 "--synthetic_test_size", "32",
                 "--val_perc", "0.25",
                 "--step_size_up", "4"]
    elif not args.data_root:
        # --allow_synthetic dress rehearsal: CIFAR-scale synthetic data so
        # the full path runs at exactly the parity-day step counts
        # (50,000 - val split train / 10,000 test)
        argv += ["--synthetic_train_size", "50000",
                 "--synthetic_test_size", "10000"]
    if args.data_root:
        argv += ["--data_root", args.data_root]
    cifar_runner.main(argv)


def _restore_for_eval(save_dir, args, synth_n, synth_seed):
    """Restore one trained checkpoint for evaluation: rebuild the model +
    optimizer template from the config sidecar, restore the train state,
    and build the shared eval ``data()`` factory.

    The ONE restore path for both ``eval_arm`` and ``eval_regimes`` — a
    drift between them would silently evaluate a mis-rebuilt model (param
    tree mismatch at restore is exactly the hazard the attacks_runner
    comment warns about).  Returns ``(cfg, margs, model, ts, data)``."""
    import glob as _glob
    import itertools

    import jax

    from neural_ode_metasolver_tpu.data import (
        CIFAR10_MEAN,
        CIFAR10_STD,
        batch_iterator,
        load_cifar10,
        synthetic_dataset,
    )
    from neural_ode_metasolver_tpu.runners.attacks_runner import (
        _model_from_config,
        _rebuild,
    )
    from neural_ode_metasolver_tpu.runners.common import (
        optimizer_from_saved_args,
    )
    from neural_ode_metasolver_tpu.training import (
        create_train_state,
        restore_checkpoint,
    )

    step_dirs = sorted(_glob.glob(os.path.join(save_dir, "last", "step_*")))
    if not step_dirs:
        raise FileNotFoundError(f"no checkpoint under {save_dir}/last")
    cfg = _rebuild(step_dirs[-1])
    model, mean, std, shape = _model_from_config(cfg)
    margs = cfg.get("args", {})
    tx = optimizer_from_saved_args(margs)
    template = create_train_state(model, tx, jax.random.key(0))
    ts, _ = restore_checkpoint(os.path.join(save_dir, "last"), template)

    if args.data_root:
        ds = load_cifar10(args.data_root, train=False)
    else:
        ds = synthetic_dataset(synth_n, shape, seed=synth_seed)
    max_batches = args.eval_batches or (
        2 if args.subset == "smoke" else None)

    def data(bs=None):
        it = batch_iterator(ds, bs or margs.get("test_batch_size", 256),
                            shuffle=False, drop_last=False,
                            mean=CIFAR10_MEAN, std=CIFAR10_STD)
        return itertools.islice(it, max_batches) if max_batches else it

    return cfg, margs, model, ts, data


def _adv_eval_batch(args, margs):
    """Adversarial-eval batch: accuracy is a per-example mean, so batching
    doesn't change the value — but the attack's input-gradient program's
    HBM footprint scales with batch x n_steps (the round-4 gelu_equiv
    postmortem: a batch-256 8-step FGSM eval compiled at 36.13G vs the
    chip's 15.75G), and the step-sweep goes to 16 steps.  Cap it."""
    if args.adv_eval_batch:
        return args.adv_eval_batch
    bs = margs.get("test_batch_size", 256)
    return bs if args.subset == "smoke" else min(64, bs)


def eval_arm(arm, seed, save_dir, args, steps_grid):
    """clean/FGSM/PGD accuracy across the step grid for one checkpoint.

    Returns ``{mode: [acc per step]}`` aligned with ``steps_grid``."""
    import jax

    from neural_ode_metasolver_tpu.data import CIFAR10_MEAN, CIFAR10_STD
    from neural_ode_metasolver_tpu.ops import (
        SolverOptions,
        parse_solver_dsl,
    )
    from neural_ode_metasolver_tpu.training import (
        AttackConfig,
        accuracy,
        adversarial_accuracy,
    )

    cfg, margs, model, ts, data = _restore_for_eval(
        save_dir, args,
        synth_n=256 if args.subset == "smoke" else 10000,
        synth_seed=seed + 1,
    )
    solvers = parse_solver_dsl(cfg["solvers"])

    opts = SolverOptions()
    attack_cfgs = {
        "clean": None,
        "fgsm": AttackConfig(mode="fgsm", eps=8 / 255,
                             mean=CIFAR10_MEAN, std=CIFAR10_STD),
        "pgd": AttackConfig(mode="at", eps=8 / 255, pgd_lr=2 / 255,
                            pgd_niter=7, mean=CIFAR10_MEAN,
                            std=CIFAR10_STD),
    }
    adv_bs = _adv_eval_batch(args, margs)
    out = {m: [] for m in attack_cfgs}
    for n in steps_grid:
        # the sn_test re-grid semantics (metrics.py:27-41): the TRAINED
        # params evaluated under a solver with a different step count
        s = solvers[0].replace(n_steps=int(n), step_size=None,
                               custom_grid=None)
        for mode, acfg in attack_cfgs.items():
            if acfg is None:
                acc = accuracy(model, ts.params, ts.model_state, [s], opts,
                               data())
            else:
                acc = adversarial_accuracy(
                    model, ts.params, ts.model_state, [s], opts,
                    data(adv_bs), acfg, jax.random.key(1000 + seed),
                    remat=True,
                )
            out[mode].append(float(acc))
            print(f"  [{arm} seed={seed}] steps={n} {mode}: {acc:.4f}",
                  flush=True)
    return out


def eval_regimes(save_dir, args):
    """Four-regime eval of one (smoothing) checkpoint at the reference's
    8 steps — the Evaluate-notebook grid (cells 13-28): standalone /
    switch[0.6,0.4] over u in {0.5, 1.0} / solver ensembling [0.6,0.4] /
    model ensembling over 2 sigma=0.2-noised solvers with joint
    ensemble-FGSM.  Returns {(regime, mode): acc}."""
    import jax

    from neural_ode_metasolver_tpu.data import CIFAR10_MEAN, CIFAR10_STD
    from neural_ode_metasolver_tpu.ops import SolverOptions, parse_solver_dsl
    from neural_ode_metasolver_tpu.training import (
        AttackConfig,
        accuracy,
        accuracy_ensemble,
        adversarial_accuracy,
        adversarial_accuracy_ensemble,
        notebook_regime_grid,
    )

    cfg, margs, model, ts, data = _restore_for_eval(
        save_dir, args, synth_n=256, synth_seed=99,
    )
    adv_bs = _adv_eval_batch(args, margs)

    base = parse_solver_dsl(cfg["solvers"])[0]
    n = 2 if args.subset == "smoke" else 8
    s05 = base.replace(n_steps=n, step_size=None, custom_grid=None)
    fgsm = AttackConfig(mode="fgsm", eps=8 / 255, mean=CIFAR10_MEAN,
                        std=CIFAR10_STD)
    P, S = ts.params, ts.model_state
    out = {}

    def rec(regime, clean, adv):
        out[(regime, "clean")] = float(clean)
        out[(regime, "fgsm")] = float(adv)
        print(f"  [regimes] {regime:20s} clean={clean:.4f} "
              f"fgsm={adv:.4f}", flush=True)

    # the ONE grid construction shared with scripts/digits_regimes_eval.py
    # (training.notebook_regime_grid); this driver's eval keys are 50-56
    grid = notebook_regime_grid(s05, jax.random.key(55))
    # script-local eval key SEEDS only; whether clean eval needs a key at
    # all comes from the spec itself (RegimeSpec.needs_key)
    eval_keys = {
        "standalone": (None, 50),
        "switch[0.6,0.4]": (51, 52),
        "solver_ens[0.6,0.4]": (53, 54),
        "model_ensembling": (None, 56),
    }
    for spec in grid:
        k_clean, k_adv = eval_keys[spec.name]
        assert (k_clean is not None) == spec.needs_key, spec.name
        if spec.is_model_ensemble:
            members = [(P, S, [s], SolverOptions()) for s in spec.solvers]
            rec(spec.name,
                accuracy_ensemble(model, members, data()),
                adversarial_accuracy_ensemble(model, members,
                                              data(adv_bs), fgsm,
                                              jax.random.key(k_adv),
                                              remat=True))
        else:
            ck = None if k_clean is None else jax.random.key(k_clean)
            rec(spec.name,
                accuracy(model, P, S, list(spec.solvers), spec.options,
                         data(), key=ck),
                adversarial_accuracy(model, P, S, list(spec.solvers),
                                     spec.options, data(adv_bs), fgsm,
                                     jax.random.key(k_adv), remat=True))
    return out


def main(argv=None):
    raw_argv = list(sys.argv[1:] if argv is None else argv)
    args = parse_args(argv)
    smoke = args.subset == "smoke"
    if args.isolate is None:
        # full off-cpu runs dispatch ~10k+ batches per arm through the
        # leaky tunnel client — isolate by default; smoke/cpu runs are
        # short and fork-free tests expect in-process execution
        args.isolate = args.subset == "full" and not args.force_cpu
    if smoke or args.force_cpu:
        # prove the plumbing on the fast local CPU mesh; full parity runs
        # keep the default (TPU) backend.  Must precede any jax import —
        # the env's sitecustomize force-registers the remote TPU backend
        # and only the config knob overrides it (CLAUDE.md).
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", ".jax_cache_cpu")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    else:
        # full replication compiles the train step plus a steps_grid x
        # attack-mode matrix of eval variants; TPU compiles run 5-10+ min
        # each, so the persistent cache is mandatory for interrupted /
        # re-run parity days (CLAUDE.md environment facts).
        import jax

        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    seeds = args.seeds or ([602] if smoke else [602, 603, 604])
    steps_grid = [1, 2] if smoke else [1, 2, 4, 6, 8, 10, 12, 14, 16]
    ref_step = steps_grid[-1] if smoke else 8
    # Full provenance of a banked eval sweep: a --skip_training resume
    # must not reuse a sweep produced under different eval settings or
    # a different data source (e.g. a truncated --eval_batches quick
    # check, or a synthetic rehearsal's cache picked up by a later
    # --data_root real run sharing the out_dir).
    eval_meta = {"steps_grid": steps_grid, "subset": args.subset,
                 "eval_batches": args.eval_batches,
                 "adv_eval_batch": args.adv_eval_batch,
                 "data": args.data_root or "synthetic"}
    if not smoke and not args.data_root and not args.allow_synthetic:
        raise SystemExit(
            "--subset full needs --data_root with real CIFAR-10 "
            "(--subset smoke proves the driver in minutes; "
            "--allow_synthetic runs the full shape on synthetic data)"
        )
    # 'informational' = the 0.5% bar cannot mean anything (synthetic data)
    informational = smoke or not args.data_root

    from neural_ode_metasolver_tpu.training.accuracy_tables import (
        save_accuracy_table,
    )
    from neural_ode_metasolver_tpu.utils.misc import atomic_write

    os.makedirs(args.out_dir, exist_ok=True)
    evals_dir = os.path.join(args.out_dir, "evals")
    os.makedirs(evals_dir, exist_ok=True)

    if args.stage:
        # child process: execute ONE unit and exit.  Eval stages write the
        # banked-eval JSON themselves (atomically) so the parent — and any
        # later --skip_training resume — reads the result from disk.
        kind, arm, seed_s = args.stage.split(":")
        seed = int(seed_s)
        save_dir = os.path.join(args.out_dir, f"{arm}_seed{seed}")
        if kind == "train":
            train_arm(arm, seed, save_dir, args)
        elif kind in ("eval", "regimes"):
            if kind == "eval":
                name = f"{arm}_seed{seed}.json"
                result = eval_arm(arm, seed, save_dir, args, steps_grid)
            else:
                name = f"regimes_{arm}_seed{seed}.json"
                result = [[r, m, a] for (r, m), a
                          in eval_regimes(save_dir, args).items()]
            with atomic_write(os.path.join(evals_dir, name)) as f:
                json.dump(dict(eval_meta, result=result), f)
        else:
            raise SystemExit(f"unknown --stage kind {kind!r}")
        return None

    def _spawn(stage):
        """Run one unit in a fresh interpreter (same CLI + --stage).  The
        per-dispatch host-RSS leak in the tunneled-TPU client dies with
        the child; the parent never opens a device connection in isolate
        mode (report assembly is pure python)."""
        import signal
        import subprocess

        base = [a for i, a in enumerate(raw_argv)
                if a != "--stage" and (i == 0 or raw_argv[i - 1] != "--stage")]
        cmd = [sys.executable, os.path.abspath(__file__), *base,
               "--stage", stage]
        print(f"  [isolate] spawning {stage}", flush=True)
        proc = subprocess.Popen(cmd)

        def _forward(signum, _frame):
            # `timeout N parent` SIGTERMs only the parent: without
            # forwarding, the child would survive as an orphan still
            # dispatching to the chip, colliding with the retry's fresh
            # job (chip jobs must never run concurrently — CLAUDE.md)
            proc.send_signal(signum)
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
            raise SystemExit(128 + signum)

        prev = signal.signal(signal.SIGTERM, _forward)
        try:
            rc = proc.wait()
        finally:
            signal.signal(signal.SIGTERM, prev)
        if rc != 0:
            raise RuntimeError(f"isolated stage {stage} exited rc={rc}")

    def _eval_cached(cache_name, trained_now, run):
        """Bank one eval sweep's result so a timed-out chip window does
        not redo it: the report is only written at the very end, and a
        multi-seed full run spans several 10-min-split tries — without
        this, every completed sweep (~15-20 min hot each) re-runs on
        resume.  The cache is only trusted when this try did NOT retrain
        the arm (the same rule as --skip_training's checkpoint reuse; a
        fixed seed retrains to the same state, but a retrain means the
        prior cache's provenance is gone) and the FULL eval provenance
        (steps grid, subset, eval batch limits, data source) matches."""
        path = os.path.join(evals_dir, cache_name)
        if not trained_now and os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            if all(d.get(k) == v for k, v in eval_meta.items()):
                print(f"  [evals] reusing banked {cache_name}", flush=True)
                return d["result"]
        result = run()
        with atomic_write(path) as f:
            json.dump(dict(eval_meta, result=result), f)
        return result

    tables = {}  # (arm, mode) -> rows (one per seed)
    regime_rows = None
    regime_seed = seeds[1] if len(seeds) > 1 else seeds[0]
    for arm in args.arms:
        for seed in seeds:
            save_dir = os.path.join(args.out_dir, f"{arm}_seed{seed}")
            trained_now = not (args.skip_training
                               and os.path.isdir(os.path.join(save_dir,
                                                              "last")))
            if trained_now:
                print(f"== training {arm} seed={seed} ==", flush=True)
                if args.isolate:
                    _spawn(f"train:{arm}:{seed}")
                else:
                    train_arm(arm, seed, save_dir, args)
            print(f"== evaluating {arm} seed={seed} ==", flush=True)

            def _run_eval(arm=arm, seed=seed, save_dir=save_dir):
                if args.isolate:
                    # the child wrote the banked JSON itself
                    _spawn(f"eval:{arm}:{seed}")
                    with open(os.path.join(evals_dir,
                                           f"{arm}_seed{seed}.json")) as f:
                        return json.load(f)["result"]
                return eval_arm(arm, seed, save_dir, args, steps_grid)

            accs = _eval_cached(
                f"{arm}_seed{seed}.json", trained_now, _run_eval)
            for mode, row in accs.items():
                tables.setdefault((arm, mode), []).append(row)
            if arm == "smoothing" and seed == regime_seed:
                # Evaluate-notebook regime grid on the SECOND smoothing
                # checkpoint when available: BASELINE_REGIMES standalone
                # clean/fgsm (0.8279/0.4162) equal the second pkl seed's
                # 8-step values, i.e. the notebook ran on that seed's
                # checkpoint — comparing a different seed's checkpoint
                # would bake a systematic delta into the 0.5% bar
                print(f"== regime grid on {arm} seed={seed} ==", flush=True)

                def _run_regimes(arm=arm, seed=seed, save_dir=save_dir):
                    if args.isolate:
                        _spawn(f"regimes:{arm}:{seed}")
                        with open(os.path.join(
                                evals_dir,
                                f"regimes_{arm}_seed{seed}.json")) as f:
                            return json.load(f)["result"]
                    return [[r, m, a] for (r, m), a
                            in eval_regimes(save_dir, args).items()]

                rows_list = _eval_cached(
                    f"regimes_{arm}_seed{seed}.json", trained_now,
                    _run_regimes)
                regime_rows = {(r, m): a for r, m, a in rows_list}

    acc_dir = os.path.join(args.out_dir, "accuracy")
    report = {"subset": args.subset, "seeds": seeds,
              "steps_grid": steps_grid, "rows": []}
    lines = [
        "# BASELINE replication report",
        "",
        f"subset={args.subset} seeds={seeds} steps_grid={steps_grid}",
        "",
        "| arm | mode | ours @8 steps (per seed) | reference | max delta |"
        " pass (<=0.5%) |",
        "|---|---|---|---|---|---|",
    ]
    overall_pass = True
    for (arm, mode), rows in tables.items():
        save_accuracy_table(
            os.path.join(acc_dir, f"fgsm_random_8_255_"
                         f"{'smoothing_00125_' if arm == 'smoothing' else ''}"
                         f"{mode}.pkl"),
            rows, steps_grid,
        )
        at8 = [row[steps_grid.index(ref_step)] for row in rows]
        ref = BASELINE.get((arm, mode))
        if ref is None:
            continue
        deltas = [abs(a - r) for a, r in zip(at8, ref[:len(at8)])]
        ok = max(deltas) <= PASS_BAR
        if not informational:
            overall_pass = overall_pass and ok
        report["rows"].append({
            "arm": arm, "mode": mode, "ours_at_ref_steps": at8,
            "reference": ref, "max_delta": max(deltas),
            "pass": ok if not informational else None,
        })
        lines.append(
            f"| {arm} | {mode} | "
            f"{' / '.join(f'{a:.4f}' for a in at8)} | "
            f"{' / '.join(f'{r:.4f}' for r in ref[:len(at8)])} | "
            f"{max(deltas):.4f} | "
            f"{'n/a (synthetic)' if informational else ('PASS' if ok else 'FAIL')} |"
        )
    if regime_rows:
        lines += ["", "| regime (smoothing ckpt) | mode | ours | reference "
                      "| delta | pass |", "|---|---|---|---|---|---|"]
        for (regime, mode), acc in regime_rows.items():
            ref = BASELINE_REGIMES.get((regime, mode))
            d = abs(acc - ref) if ref is not None else None
            ok = (d is not None and d <= PASS_BAR)
            if not informational and ref is not None:
                overall_pass = overall_pass and ok
            report["rows"].append({
                "arm": "smoothing_regimes", "regime": regime, "mode": mode,
                "ours": acc, "reference": ref,
                "max_delta": d, "pass": ok if not informational else None,
            })
            lines.append(
                f"| {regime} | {mode} | {acc:.4f} | "
                f"{'-' if ref is None else f'{ref:.4f}'} | "
                f"{'-' if d is None else f'{d:.4f}'} | "
                f"{'n/a (synthetic)' if informational else ('PASS' if ok else 'FAIL')} |"
            )
    report["overall_pass"] = None if informational else overall_pass
    lines += ["", ("Synthetic-data run: deltas are informational; "
                   "the 0.5% bar applies to real CIFAR-10 runs only."
                   if informational else
                   f"Overall: "
                   f"{'PASS' if overall_pass else 'FAIL'} vs the 0.5% bar.")]
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    with open(os.path.join(args.out_dir, "report.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return report


if __name__ == "__main__":
    main()
