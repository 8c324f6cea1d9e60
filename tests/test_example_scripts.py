"""The examples/*.py scripts run end-to-end (subprocess smoke, tiny
shapes) — the executable counterparts of the reference's example drivers,
tested like the notebooks are."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script),
         "--platform", "cpu"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=480,
    )
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    return res.stdout


def test_mnist_build_and_evaluate_script():
    out = _run("mnist_build_and_evaluate.py",
               ["--batch_size", "8", "--n_eval", "16", "--n_steps", "2"])
    assert "acc" in out.lower()


def test_cifar10_build_and_evaluate_script():
    out = _run("cifar10_build_and_evaluate.py",
               ["--in_planes", "8", "--batch_size", "8", "--n_eval", "16",
                "--n_steps", "2"])
    # all four regimes evaluated
    for label in ("standalone", "switch", "solver ens", "model ensembling"):
        assert label in out, out[-600:]


def test_learn_solver_coefficient_script():
    out = _run("learn_solver_coefficient.py", ["--steps", "10"])
    assert "u" in out.lower()


def test_replicate_baseline_smoke_driver(tmp_path):
    """The one-command BASELINE replication driver (VERDICT r2 item 2)
    proves itself end to end in --subset smoke: trains one arm on
    synthetic data, evaluates clean/FGSM/PGD over the step grid, and
    emits the reference-schema pickles plus the delta report."""
    import json

    out_dir = str(tmp_path / "rep")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "replicate_baseline.py"),
         "--subset", "smoke", "--out_dir", out_dir,
         "--arms", "standalone", "--eval_batches", "1"],
        cwd=REPO, env=dict(os.environ), capture_output=True, text=True,
        timeout=540,
    )
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    report = json.load(open(os.path.join(out_dir, "report.json")))
    assert report["overall_pass"] is None  # informational on smoke
    modes = {r["mode"] for r in report["rows"]}
    assert modes == {"clean", "fgsm", "pgd"}
    from neural_ode_metasolver_tpu.training.accuracy_tables import (
        load_accuracy_table,
    )
    t = load_accuracy_table(
        os.path.join(out_dir, "accuracy", "fgsm_random_8_255_clean.pkl"))
    assert t["steps_arr"] == [1, 2] and len(t["accs"]) == 1
    assert os.path.exists(os.path.join(out_dir, "report.md"))

    # resume path: --skip_training reuses both the checkpoint AND the
    # banked per-arm eval cache (evals/*.json) — a timed-out multi-seed
    # chip try must not redo completed eval sweeps, only rebuild the
    # report from the caches
    res2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "replicate_baseline.py"),
         "--subset", "smoke", "--out_dir", out_dir,
         "--arms", "standalone", "--eval_batches", "1",
         "--skip_training"],
        cwd=REPO, env=dict(os.environ), capture_output=True, text=True,
        timeout=540,
    )
    assert res2.returncode == 0, (res2.stdout[-2000:], res2.stderr[-2000:])
    assert "reusing banked standalone_seed602.json" in res2.stdout
    assert "== training" not in res2.stdout
    report2 = json.load(open(os.path.join(out_dir, "report.json")))
    assert report2["rows"] == report["rows"]


def test_replicate_baseline_isolate_stages(tmp_path):
    """--isolate runs every train/eval unit in a fresh subprocess (the
    round-5 host-OOM mitigation: the tunneled-TPU client leaks host RSS
    per dispatched batch, so one process running all 6 full arms crosses
    the host memory limit).  The staged path must produce the same
    report schema as the in-process path, via the same banked-eval
    JSONs the resume path reads."""
    import json

    out_dir = str(tmp_path / "rep_iso")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "replicate_baseline.py"),
         "--subset", "smoke", "--out_dir", out_dir,
         "--arms", "standalone", "--eval_batches", "1", "--isolate"],
        cwd=REPO, env=dict(os.environ), capture_output=True, text=True,
        timeout=540,
    )
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    assert "[isolate] spawning train:standalone:602" in res.stdout
    assert "[isolate] spawning eval:standalone:602" in res.stdout
    report = json.load(open(os.path.join(out_dir, "report.json")))
    assert {r["mode"] for r in report["rows"]} == {"clean", "fgsm", "pgd"}
    # the eval child banked its sweep where --skip_training resumes look
    cache = json.load(
        open(os.path.join(out_dir, "evals", "standalone_seed602.json")))
    assert cache["steps_grid"] == [1, 2]
    clean_row = [r for r in report["rows"] if r["mode"] == "clean"][0]
    # smoke's ref step is the grid's last entry; the report's per-seed
    # value must be the banked sweep's value at that step
    assert clean_row["ours_at_ref_steps"] == [cache["result"]["clean"][-1]]


def test_cifar_example_restores_default_runner_checkpoint(tmp_path):
    """The example's restore template must be rebuilt from the saved
    config: a checkpoint trained with the runner DEFAULTS (sgd +
    cycle_momentum=True wraps the momentum trace in inject_hyperparams,
    changing the opt-state pytree) previously failed orbax restore
    against the example's hardcoded plain-SGD template."""
    import glob

    from neural_ode_metasolver_tpu.runners import cifar_runner

    save = str(tmp_path / "exp")
    cifar_runner.main([
        "--network", "premetanode10",  # the example builds this registry
        "--in_planes", "8",
        "--solvers", "rk2,u,2,-1,0.5,-1",
        "--nepochs", "1",
        "--batch_size", "8",
        "--test_batch_size", "8",
        "--synthetic_train_size", "32",
        "--synthetic_test_size", "16",
        "--val_perc", "0.25",
        "--save_dir", save,
    ])
    ckpt = os.path.join(save, "last")  # written unconditionally
    assert glob.glob(os.path.join(ckpt, "step_*"))
    out = _run("cifar10_build_and_evaluate.py",
               ["--checkpoint", ckpt, "--in_planes", "8",
                "--batch_size", "8", "--n_eval", "16", "--n_steps", "2"])
    assert "loaded checkpoint" in out


def test_smoothing_best_iterate_fleet_matches_sequential(tmp_path):
    """--fleet trains both CRN arms' seeds as vmapped fleet programs
    (scripts/fleet_smoothing_lib.py) and reproduces the sequential
    driver's clean endpoints (per-member params match the sequential
    stream to float tolerance — training/fleet.py numerics note — so
    argmax counts agree up to borderline samples); PGD robust numbers
    are the same estimator under a different key-split shape, asserted
    only for range.  Mirrors test_u_sweep_fleet_matches_sequential."""
    import csv

    common = [
        "--seeds", "1,2",
        "--nepochs", "2",
        "--n_steps", "2",
        "--dim", "8",
        "--force_cpu",
    ]
    seq_csv = str(tmp_path / "seq.csv")
    fleet_csv = str(tmp_path / "fleet.csv")

    def run(extra):
        res = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "digits_smoothing_best_iterate.py")]
            + common + extra,
            cwd=REPO, env=dict(os.environ), capture_output=True, text=True,
            timeout=540,
        )
        assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])

    run(["--output_csv", seq_csv])
    # fleet_chunk=1 exercises the chunking loop (2 chunks/arm, shared
    # compilation) on top of the fleet numerics path
    run(["--fleet", "--fleet_chunk", "1", "--output_csv", fleet_csv])

    seq = {(r["regime"], r["seed"]): r for r in csv.DictReader(open(seq_csv))}
    fleet = {(r["regime"], r["seed"]): r
             for r in csv.DictReader(open(fleet_csv))}
    assert set(fleet) == set(seq) and len(fleet) == 4
    for k in seq:
        for col in ("clean_acc", "final_clean"):
            d = abs(float(fleet[k][col]) - float(seq[k][col]))
            assert d <= 0.03, (k, col, fleet[k], seq[k])
        for col in ("robust_acc", "final_robust"):
            assert 0.0 <= float(fleet[k][col]) <= 1.0
        assert 0 <= int(fleet[k]["best_epoch"]) <= 1, (k, fleet[k])


def test_gelu_equiv_36ep_resume_merge_and_verdict(tmp_path, monkeypatch):
    """The equivalence driver must (a) never drop banked arms at other
    epoch counts on rewrite (a smoke run erased the full-schedule erf
    arm in round 4's original design), (b) reuse arms keyed by
    (acts, seed, nepochs), and (c) emit a trajectory-based verdict —
    accuracies saturate at 1.0 on the synthetic task and are
    non-binding."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "gelu_equiv_36ep",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "gelu_equiv_36ep.py"))
    mod = importlib.util.module_from_spec(spec)
    # the script's top level runs bench_env.setup(), which repoints the
    # process-wide compile cache at the TPU .jax_cache — restore the
    # suite's CPU cache config afterwards or every later test in this
    # pytest process pollutes the persistent TPU cache
    import jax
    prev_env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    prev_cache = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    spec.loader.exec_module(mod)
    if prev_env is None:
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    else:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = prev_env
    jax.config.update("jax_compilation_cache_dir", prev_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)

    out = str(tmp_path / "equiv.json")
    full = {"acts": "GeLU", "seed": 602, "nepochs": 36, "clean": 1.0,
            "fgsm": 1.0, "pgd": 1.0, "final_loss": 1e-4,
            "peak_loss": 5e-4, "epoch_losses": [2.3, 1.6] + [1e-3] * 34,
            "train_s": 1.0}
    with open(out, "w") as f:
        json.dump({"nepochs": 36, "arms": [full]}, f)

    calls = []

    def fake_run(acts, seed, nepochs, tr, te, eval_batch=64):
        calls.append((acts, seed, nepochs))
        base = ([2.31, 1.58] if seed == 602 else [2.2, 1.7])
        base = base + [1.2e-3] * (nepochs - 2)
        return {"acts": acts, "seed": seed, "nepochs": nepochs,
                "eval_batch": eval_batch, "clean": 1.0, "fgsm": 1.0,
                "pgd": 1.0, "final_loss": base[-1], "peak_loss": 1e-3,
                "epoch_losses": base, "train_s": 1.0}

    monkeypatch.setattr(mod, "run", fake_run)
    monkeypatch.setattr(mod, "synthetic_dataset", lambda *a, **k: None)
    argv = ["x", "--out", out,
            "--arms", "GeLU:602,GeLUpoly:602,GeLU:603"]

    # smoke-length run: banked 36-epoch arm must survive the rewrite,
    # and a smoke verdict must NOT claim the top-level "verdict" key
    # (the chip drivers' done-check — reserved for the full schedule)
    monkeypatch.setattr(sys, "argv", argv + ["--nepochs", "2"])
    mod.main()
    d = json.load(open(out))
    keys = {(a["acts"], a["seed"], a["nepochs"]) for a in d["arms"]}
    assert ("GeLU", 602, 36) in keys
    assert ("GeLUpoly", 602, 2) in keys
    assert "verdict" not in d and "2" in d["verdicts"]

    # full run: reuses the banked erf arm, runs only the 2 missing arms
    calls.clear()
    monkeypatch.setattr(sys, "argv", argv + ["--nepochs", "36"])
    mod.main()
    assert calls == [("GeLUpoly", 602, 36), ("GeLU", 603, 36)]
    d = json.load(open(out))
    v = d["verdict"]
    assert v == d["verdicts"]["36"] and "2" in d["verdicts"]
    assert v["accuracies_saturated"] is True
    assert "loss_trajectory" in v and v["equivalent"] is True
    assert v["loss_trajectory"]["within_seed_noise"] is True

    # a later smoke run must not erase or overwrite the banked 36-epoch
    # verdict
    monkeypatch.setattr(sys, "argv",
                        argv + ["--nepochs", "3"])
    mod.main()
    d = json.load(open(out))
    assert d["verdict"] == v and d["verdicts"]["36"] == v

    # fourth arm (GeLUpoly @ the yardstick seed) completes the 2x2
    # matrix: the verdict must then bind on BOTH paired activation
    # deltas and record the second pair
    calls.clear()
    argv4 = argv[:-1] + ["GeLU:602,GeLUpoly:602,GeLU:603,GeLUpoly:603"]
    monkeypatch.setattr(sys, "argv", argv4 + ["--nepochs", "36"])
    mod.main()
    assert calls == [("GeLUpoly", 603, 36)]
    d = json.load(open(out))
    v4 = d["verdict"]
    assert v4["paired_points"] == 2
    assert v4["loss_trajectory"]["activation_delta_seed603"] is not None
    assert v4["equivalent"] is True

    # a divergent seed-603 poly arm must flip the verdict even though
    # the seed-602 pair alone would pass
    d["arms"] = [a for a in d["arms"]
                 if not (a["acts"] == "GeLUpoly" and a["seed"] == 603)]
    with open(out, "w") as f:
        json.dump(d, f)

    def bad_run(acts, seed, nepochs, tr, te, eval_batch=64):
        r = fake_run(acts, seed, nepochs, tr, te, eval_batch)
        r["epoch_losses"] = [x + 2.0 for x in r["epoch_losses"]]
        return r

    monkeypatch.setattr(mod, "run", bad_run)
    mod.main()
    v_bad = json.load(open(out))["verdict"]
    assert v_bad["paired_points"] == 2 and v_bad["equivalent"] is False

    # third seed activates the pre-registered 3x2 permutation branch:
    # activation deltas interleaved with seed deltas -> equivalent, with
    # exact p-values over the C(9,3)=84 subsets
    def seeded_run(acts, seed, nepochs, tr, te, eval_batch=64):
        base = [2.3 - 0.01 * (seed % 10) + 0.005 * (1 if acts == "GeLU"
                                                    else -1), 1.6]
        base = base + [1e-3 * (seed % 7 + 1)] * (nepochs - 2)
        return {"acts": acts, "seed": seed, "nepochs": nepochs,
                "eval_batch": eval_batch, "clean": 1.0, "fgsm": 1.0,
                "pgd": 1.0, "final_loss": base[-1], "peak_loss": 1e-3,
                "epoch_losses": base, "train_s": 1.0}

    monkeypatch.setattr(mod, "run", seeded_run)
    out3 = str(tmp_path / "equiv3.json")
    argv6 = ["x", "--out", out3, "--arms",
             "GeLU:602,GeLUpoly:602,GeLU:603,GeLUpoly:603,"
             "GeLU:604,GeLUpoly:604", "--nepochs", "36"]
    monkeypatch.setattr(sys, "argv", argv6)
    mod.main()
    v3 = json.load(open(out3))["verdict"]
    assert v3["paired_points"] == 3
    assert len(v3["activation_pairs"]) == 3
    assert len(v3["seed_pairs"]) == 6
    assert 0.0 < v3["p_mean"] <= 1.0 and 0.0 < v3["p_max"] <= 1.0
    assert v3["equivalent"] is (v3["p_mean"] >= 0.1
                                and v3["p_max"] >= 0.1)

    # an activation with a REAL trajectory effect (poly always shifted
    # by more than any seed-to-seed spread) must be rejected: all three
    # activation pairs rank above all six seed pairs -> p = 1/84 < 0.1
    def effect_run(acts, seed, nepochs, tr, te, eval_batch=64):
        r = seeded_run(acts, seed, nepochs, tr, te, eval_batch)
        if acts == "GeLUpoly":
            r["epoch_losses"] = [x + 1.0 for x in r["epoch_losses"]]
        return r

    monkeypatch.setattr(mod, "run", effect_run)
    out_e = str(tmp_path / "equiv_effect.json")
    monkeypatch.setattr(sys, "argv",
                        [argv6[0], "--out", out_e] + argv6[3:])
    mod.main()
    ve = json.load(open(out_e))["verdict"]
    assert ve["p_mean"] < 0.1 and ve["equivalent"] is False


def test_fleet_gate_compare_best_iterate_columns(tmp_path):
    """fleet_gate_compare.py compares the best-iterate CSV schema's
    extra columns (final_clean/final_robust feed the gate's worst
    |diff|/SE; best_epoch medians are informational) and degrades to
    the 4-cell compare when either CSV lacks them (36ep schema)."""
    header = ("regime,seed,clean_acc,robust_acc,"
              "final_clean,final_robust,best_epoch\n")

    def rows(shift):
        out = []
        for reg, base in (("standalone", 0.90), ("smoothing", 0.91)):
            for s in range(1, 5):
                c = base + 0.01 * s + shift
                out.append(f"{reg},{s},{c},{c - 0.1},"
                           f"{c - 0.02},{c - 0.12},{60 + s}\n")
        return out

    fleet = tmp_path / "fleet.csv"
    seq = tmp_path / "seq.csv"
    fleet.write_text(header + "".join(rows(0.001)))
    seq.write_text(header + "".join(rows(0.0)))
    res = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "fleet_gate_compare.py"),
         str(fleet), str(seq), "--seed_lo", "1", "--seed_hi", "4"],
        cwd=os.path.join(REPO, "scripts"), capture_output=True, text=True,
        timeout=60,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "final_clean" in res.stdout and "final_robust" in res.stdout
    assert "best_epoch median: fleet 62.5 vs seq 62.5" in res.stdout
    assert "worst |diff|/SE across cells" in res.stdout

    # 36ep schema (no extra columns): the extra block must not appear
    head36 = "regime,seed,clean_acc,robust_acc\n"
    body36 = "".join(r.split(",", 4)[0] + "," + ",".join(r.split(",")[1:4])
                     + "\n" for r in rows(0.0))
    fleet36 = tmp_path / "fleet36.csv"
    seq36 = tmp_path / "seq36.csv"
    fleet36.write_text(head36 + body36)
    seq36.write_text(head36 + body36)
    res36 = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "fleet_gate_compare.py"),
         str(fleet36), str(seq36), "--seed_lo", "1", "--seed_hi", "4"],
        cwd=os.path.join(REPO, "scripts"), capture_output=True, text=True,
        timeout=60,
    )
    assert res36.returncode == 0, res36.stderr[-2000:]
    assert "final_clean" not in res36.stdout
    assert "worst |diff|/SE across cells: 0.00" in res36.stdout
