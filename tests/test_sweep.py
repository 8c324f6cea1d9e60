"""Local sweep driver: hook semantics must match the reference's wandb
sweep overrides (train_and_attack.py:330-361), and the grid must drive the
real runners end to end."""
import csv
import glob
import json
import os

import pytest

from neural_ode_metasolver_tpu.runners.sweep import (
    expand_grid,
    main as sweep_main,
    run_sweep,
    set_max_base_lr,
    update_solvers_with_sweep_params,
)


def test_update_solvers_token_semantics():
    # positional semantics incl. u/v by NEGATIVE index (ref :339-348)
    solvers = [["rk4", "uv", "2", "-1", "0.3", "0.6"],
               ["rk2", "u", "8", "-1", "0.5", "-1"]]
    update_solvers_with_sweep_params(
        solvers, {"wnb_method": "rk2", "wnb_u": 1.0}
    )
    assert solvers[0] == ["rk2", "uv", "2", "-1", "1.0", "0.6"]
    assert solvers[1] == ["rk2", "u", "8", "-1", "1.0", "-1"]
    # None values are skipped, not applied
    update_solvers_with_sweep_params(solvers, {"wnb_n_steps": None})
    assert solvers[0][2] == "2"


def test_set_max_base_lr_branches():
    assert set_max_base_lr({"max_lr": 0.1, "base_lr": 1e-5}) == (0.1, 1e-5)
    mx, base = set_max_base_lr({"max_lr": 0.1, "max_lr_reduction": 100.0})
    assert (mx, base) == (0.1, 0.001)
    assert set_max_base_lr({"base_lr": 0.01}) == (0.01, 0.01)
    with pytest.raises(ValueError):
        set_max_base_lr({})
    with pytest.raises(ValueError):
        set_max_base_lr({"max_lr": 0.1})  # no reduction, no base


def test_expand_grid_formats():
    wandb_style = {
        "parameters": {
            "wnb_u": {"values": [0.5, 1.0]},
            "max_lr": {"value": 0.1},
        }
    }
    combos = expand_grid(wandb_style)
    assert len(combos) == 2
    assert all(c["max_lr"] == 0.1 for c in combos)
    assert sorted(c["wnb_u"] for c in combos) == [0.5, 1.0]

    plain = {"wnb_u": [0.5, 1.0], "nepochs": 2}
    combos = expand_grid(plain)
    assert len(combos) == 2
    assert all(c["nepochs"] == 2 for c in combos)

    with pytest.raises(ValueError):
        expand_grid({"parameters": {"x": {}}})


def test_sweep_mnist_end_to_end(tmp_path):
    """Two-point u sweep through the real MNIST runner on tiny shapes;
    summary CSV carries each run's overrides and best metric."""
    records = run_sweep(
        "mnist",
        {"wnb_u": [0.5, 1.0]},
        str(tmp_path / "sweep"),
        base_argv=[
            "--solvers", "rk2,u,2,-1,0.5,-1",
            "--nepochs", "1",
            "--batch_size", "16",
            "--test_batch_size", "16",
            "--synthetic_train_size", "48",
            "--synthetic_test_size", "32",
        ],
    )
    assert len(records) == 2
    for r in records:
        assert glob.glob(os.path.join(r["run_dir"], "last", "step_*"))
        assert r["best"] is not None

    with open(tmp_path / "sweep" / "sweep_summary.csv") as f:
        rows = list(csv.DictReader(f))
    assert sorted(float(r["wnb_u"]) for r in rows) == [0.5, 1.0]


def test_sweep_cli_with_lr_override(tmp_path):
    """CLI entry: config file + `--` passthrough, max_lr/reduction hook
    applied to the cifar runner's cyclic schedule."""
    cfg_path = tmp_path / "sweep.json"
    cfg_path.write_text(json.dumps({
        "parameters": {
            "max_lr": {"value": 0.05},
            "max_lr_reduction": {"value": 1e6},
        }
    }))
    records = sweep_main([
        "--runner", "cifar",
        "--config", str(cfg_path),
        "--sweep_dir", str(tmp_path / "out"),
        "--",
        "--network", "premetanode6",
        "--in_planes", "16",
        "--solvers", "rk2,u,2,-1,0.5,-1",
        "--nepochs", "1",
        "--batch_size", "16",
        "--test_batch_size", "16",
        "--synthetic_train_size", "48",
        "--synthetic_test_size", "32",
        "--val_perc", "0.25",
    ])
    assert len(records) == 1
    run_dir = records[0]["run_dir"]
    # the runner logged its args: max_lr must be the override, base_lr derived
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        config_rec = json.loads(f.readline())
    args_logged = config_rec["args"]
    assert float(args_logged["max_lr"]) == 0.05
    assert abs(float(args_logged["base_lr"]) - 0.05 / 1e6) < 1e-12


def test_apply_overrides_lr_mapping_and_bools():
    from neural_ode_metasolver_tpu.runners.sweep import _apply_overrides

    # cifar: cyclic endpoints
    argv = _apply_overrides([], {"max_lr": 0.1, "max_lr_reduction": 100.0},
                            "d", runner="cifar")
    assert argv[argv.index("--max_lr") + 1] == "0.1"
    assert argv[argv.index("--base_lr") + 1] == "0.001"
    # mnist has no cyclic flags: LR overrides map onto flat --lr
    argv = _apply_overrides([], {"base_lr": 0.01}, "d", runner="mnist")
    assert "--max_lr" not in argv and "--base_lr" not in argv
    assert argv[argv.index("--lr") + 1] == "0.01"
    # store_true passthrough: True appends the bare flag, False removes it
    argv = _apply_overrides(["--resume"], {"ss_loss": True, "resume": False},
                            "d", runner="mnist")
    assert "--ss_loss" in argv and "True" not in argv
    assert "--resume" not in argv
    # overriding a flag that dangles at the end of argv must not IndexError
    argv = _apply_overrides(["--save_dir"], {}, "d2", runner="mnist")
    assert argv[argv.index("--save_dir") + 1] == "d2"


def test_sweep_mnist_lr_override_end_to_end(tmp_path):
    records = run_sweep(
        "mnist",
        {"base_lr": [0.001]},
        str(tmp_path / "sweep"),
        base_argv=[
            "--solvers", "rk2,u,2,-1,0.5,-1",
            "--nepochs", "1",
            "--batch_size", "16",
            "--test_batch_size", "16",
            "--synthetic_train_size", "32",
            "--synthetic_test_size", "32",
        ],
    )
    assert len(records) == 1 and records[0]["best"] is not None


def test_apply_overrides_solver_token_edge_cases():
    from neural_ode_metasolver_tpu.runners.sweep import _apply_overrides

    # dangling --solvers at the end of argv: no IndexError, default DSL
    argv = _apply_overrides(["--solvers"], {"wnb_u": 0.6}, "d")
    assert argv[argv.index("--solvers") + 1] == "rk2,u,8,-1,0.6,-1"
    # --solvers immediately followed by another flag: same fallback, and
    # the neighbor flag survives
    argv = _apply_overrides(["--solvers", "--debug"], {"wnb_u": 0.6}, "d")
    assert argv[argv.index("--solvers") + 1] == "rk2,u,8,-1,0.6,-1"
    assert "--debug" in argv
    # non-bool override of a flag present without an operand must insert,
    # not clobber the adjacent flag name
    argv = _apply_overrides(["--flagx", "--nepochs", "2"],
                            {"flagx": 0.5}, "d")
    assert argv[argv.index("--flagx") + 1] == "0.5"
    assert argv[argv.index("--nepochs") + 1] == "2"
    # negative operands are values, not flags
    argv = _apply_overrides(["--solvers", "rk2,u,8,-1,0.25,-1"],
                            {"wnb_u": 0.75}, "d")
    assert argv[argv.index("--solvers") + 1] == "rk2,u,8,-1,0.75,-1"


def test_sweep_survives_failing_run(tmp_path):
    """One crashing grid point (unknown solver method) must not lose the
    rest of the sweep or the summary CSV."""
    records = run_sweep(
        "mnist",
        {"solvers": ["rk9,u,2,-1,0.5,-1", "rk2,u,2,-1,0.5,-1"]},
        str(tmp_path / "sweep"),
        base_argv=[
            "--nepochs", "1",
            "--batch_size", "16",
            "--test_batch_size", "16",
            "--synthetic_train_size", "32",
            "--synthetic_test_size", "32",
        ],
    )
    assert len(records) == 2
    failed = [r for r in records if r["error"]]
    ok = [r for r in records if not r["error"]]
    assert len(failed) == 1 and failed[0]["best"] is None
    assert len(ok) == 1 and ok[0]["best"] is not None

    with open(tmp_path / "sweep" / "sweep_summary.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert sorted(bool(r["error"]) for r in rows) == [False, True]
