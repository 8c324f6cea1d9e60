"""The pre-registered confirmatory analysis tooling behaves per protocol:
seed-window filtering, duplicate handling, and the one-sided test."""
import csv
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from confirmatory_smoothing_analysis import (  # noqa: E402
    analyze,
    load_confirmatory,
    one_sided_t05,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["regime", "seed", "clean_acc",
                                          "robust_acc"])
        w.writeheader()
        w.writerows(rows)


def test_seed_window_and_dedup(tmp_path):
    a = str(tmp_path / "a.csv")
    rows = []
    for seed, d in ((51, 0.9), (52, 0.01), (53, 0.02), (243, 0.03),
                    (244, 0.9)):
        rows.append({"regime": "standalone", "seed": seed, "clean_acc": 0.9,
                     "robust_acc": 0.8})
        rows.append({"regime": "smoothing", "seed": seed,
                     "clean_acc": 0.9 + d / 10, "robust_acc": 0.8 + d})
    _write(a, rows)
    by = load_confirmatory([a, a])  # identical duplicate must be accepted
    seeds = sorted({s for (_, s) in by})
    assert seeds == [52, 53, 243]  # 51 and 244 excluded by the window
    res = analyze(by, expected_n=3)
    mean, sd, lower = res["robust_acc (PRIMARY)"]
    assert abs(mean - 0.02) < 1e-12
    assert lower < mean


def test_conflicting_duplicate_rejected(tmp_path):
    a, b = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    row = {"regime": "standalone", "seed": 60, "clean_acc": 0.9,
           "robust_acc": 0.8}
    _write(a, [row])
    _write(b, [dict(row, robust_acc=0.7)])
    import pytest

    with pytest.raises(SystemExit, match="conflicting"):
        load_confirmatory([a, b])


def test_one_sided_t_is_conservative():
    assert one_sided_t05(1) == 6.314
    assert one_sided_t05(191) == 1.658  # steps down to the df=120 row
    assert one_sided_t05(35) == 1.697  # largest tabulated df <= 35 is 30
    for df in (2, 10, 50, 200):
        assert one_sided_t05(df) >= one_sided_t05(df + 1000)


def test_cli_runs(tmp_path):
    a = str(tmp_path / "a.csv")
    _write(a, [
        {"regime": "standalone", "seed": 52, "clean_acc": 0.9,
         "robust_acc": 0.8},
        {"regime": "smoothing", "seed": 52, "clean_acc": 0.91,
         "robust_acc": 0.82},
        {"regime": "standalone", "seed": 53, "clean_acc": 0.9,
         "robust_acc": 0.8},
        {"regime": "smoothing", "seed": 53, "clean_acc": 0.92,
         "robust_acc": 0.83},
    ])
    res = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "confirmatory_smoothing_analysis.py"),
         a, "--expected_n", "2"],
        capture_output=True, text=True, timeout=60,
    )
    assert res.returncode == 0, res.stderr
    assert "PRIMARY" in res.stdout and "DEVIATION" not in res.stdout
