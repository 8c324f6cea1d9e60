"""The pre-registered confirmatory readout for the 72-epoch smoothing
extension (results/RESULTS.md "Pre-registered confirmatory extension").

Protocol (committed before any confirmatory seed ran):
  - confirmatory sample = seeds 52..243 only (calibration seeds 49-51 and
    the original exploratory seeds 1-48 are EXCLUDED from inference)
  - primary endpoint  = paired (smoothing - standalone) robust_acc,
    one-sided test (H1: > 0) at alpha = 0.05
  - secondary endpoint = paired clean_acc, same one-sided test
  - single analysis at the final n (192, or the largest completed n if
    the round ends early — reported WITH that deviation flagged)

  python scripts/confirmatory_smoothing_analysis.py results/*.csv \
      [--expected_n 192]
"""
import argparse
import csv
import math

CONF_SEED_LO, CONF_SEED_HI = 52, 243


def one_sided_t05(df: int) -> float:
    """Upper 5% one-sided Student-t quantile; exact small-df table then a
    conservative (over-covering) step-down toward the normal 1.645."""
    table = {1: 6.314, 2: 2.920, 3: 2.353, 4: 2.132, 5: 2.015, 6: 1.943,
             7: 1.895, 8: 1.860, 9: 1.833, 10: 1.812, 11: 1.796, 12: 1.782,
             13: 1.771, 14: 1.761, 15: 1.753, 16: 1.746, 17: 1.740,
             18: 1.734, 19: 1.729, 20: 1.725, 21: 1.721, 22: 1.717,
             23: 1.714, 24: 1.711, 25: 1.708, 26: 1.706, 27: 1.703,
             28: 1.701, 29: 1.699, 30: 1.697, 40: 1.684, 60: 1.671,
             120: 1.658}
    if df in table:
        return table[df]
    # conservative: use the largest tabulated df <= df
    usable = [k for k in table if k <= df]
    return table[max(usable)] if usable else table[1]


def load_confirmatory(paths):
    by = {}
    for path in paths:
        with open(path, newline="") as f:
            for r in csv.DictReader(f):
                seed = int(r["seed"])
                if not CONF_SEED_LO <= seed <= CONF_SEED_HI:
                    continue
                k = (r["regime"], seed)
                vals = (float(r["clean_acc"]), float(r["robust_acc"]))
                if k in by and by[k] != vals:
                    raise SystemExit(
                        f"conflicting duplicate for {k}: {by[k]} vs {vals}")
                by[k] = vals
    return by


def analyze(by, expected_n):
    seeds = sorted({s for (_, s) in by})
    paired = [s for s in seeds
              if ("smoothing", s) in by and ("standalone", s) in by]
    print(f"confirmatory seeds paired: n={len(paired)} "
          f"(range {paired[0]}-{paired[-1]})" if paired else "no pairs")
    if len(paired) < 2:
        return
    if len(paired) != expected_n:
        print(f"*** DEVIATION: pre-registered n={expected_n}, analyzed "
              f"n={len(paired)} (early stop or incomplete chunks) ***")
    results = {}
    for label, idx in (("robust_acc (PRIMARY)", 1),
                       ("clean_acc (secondary)", 0)):
        diffs = [by[("smoothing", s)][idx] - by[("standalone", s)][idx]
                 for s in paired]
        n = len(diffs)
        mean = sum(diffs) / n
        sd = math.sqrt(sum((d - mean) ** 2 for d in diffs) / (n - 1))
        se = sd / math.sqrt(n)
        t = one_sided_t05(n - 1)
        lower = mean - t * se
        wins = sum(d > 0 for d in diffs)
        verdict = "SIGNIFICANT (one-sided)" if lower > 0 else "null"
        print(f"{label}: mean {mean * 100:+.3f} pt, sd {sd * 100:.3f} pt, "
              f"one-sided 95% lower bound {lower * 100:+.3f} pt, "
              f"{wins}/{n} favor smoothing -> {verdict}")
        results[label] = (mean, sd, lower)
    return results


def descriptives(paths, collapse_below=0.7):
    """POST-HOC DESCRIPTIVE ONLY (not part of the pre-registered
    inference): per-arm means over every seed in the inputs (no seed
    window) and counts of collapse events — runs whose robust accuracy
    fell below ``collapse_below``, the catastrophic-overfitting tail of
    PGD adversarial training that dominates the paired sd."""
    rows = []
    for path in paths:
        with open(path, newline="") as f:
            rows.extend(csv.DictReader(f))
    seen = set()
    print(f"\n-- descriptive (ALL seeds in inputs; post hoc) --")
    for regime in ("standalone", "smoothing"):
        arm = {}
        for r in rows:
            if r["regime"] == regime:
                arm[int(r["seed"])] = (float(r["clean_acc"]),
                                       float(r["robust_acc"]))
        if not arm:
            continue
        cleans = [v[0] for v in arm.values()]
        robusts = [v[1] for v in arm.values()]
        n = len(arm)
        collapses = sum(v < collapse_below for v in robusts)
        print(f"{regime:10s} n={n} clean {sum(cleans) / n:.4f} "
              f"robust {sum(robusts) / n:.4f} "
              f"collapses(robust<{collapse_below}) {collapses}")
        seen |= set(arm)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+")
    p.add_argument("--expected_n", type=int, default=192)
    p.add_argument("--descriptives", action="store_true",
                   help="append the post-hoc pooled/collapse table")
    args = p.parse_args()
    analyze(load_confirmatory(args.inputs), args.expected_n)
    if args.descriptives:
        descriptives(args.inputs)


if __name__ == "__main__":
    main()
