"""Pre-registered readout for the BEST-ITERATE smoothing confirmation
(results/RESULTS.md "Pre-registered best-iterate confirmation").

Protocol (committed before any confirmatory seed ran):
  - confirmatory sample = seeds 300..347 only (n=48 CRN pairs; any
    calibration/cross-check seeds outside the window are EXCLUDED)
  - primary endpoint  = paired (smoothing - standalone) robust_acc at the
    best-clean-accuracy iterate (the reference's model_best semantics),
    one-sided test (H1: > 0) at alpha = 0.05
  - secondary endpoint = paired clean_acc at the best iterate, same test
  - final-iterate columns are recorded for continuity with the n=192
    table but carry NO inferential weight here
  - single analysis at the final n (48, or the largest completed n if the
    round ends early — reported WITH that deviation flagged)

  python scripts/confirmatory_best_iterate_analysis.py results/*.csv
"""
import argparse
import csv
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from confirmatory_smoothing_analysis import one_sided_t05  # noqa: E402

CONF_SEED_LO, CONF_SEED_HI = 300, 347


def load(paths, seed_lo=CONF_SEED_LO, seed_hi=CONF_SEED_HI):
    by = {}
    for path in paths:
        with open(path, newline="") as f:
            for r in csv.DictReader(f):
                seed = int(r["seed"])
                if not seed_lo <= seed <= seed_hi:
                    continue
                k = (r["regime"], seed)
                vals = tuple(float(r[c]) for c in
                             ("clean_acc", "robust_acc", "final_clean",
                              "final_robust"))
                if k in by and by[k] != vals:
                    raise SystemExit(
                        f"conflicting duplicate for {k}: {by[k]} vs {vals}")
                by[k] = vals
    return by


def analyze(by, expected_n=48):
    paired = sorted({s for (r, s) in by
                     if r == "smoothing" and ("standalone", s) in by})
    if not paired:
        print("no pairs")
        return
    print(f"confirmatory seeds paired: n={len(paired)} "
          f"(range {paired[0]}-{paired[-1]})")
    if len(paired) != expected_n:
        print(f"*** DEVIATION: pre-registered n={expected_n}, analyzed "
              f"n={len(paired)} ***")
    if len(paired) < 2:
        # the sanctioned early-end analysis degenerates at n=1: report
        # the point difference, no interval
        for label, idx in (("best-iterate robust_acc (PRIMARY)", 1),
                           ("best-iterate clean_acc (secondary)", 0)):
            d = (by[("smoothing", paired[0])][idx]
                 - by[("standalone", paired[0])][idx])
            print(f"{label}: single pair, diff {d * 100:+.3f} pt — "
                  "no inference possible at n=1")
        return
    for label, idx in (("best-iterate robust_acc (PRIMARY)", 1),
                       ("best-iterate clean_acc (secondary)", 0),
                       ("final robust_acc (descriptive only)", 3),
                       ("final clean_acc (descriptive only)", 2)):
        diffs = [by[("smoothing", s)][idx] - by[("standalone", s)][idx]
                 for s in paired]
        n = len(diffs)
        mean = sum(diffs) / n
        sd = math.sqrt(sum((d - mean) ** 2 for d in diffs) / (n - 1))
        se = sd / math.sqrt(n)
        lower = mean - one_sided_t05(n - 1) * se
        wins = sum(d > 0 for d in diffs)
        verdict = "SIGNIFICANT (one-sided)" if lower > 0 else "null"
        print(f"{label}: mean {mean * 100:+.3f} pt, sd {sd * 100:.3f} pt, "
              f"one-sided 95% lower bound {lower * 100:+.3f} pt, "
              f"{wins}/{n} favor smoothing -> {verdict}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+")
    p.add_argument("--expected_n", type=int, default=48)
    p.add_argument("--seed_lo", type=int, default=CONF_SEED_LO,
                   help="confirmatory seed window (round 3: 300-347; the "
                        "round-4 fleet campaign pre-registers 1000-1447)")
    p.add_argument("--seed_hi", type=int, default=CONF_SEED_HI)
    args = p.parse_args()
    analyze(load(args.inputs, args.seed_lo, args.seed_hi), args.expected_n)


if __name__ == "__main__":
    main()
