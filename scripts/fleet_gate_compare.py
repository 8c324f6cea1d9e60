"""Distributional fleet-vs-sequential gate compare, regime-keyed.

Second protocol point for the estimator gate (round-5; the first is the
72-epoch best-iterate window in SCALING.md "On-chip fleet-vs-sequential
estimator gate"): stored SEQUENTIAL 36-epoch smoothing rows are compared
against a FLEET re-run of the same seed window.  Per-seed values cannot
match (different grouped-conv lowering diverges chaotically over a full
schedule — training/fleet.py note); the gate is per-regime arm means
within joint SE, plus the paired (smoothing − standalone) effect
agreeing between streams.

  python scripts/fleet_gate_compare.py results/fleet_gate_36ep_s1_16.csv \
      results/digits_smoothing_36ep_42seed.csv --seed_lo 1 --seed_hi 16
"""
import argparse
import csv
import math
from statistics import median

from compare_lib import diff_over_se, stats


def load(path, lo, hi):
    by = {}
    with open(path, newline="") as f:
        for r in csv.DictReader(f):
            s = int(r["seed"])
            if lo <= s <= hi:
                by.setdefault(r["regime"], {})[s] = (
                    float(r["clean_acc"]), float(r["robust_acc"]))
    return by


# Optional best-iterate CSV columns (digits_smoothing_best_iterate.py
# schema): final-iterate endpoints + argmax epoch of the on-device
# best-clean tracker.  Compared only when BOTH CSVs carry them.
EXTRA_COLS = ("final_clean", "final_robust")


def load_extra(path, lo, hi):
    by = {}
    with open(path, newline="") as f:
        rd = csv.DictReader(f)
        if not set(EXTRA_COLS) | {"best_epoch"} <= set(rd.fieldnames or ()):
            return None
        for r in rd:
            s = int(r["seed"])
            if lo <= s <= hi:
                by.setdefault(r["regime"], {})[s] = (
                    float(r["final_clean"]), float(r["final_robust"]),
                    int(r["best_epoch"]))
    return by


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fleet_csv")
    p.add_argument("seq_csv")
    p.add_argument("--seed_lo", type=int, default=1)
    p.add_argument("--seed_hi", type=int, default=16)
    args = p.parse_args()
    fleet = load(args.fleet_csv, args.seed_lo, args.seed_hi)
    seq = load(args.seq_csv, args.seed_lo, args.seed_hi)
    regimes = sorted(set(fleet) & set(seq))
    if not regimes:
        raise SystemExit("no common regimes")
    worst = 0.0
    print(f"{'regime':>12} | {'metric':>6} | {'fleet mean+-sem':>18} | "
          f"{'seq mean+-sem':>18} | {'diff':>9} | {'diff/SE':>7}")
    for reg in regimes:
        common = sorted(set(fleet[reg]) & set(seq[reg]))
        if not common:
            raise SystemExit(
                f"regime {reg!r}: no common seeds in "
                f"[{args.seed_lo}, {args.seed_hi}] between the two CSVs")
        for name, idx in (("clean", 0), ("robust", 1)):
            fm, _, fse = stats([fleet[reg][s][idx] for s in common])
            sm, _, sse = stats([seq[reg][s][idx] for s in common])
            d, se = fm - sm, math.sqrt(fse ** 2 + sse ** 2)
            ratio = diff_over_se(d, se)
            worst = max(worst, abs(ratio))
            print(f"{reg:>12} | {name:>6} | {fm:.4f} +- {fse:.4f}    | "
                  f"{sm:.4f} +- {sse:.4f}    | {d * 100:+7.3f}pt | "
                  f"{ratio:+6.2f}")
    fleet_x = load_extra(args.fleet_csv, args.seed_lo, args.seed_hi)
    seq_x = load_extra(args.seq_csv, args.seed_lo, args.seed_hi)
    if fleet_x is not None and seq_x is not None:
        for reg in sorted(set(fleet_x) & set(seq_x)):
            common = sorted(set(fleet_x[reg]) & set(seq_x[reg]))
            if not common:
                continue
            for name, idx in (("final_clean", 0), ("final_robust", 1)):
                fm, _, fse = stats([fleet_x[reg][s][idx] for s in common])
                sm, _, sse = stats([seq_x[reg][s][idx] for s in common])
                d, se = fm - sm, math.sqrt(fse ** 2 + sse ** 2)
                ratio = diff_over_se(d, se)
                worst = max(worst, abs(ratio))
                print(f"{reg:>12} | {name:>6} | {fm:.4f} +- {fse:.4f}    | "
                      f"{sm:.4f} +- {sse:.4f}    | {d * 100:+7.3f}pt | "
                      f"{ratio:+6.2f}")
            print(f"{reg:>12} | best_epoch median: fleet "
                  f"{median([fleet_x[reg][s][2] for s in common])} vs seq "
                  f"{median([seq_x[reg][s][2] for s in common])} "
                  f"(n={len(common)}; informational)")
    # paired smoothing effect must agree between streams too — this is
    # part of the gate, so its stream disagreement feeds `worst`
    if {"standalone", "smoothing"} <= set(regimes):
        for name, idx in (("clean", 0), ("robust", 1)):
            effects = {}
            for lbl, by in (("fleet", fleet), ("seq", seq)):
                common = sorted(set(by["standalone"]) & set(by["smoothing"]))
                if not common:
                    print(f"paired smoothing-standalone {name} [{lbl}]: "
                          f"no paired seeds")
                    continue
                dm, _, dse = stats([by["smoothing"][s][idx]
                                    - by["standalone"][s][idx]
                                    for s in common])
                effects[lbl] = (dm, dse)
                print(f"paired smoothing-standalone {name} [{lbl}]: "
                      f"{dm * 100:+.3f} +- {dse * 100:.3f} pt (n={len(common)})")
            if len(effects) == 2:
                d = effects["fleet"][0] - effects["seq"][0]
                se = math.sqrt(effects["fleet"][1] ** 2
                               + effects["seq"][1] ** 2)
                ratio = diff_over_se(d, se)
                worst = max(worst, abs(ratio))
                print(f"paired-effect stream diff {name}: {d * 100:+.3f} pt "
                      f"-> {ratio:+.2f} SE")
    print(f"worst |diff|/SE across cells: {worst:.2f} "
          f"({'OK (< 3)' if worst < 3 else 'INVESTIGATE'})")


if __name__ == "__main__":
    main()
