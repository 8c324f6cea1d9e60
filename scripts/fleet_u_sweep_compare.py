"""Compare the 72-epoch FLEET u-sweep to the stored SEQUENTIAL one.

The round-3 sequential campaign (results/u_sweep_72ep_24seed.csv, n=24
seeds per u over u in {0.3, 0.5, 2/3, 1.0}) found robust accuracy
u-independent to +-0.3 pt.  The fleet stream is a different lowering
(training/fleet.py numerics note), so its rows can't be compared per-seed
after 72 chaotic epochs — the right check is DISTRIBUTIONAL: per-u arm
means must agree between streams within their joint standard error, and
the fleet stream must reproduce the sequential null (no u-trend).

  python scripts/fleet_u_sweep_compare.py \
      results/fleet_u_sweep_72ep.csv results/u_sweep_72ep_24seed.csv
"""
import argparse
import csv
import math

from compare_lib import diff_over_se, stats


def load(path):
    by_u = {}
    with open(path, newline="") as f:
        for r in csv.DictReader(f):
            by_u.setdefault(float(r["u0"]), []).append(
                (float(r["clean_acc"]), float(r["robust_acc"])))
    return by_u


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fleet_csv")
    p.add_argument("seq_csv")
    args = p.parse_args()
    fleet, seq = load(args.fleet_csv), load(args.seq_csv)
    us = sorted(set(fleet) & set(seq))
    if not us:
        raise SystemExit("no common u values")
    print(f"{'u':>8} | {'metric':>6} | {'fleet mean+-sem':>18} | "
          f"{'seq mean+-sem':>18} | {'diff':>8} | {'diff/SE':>7}")
    worst = 0.0
    for u in us:
        for name, idx in (("clean", 0), ("robust", 1)):
            fm, _, fse = stats([v[idx] for v in fleet[u]])
            sm, _, sse = stats([v[idx] for v in seq[u]])
            d = fm - sm
            se = math.sqrt(fse ** 2 + sse ** 2)
            ratio = diff_over_se(d, se)
            worst = max(worst, abs(ratio))
            print(f"{u:>8.4f} | {name:>6} | {fm:.4f} +- {fse:.4f}    | "
                  f"{sm:.4f} +- {sse:.4f}    | {d * 100:+7.3f}pt | "
                  f"{ratio:+6.2f}")
    # u-trend (the null both streams should show): range of per-u robust
    # means, fleet stream
    rm = {u: stats([v[1] for v in fleet[u]])[0] for u in us}
    spread = (max(rm.values()) - min(rm.values())) * 100
    print(f"\nfleet robust per-u mean spread: {spread:.3f} pt "
          f"(sequential null was robust to +-0.3 pt)")
    print(f"worst |diff|/SE across cells: {worst:.2f} "
          f"({'OK (< 3)' if worst < 3 else 'INVESTIGATE'})")


if __name__ == "__main__":
    main()
