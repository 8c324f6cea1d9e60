"""Merge smoothing-experiment CSV chunks into one table + paired analysis.

On-chip runs are deterministic across sessions, so the experiment grows by
running NEW seeds in chunks (`digits_smoothing_experiment.py --seeds a,b`)
and merging — never recomputing seeds already on disk.

  python scripts/merge_smoothing_results.py \
      results/digits_smoothing_36ep_18seed.csv /tmp/sm_chunk_*.csv \
      --out results/digits_smoothing_36ep_24seed.csv
"""
import argparse
import csv
import math


def paired_report(rows):
    seeds = sorted({r["seed"] for r in rows})
    by = {(r["regime"], r["seed"]): r for r in rows}
    tq = {1: 12.71, 2: 4.30, 3: 3.18, 4: 2.78, 5: 2.57, 6: 2.45,
          7: 2.36, 8: 2.31, 9: 2.26, 10: 2.23, 11: 2.20, 12: 2.18,
          13: 2.16, 14: 2.14, 15: 2.13, 16: 2.12, 17: 2.11, 18: 2.10,
          19: 2.09, 20: 2.09, 21: 2.08, 22: 2.07, 23: 2.07, 24: 2.06,
          25: 2.06, 26: 2.06, 27: 2.05, 28: 2.05, 29: 2.05, 30: 2.04}
    for metric in ("clean_acc", "robust_acc"):
        diffs = [by[("smoothing", s)][metric] - by[("standalone", s)][metric]
                 for s in seeds
                 if ("smoothing", s) in by and ("standalone", s) in by]
        n = len(diffs)
        if n < 2:
            continue
        mean = sum(diffs) / n
        sd = math.sqrt(sum((d - mean) ** 2 for d in diffs) / (n - 1))
        # beyond the table stay CONSERVATIVE: t(30)=2.04 over-covers for
        # every df>30 (t decreases toward 1.96), never under-covers
        t = tq.get(n - 1, 2.04)
        wins = sum(d > 0 for d in diffs)
        print(f"paired {metric}: smoothing-standalone = {mean:+.4f} "
              f"+- {t * sd / math.sqrt(n):.4f} (95% t, n={n}; "
              f"sd={sd:.4f}; {wins}/{n} favor smoothing)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    rows, seen = [], set()
    for path in args.inputs:
        with open(path, newline="") as f:
            for r in csv.DictReader(f):
                k = (r["regime"], int(r["seed"]))
                if k in seen:
                    continue
                seen.add(k)
                rows.append({"regime": r["regime"], "seed": int(r["seed"]),
                             "clean_acc": float(r["clean_acc"]),
                             "robust_acc": float(r["robust_acc"])})
    rows.sort(key=lambda r: (r["regime"], r["seed"]))
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["regime", "seed", "clean_acc",
                                          "robust_acc"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}: {len(rows)} rows, "
          f"{len({r['seed'] for r in rows})} seeds")
    paired_report(rows)


if __name__ == "__main__":
    main()
