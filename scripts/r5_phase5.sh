#!/bin/bash
# Round-5 chip phase 5: extend the ORIGINAL 72-epoch best-iterate fleet
# estimator gate (round 4, seeds 300-315) to the full stored sequential
# window seeds 300-347 (n=48) — the same widening phase 4 gave the
# 36-epoch point.  After this, both protocol points rest on their full
# available seed windows.
#
# Two resumable units (each its own process — host-RSS budget rule,
# SCALING.md "Host-RSS leak"), both S=16 numerics stream:
#   1. seeds 316-331 -> results/fleet_gate_72ep_s316_331.csv
#   2. seeds 332-347 -> results/fleet_gate_72ep_s332_347.csv
# then merge with the round-4 results/fleet_gate_s300_315.csv into
# results/fleet_gate_72ep_s300_347.csv and run
# scripts/fleet_gate_compare.py (now also comparing the final-iterate
# endpoints + best_epoch medians) vs
# results/digits_smoothing_best_iterate_s300_347.csv.
#
# Retry policy (CLAUDE.md convention): a retry whose failure fingerprint
# matches the previous try's HALTS the task and appends the diagnosis
# pointer to docs/R5_QUEUE.md — no blind re-runs of deterministic
# failures.
#
#   setsid nohup bash scripts/r5_phase5.sh > /tmp/r5_phase5.log 2>&1 &
cd /root/repo || exit 1
echo "== phase 5 start $(date -u +%H:%M:%S) =="

fingerprint() {
  local lines
  lines=$(grep -E "Error|error:|Exceeded|RESOURCE" "$1" | tail -4)
  [ -n "$lines" ] && printf '%s' "$lines" | md5sum | cut -d' ' -f1
}

halt_note() {
  echo "HALT: $1 (log: $2)"
  printf -- "- HALTED %s: identical failure fingerprint twice; see %s\n" \
    "$1" "$2" >> docs/R5_QUEUE.md
}

run_gate_unit() {
  # $1 = seed list (comma), $2 = output csv, $3 = unit label
  local seeds="$1" out="$2" label="$3" prev_fp="" rc fp log
  if [ -f "$out" ]; then
    echo "== ${label}: already done =="
    return 0
  fi
  for try in 1 2; do
    [ -f "$out" ] && break
    echo "== ${label} try ${try} $(date -u +%H:%M:%S) =="
    log="/tmp/r5_gate72_${label}_try${try}.log"
    timeout 4800 python scripts/digits_smoothing_best_iterate.py \
        --fleet --fleet_chunk 16 --nepochs 72 \
        --seeds "$seeds" --output_csv "$out" > "$log" 2>&1
    rc=$?
    tail -3 "$log"
    if [ $rc -ne 0 ] && [ ! -f "$out" ]; then
      fp=$(fingerprint "$log")
      echo "${label} rc=${rc} fingerprint=${fp:-none}"
      if [ $rc -ne 124 ] && [ -n "$fp" ] && [ "$fp" = "$prev_fp" ]; then
        halt_note "$label" "$log"
        return 1
      fi
      prev_fp="$fp"
    fi
  done
  [ -f "$out" ]
}

run_gate_unit "$(seq -s, 316 331)" results/fleet_gate_72ep_s316_331.csv s316_331 || exit 1
run_gate_unit "$(seq -s, 332 347)" results/fleet_gate_72ep_s332_347.csv s332_347 || exit 1

if [ -f results/fleet_gate_72ep_s316_331.csv ] \
   && [ -f results/fleet_gate_72ep_s332_347.csv ]; then
  python - <<'EOF'
import csv
import os

rows, seen, fields = [], set(), None
for path in ("results/fleet_gate_s300_315.csv",
             "results/fleet_gate_72ep_s316_331.csv",
             "results/fleet_gate_72ep_s332_347.csv"):
    with open(path, newline="") as f:
        rd = csv.DictReader(f)
        fields = fields or rd.fieldnames
        for r in rd:
            key = (r["regime"], int(r["seed"]))
            if key not in seen:
                seen.add(key)
                rows.append(r)
rows.sort(key=lambda r: (r["regime"], int(r["seed"])))
tmp = "results/fleet_gate_72ep_s300_347.csv.tmp"
with open(tmp, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=fields)
    w.writeheader()
    w.writerows(rows)
os.replace(tmp, "results/fleet_gate_72ep_s300_347.csv")
print(f"merged {len(rows)} rows -> results/fleet_gate_72ep_s300_347.csv")
EOF
  echo "== gate compare (72ep best-iterate, n=48) =="
  python scripts/fleet_gate_compare.py results/fleet_gate_72ep_s300_347.csv \
      results/digits_smoothing_best_iterate_s300_347.csv \
      --seed_lo 300 --seed_hi 347
fi

echo "R5_PHASE5_DONE $(date -u +%H:%M:%S)"
