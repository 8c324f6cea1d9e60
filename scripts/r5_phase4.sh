#!/bin/bash
# Round-5 chip phase 4: extend the 36-epoch fleet estimator gate from
# n=16 to the full stored sequential window n=42 (VERDICT r4 item 7
# follow-through: "fleet = same estimator" at the second protocol point
# should not rest on one 16-seed window when 42 sequential seeds exist).
#
# Two resumable units (each its own process — host-RSS budget rule,
# SCALING.md "Host-RSS leak"), both S=16 numerics stream (tail padded by
# fleet_smoothing_lib):
#   1. seeds 17-32 -> results/fleet_gate_36ep_s17_32.csv
#   2. seeds 33-42 -> results/fleet_gate_36ep_s33_42.csv
# then merge to results/fleet_gate_36ep_s1_42.csv and run
# scripts/fleet_gate_compare.py vs results/digits_smoothing_36ep_42seed.csv.
#
# Retry policy (CLAUDE.md convention): a retry whose failure fingerprint
# matches the previous try's HALTS the task and appends the diagnosis
# pointer to docs/R5_QUEUE.md — no blind re-runs of deterministic
# failures.
#
#   setsid nohup bash scripts/r5_phase4.sh > /tmp/r5_phase4.log 2>&1 &
cd /root/repo || exit 1
echo "== phase 4 start $(date -u +%H:%M:%S) =="

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
    log="/tmp/r5_gate36_${label}_try${try}.log"
    timeout 4200 python scripts/digits_smoothing_experiment.py \
        --fleet --fleet_chunk 16 --nepochs 36 \
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

run_gate_unit "$(seq -s, 17 32)" results/fleet_gate_36ep_s17_32.csv s17_32 || exit 1
run_gate_unit "$(seq -s, 33 42)" results/fleet_gate_36ep_s33_42.csv s33_42 || exit 1

if [ -f results/fleet_gate_36ep_s17_32.csv ] \
   && [ -f results/fleet_gate_36ep_s33_42.csv ]; then
  python - <<'EOF'
import csv

rows, seen = [], set()
for path in ("results/fleet_gate_36ep_s1_16.csv",
             "results/fleet_gate_36ep_s17_32.csv",
             "results/fleet_gate_36ep_s33_42.csv"):
    with open(path, newline="") as f:
        for r in csv.DictReader(f):
            key = (r["regime"], int(r["seed"]))
            if key not in seen:
                seen.add(key)
                rows.append(r)
rows.sort(key=lambda r: (r["regime"], int(r["seed"])))
tmp = "results/fleet_gate_36ep_s1_42.csv.tmp"
with open(tmp, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=["regime", "seed",
                                      "clean_acc", "robust_acc"])
    w.writeheader()
    w.writerows(rows)
import os
os.replace(tmp, "results/fleet_gate_36ep_s1_42.csv")
print(f"merged {len(rows)} rows -> results/fleet_gate_36ep_s1_42.csv")
EOF
  echo "== gate compare (n=42) =="
  python scripts/fleet_gate_compare.py results/fleet_gate_36ep_s1_42.csv \
      results/digits_smoothing_36ep_42seed.csv --seed_lo 1 --seed_hi 42
fi

echo "R5_PHASE4_DONE $(date -u +%H:%M:%S)"
