#!/bin/bash
# Round-4 chip phase 3 (supersedes the rehearsal half of r4_phase2.sh):
# reordered so the sure ~80-min artifact lands before the multi-hour one.
#   0. wait for the orphaned in-flight gelu_equiv_36ep python (pid $1)
#   1. finish scripts/gelu_equiv_36ep.py until a "verdict" key exists
#      (per-arm resumable)
#   2. 72-epoch fleet u-sweep, one 24-member fleet program PER u VALUE
#      (96 members in one program OOMs a single core — u_sweep
#      --fleet_chunk commit), idempotent per-u CSVs, merged at the end
#   3. BASELINE dress rehearsal (VERDICT r3 item 3), with an
#      incomplete-arm cleanup guard so a timed-out try can never be
#      mis-skipped as trained by --skip_training
#
#   setsid nohup bash scripts/r4_phase3.sh GELU_PID \
#       > /tmp/r4_phase3.log 2>&1 &
cd /root/repo || exit 1

GELU_PID="${1:-0}"
if [ "$GELU_PID" -gt 0 ]; then
  echo "== waiting for in-flight gelu python pid ${GELU_PID} =="
  for i in $(seq 1 60); do
    [ -d "/proc/${GELU_PID}" ] || break
    sleep 60
  done
fi
echo "== phase 3 start $(date -u +%H:%M:%S) =="

gelu_done() {
  python - <<'EOF'
import json, sys
try:
    d = json.load(open("results/gelu_tax/gelu_equiv_36ep.json"))
    sys.exit(0 if "verdict" in d else 1)
except Exception:
    sys.exit(1)
EOF
}

for try in 1 2 3; do
  if gelu_done; then echo "gelu equiv complete"; break; fi
  echo "== gelu_equiv_36ep try ${try} $(date -u +%H:%M:%S) =="
  timeout 3000 python scripts/gelu_equiv_36ep.py || echo "gelu rc=$?"
done

# item 2: the 72-epoch fleet u-sweep (replaces the 12-epoch pilot).
# One program per u keeps every chunk at S=24 (one numerics stream,
# one compilation) and stays idempotent per u value.
mkdir -p results/fleet_u_sweep_chunks
SEEDS=$(seq -s, 1 24)
for u in 0.3 0.5 0.6667 1.0; do
  out="results/fleet_u_sweep_chunks/u_${u}.csv"
  if [ -f "$out" ]; then
    echo "== u-sweep u=${u}: already done =="
    continue
  fi
  echo "== u-sweep u=${u} start $(date -u +%H:%M:%S) =="
  timeout 2700 python -m neural_ode_metasolver_tpu.runners.u_sweep \
      --fleet --fallback_dataset digits --u_grid "$u" \
      --seeds "$SEEDS" --nepochs 72 --adv_training_mode at --eps 0.3 \
      --output_csv "$out" || echo "u-sweep u=${u} failed rc=$?"
done
python - <<'EOF'
import csv, os
us = ["0.3", "0.5", "0.6667", "1.0"]
paths = [f"results/fleet_u_sweep_chunks/u_{u}.csv" for u in us]
if all(os.path.exists(p) for p in paths):
    rows = [r for p in paths for r in csv.DictReader(open(p))]
    with open("results/fleet_u_sweep_72ep.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader(); w.writerows(rows)
    print(f"merged {len(rows)} rows -> results/fleet_u_sweep_72ep.csv")
else:
    print("u-sweep chunks incomplete; merge skipped")
EOF

echo "== dress rehearsal start $(date -u +%H:%M:%S) =="
for try in 1 2; do
  [ -f results/baseline_replication_rehearsal/report.json ] \
      && echo "rehearsal already complete" && break
  # drop arm dirs whose training was cut short: --skip_training keys on
  # the existence of <arm>/last, which async checkpointing creates from
  # epoch 1 — a timed-out arm would otherwise be evaluated half-trained
  python - <<'EOF'
import json, os, shutil
base = "results/baseline_replication_rehearsal"
if os.path.isdir(base):
    for d in os.listdir(base):
        p = os.path.join(base, d)
        if not (os.path.isdir(p) and "_seed" in d):
            continue
        mpath = os.path.join(p, "metrics.jsonl")
        n = 0
        if os.path.exists(mpath):
            with open(mpath) as f:
                n = sum(1 for line in f if "train_loss" in line)
        if n < 36:
            print(f"removing incomplete arm {d} ({n}/36 epochs)")
            shutil.rmtree(p)
EOF
  SECONDS=0
  timeout 20000 python scripts/replicate_baseline.py --subset full \
      --allow_synthetic --precision bf16 --seeds 602 --grad_clip 1.0 \
      --out_dir results/baseline_replication_rehearsal --skip_training \
      || echo "rehearsal rc=$?"
  echo "rehearsal try ${try} took ${SECONDS}s"
done
echo "PHASE3_DONE $(date -u +%H:%M:%S)"
