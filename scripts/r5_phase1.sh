#!/bin/bash
# Round-5 chip phase 1 (runs after the round-4 phase-3 driver exits):
#   1. finish scripts/gelu_equiv_36ep.py (GeLUpoly:602 + GeLU:603 arms;
#      erf@602 banked) until a "verdict" key exists — now with the
#      batch-64 + remat eval fix for the round-4 HBM OOM
#   2. second fleet estimator-gate point (VERDICT r4 item 7): stored
#      36-epoch smoothing seeds 1-16 re-run through the fleet path
#
# Retry policy (CLAUDE.md convention): a retry whose failure fingerprint
# (last error lines of the try log) matches the previous try's HALTS the
# task and appends the diagnosis pointer to docs/R5_QUEUE.md — no blind
# re-runs of deterministic failures.
#
#   setsid nohup bash scripts/r5_phase1.sh PHASE3_PID \
#       > /tmp/r5_phase1.log 2>&1 &
cd /root/repo || exit 1

PHASE3_PID="${1:-0}"
if [ "$PHASE3_PID" -gt 0 ]; then
  echo "== waiting for phase-3 driver pid ${PHASE3_PID} =="
  while [ -d "/proc/${PHASE3_PID}" ]; do sleep 60; done
fi
echo "== phase 1 start $(date -u +%H:%M:%S) =="

fingerprint() {
  # empty when the log has no error lines (e.g. a SIGTERM from timeout
  # mid-progress) — the caller must treat empty as "no match", never as
  # a fingerprint, or two unrelated timeouts would falsely halt
  local lines
  lines=$(grep -E "Error|error:|Exceeded|RESOURCE" "$1" | tail -4)
  [ -n "$lines" ] && printf '%s' "$lines" | md5sum | cut -d' ' -f1
}

halt_note() {
  echo "HALT: $1 (log: $2)"
  printf -- "- HALTED %s: identical failure fingerprint twice; see %s\n" \
    "$1" "$2" >> docs/R5_QUEUE.md
}

# ---- task 1: gelu 36-epoch equivalence (per-arm resumable) ----
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

prev_fp=""
for try in 1 2 3 4; do
  if gelu_done; then echo "gelu equiv complete"; break; fi
  echo "== gelu_equiv_36ep try ${try} $(date -u +%H:%M:%S) =="
  log="/tmp/r5_gelu_try${try}.log"
  timeout 4500 python scripts/gelu_equiv_36ep.py > "$log" 2>&1
  rc=$?
  tail -3 "$log"
  if [ $rc -ne 0 ]; then
    fp=$(fingerprint "$log")
    echo "gelu rc=${rc} fingerprint=${fp:-none}"
    # rc=124 (timeout) with per-arm banking is forward progress, and an
    # empty fingerprint has nothing to compare — both are transient
    if [ $rc -ne 124 ] && [ -n "$fp" ] && [ "$fp" = "$prev_fp" ]; then
      halt_note "gelu_equiv_36ep" "$log"
      break
    fi
    prev_fp="$fp"
  fi
done

# ---- task 2: 36-epoch fleet estimator gate (seeds 1-16, S=16) ----
out="results/fleet_gate_36ep_s1_16.csv"
if [ -f "$out" ]; then
  echo "== 36ep fleet gate: already done =="
else
  prev_fp=""
  for try in 1 2; do
    [ -f "$out" ] && break
    echo "== 36ep fleet gate try ${try} $(date -u +%H:%M:%S) =="
    log="/tmp/r5_gate36_try${try}.log"
    timeout 3000 python scripts/digits_smoothing_experiment.py \
        --fleet --fleet_chunk 16 --nepochs 36 \
        --seeds "$(seq -s, 1 16)" --output_csv "$out" > "$log" 2>&1
    rc=$?
    tail -3 "$log"
    if [ $rc -ne 0 ] && [ ! -f "$out" ]; then
      fp=$(fingerprint "$log")
      echo "gate rc=${rc} fingerprint=${fp:-none}"
      if [ $rc -ne 124 ] && [ -n "$fp" ] && [ "$fp" = "$prev_fp" ]; then
        halt_note "36ep fleet gate" "$log"
        break
      fi
      prev_fp="$fp"
    fi
  done
fi

echo "R5_PHASE1_DONE $(date -u +%H:%M:%S)"
