#!/bin/bash
# Round-5 chip phase 6: complete the 2x2 activation x seed matrix of the
# whole-schedule GeLUpoly equivalence experiment by banking the fourth
# arm, GeLUpoly @ seed 603 (~20 min warm-cache).  gelu_equiv_36ep.py
# reuses the three stored arms and re-writes the verdict binding on BOTH
# paired activation deltas (poly-vs-erf at 602 AND 603) against the same
# erf seed yardstick ("paired_points": 2).
#
# Retry policy (CLAUDE.md convention): a retry whose failure fingerprint
# matches the previous try's HALTS the task and appends the diagnosis
# pointer to docs/R5_QUEUE.md — no blind re-runs of deterministic
# failures.
#
#   setsid nohup bash scripts/r5_phase6.sh > /tmp/r5_phase6.log 2>&1 &
cd /root/repo || exit 1
echo "== phase 6 start $(date -u +%H:%M:%S) =="

OUT=results/gelu_tax/gelu_equiv_36ep.json

done_check() {
  python - <<'EOF'
import json, sys
try:
    v = json.load(open("results/gelu_tax/gelu_equiv_36ep.json"))["verdict"]
    # >= 2: phase 7 upgraded the matrix to 3x2 — a re-run of this
    # superseded phase must NOT recompute the narrower 2x2 verdict
    # over it (the r4_phase2.sh lesson, advisor r4 item e)
    sys.exit(0 if v.get("paired_points", 0) >= 2 else 1)
except Exception:
    sys.exit(1)
EOF
}

fingerprint() {
  local lines
  lines=$(grep -E "Error|error:|Exceeded|RESOURCE" "$1" | tail -4)
  [ -n "$lines" ] && printf '%s' "$lines" | md5sum | cut -d' ' -f1
}

prev_fp=""
for try in 1 2; do
  if done_check; then
    echo "== already done =="
    break
  fi
  echo "== try ${try} $(date -u +%H:%M:%S) =="
  log="/tmp/r5_gelu_p603_try${try}.log"
  timeout 3000 python scripts/gelu_equiv_36ep.py \
      --arms GeLU:602,GeLUpoly:602,GeLU:603,GeLUpoly:603 > "$log" 2>&1
  rc=$?
  tail -3 "$log"
  if [ $rc -ne 0 ] && ! done_check; then
    fp=$(fingerprint "$log")
    echo "rc=${rc} fingerprint=${fp:-none}"
    if [ $rc -ne 124 ] && [ -n "$fp" ] && [ "$fp" = "$prev_fp" ]; then
      echo "HALT: identical failure fingerprint twice (log: $log)"
      printf -- "- HALTED phase 6 (GeLUpoly:603 arm): identical failure fingerprint twice; see %s\n" \
        "$log" >> docs/R5_QUEUE.md
      exit 1
    fi
    prev_fp="$fp"
  fi
done

done_check && echo "R5_PHASE6_DONE $(date -u +%H:%M:%S)"
