#!/bin/bash
# Round-5 chip phase 7: resolve the 2x2 gelu-equivalence flip with the
# PRE-REGISTERED 3x2-matrix protocol (docs/R5_QUEUE.md "PRE-REGISTERED
# (phase 7 protocol)", committed before this launch): bank GeLU:604 and
# GeLUpoly:604 (~20 min each warm-cache), then gelu_equiv_36ep.py's
# >=3-common-seed branch writes the permutation-test verdict.
#
# Retry policy (CLAUDE.md convention): a retry whose failure fingerprint
# matches the previous try's HALTS the task and appends the diagnosis
# pointer to docs/R5_QUEUE.md — no blind re-runs of deterministic
# failures.
#
#   setsid nohup bash scripts/r5_phase7.sh > /tmp/r5_phase7.log 2>&1 &
cd /root/repo || exit 1
echo "== phase 7 start $(date -u +%H:%M:%S) =="

ARMS="GeLU:602,GeLUpoly:602,GeLU:603,GeLUpoly:603,GeLU:604,GeLUpoly:604"

done_check() {
  python - <<'EOF'
import json, sys
try:
    v = json.load(open("results/gelu_tax/gelu_equiv_36ep.json"))["verdict"]
    # >= 3: a future wider matrix must not be recomputed down (the
    # r5_phase6.sh lesson)
    sys.exit(0 if v.get("paired_points", 0) >= 3 else 1)
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
for try in 1 2 3; do
  if done_check; then
    echo "== already done =="
    break
  fi
  echo "== try ${try} $(date -u +%H:%M:%S) =="
  log="/tmp/r5_gelu_604_try${try}.log"
  # two ~20-min arms; stored arms are reused, so a timeout resumes at
  # the first missing arm — 3 tries cover one mid-arm cut
  timeout 3300 python scripts/gelu_equiv_36ep.py --arms "$ARMS" \
      > "$log" 2>&1
  rc=$?
  tail -3 "$log"
  if [ $rc -ne 0 ] && ! done_check; then
    fp=$(fingerprint "$log")
    echo "rc=${rc} fingerprint=${fp:-none}"
    if [ $rc -ne 124 ] && [ -n "$fp" ] && [ "$fp" = "$prev_fp" ]; then
      echo "HALT: identical failure fingerprint twice (log: $log)"
      printf -- "- HALTED phase 7 (seed-604 arms): identical failure fingerprint twice; see %s\n" \
        "$log" >> docs/R5_QUEUE.md
      exit 1
    fi
    prev_fp="$fp"
  fi
done

done_check && echo "R5_PHASE7_DONE $(date -u +%H:%M:%S)"
