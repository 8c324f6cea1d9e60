#!/bin/bash
# Round-5 chip phase 3: prove the --isolate driver path against the REAL
# backend (the smoke tests prove it on CPU only).  Clone the completed
# 3-seed rehearsal dir, drop ONE banked eval (the seed-603 regime grid),
# and rerun the parity-day command with --skip_training: the parent must
# reuse every other banked JSON, spawn exactly one --stage regimes child
# on the chip, and the regenerated sweep must match the banked original
# bit for bit (chip runs are deterministic).  Then re-check bench.py.
#
# Retry policy (CLAUDE.md convention): identical failure fingerprint
# twice -> halt and append the diagnosis pointer to docs/R5_QUEUE.md.
#
#   setsid nohup bash scripts/r5_phase3.sh > /tmp/r5_phase3.log 2>&1 &
#   echo $! > /tmp/r5_phase3.pid
cd /root/repo || exit 1
echo "== phase 3 start $(date -u +%H:%M:%S) =="

SCRATCH=/tmp/iso_onchip
BANKED=results/baseline_replication_rehearsal

fingerprint() {
  local lines
  lines=$(grep -E "Error|error:|Exceeded|RESOURCE" "$1" | tail -4)
  [ -n "$lines" ] && printf '%s' "$lines" | md5sum | cut -d' ' -f1
}

done_check() {
  python - <<'EOF'
import json, sys
try:
    a = json.load(open("/tmp/iso_onchip/evals/regimes_smoothing_seed603.json"))
    b = json.load(open(
        "results/baseline_replication_rehearsal/evals/"
        "regimes_smoothing_seed603.json"))
    sys.exit(0 if a == b else 2)
except Exception:
    sys.exit(1)
EOF
}

prev_fp=""
for try in 1 2 3; do
  if done_check; then echo "isolated on-chip regimes sweep matches banked"; break; fi
  rm -rf "$SCRATCH"
  cp -r "$BANKED" "$SCRATCH"
  rm "$SCRATCH/evals/regimes_smoothing_seed603.json"
  echo "== isolate on-chip try ${try} $(date -u +%H:%M:%S) =="
  log="/tmp/r5_iso_onchip_try${try}.log"
  SECONDS=0
  timeout 3000 python scripts/replicate_baseline.py --subset full \
      --allow_synthetic --precision bf16 --seeds 602,603,604 \
      --grad_clip 1.0 --out_dir "$SCRATCH" --skip_training \
      > "$log" 2>&1
  rc=$?
  echo "try ${try} rc=${rc} took ${SECONDS}s"
  grep -c "isolate\] spawning" "$log" && grep "isolate\] spawning" "$log"
  if [ $rc -ne 0 ] && ! done_check; then
    fp=$(fingerprint "$log")
    echo "fingerprint=${fp:-none}"
    if [ $rc -ne 124 ] && [ -n "$fp" ] && [ "$fp" = "$prev_fp" ]; then
      echo "HALT: isolate on-chip validation (log: $log)"
      printf -- "- HALTED isolate on-chip validation: identical failure fingerprint twice; see %s\n" \
        "$log" >> docs/R5_QUEUE.md
      break
    fi
    prev_fp="$fp"
  fi
done
if done_check; then
  echo "ISO_ONCHIP_OK: regenerated regimes sweep == banked (bit-identical)"
else
  echo "ISO_ONCHIP_MISMATCH_OR_INCOMPLETE (rc of done_check: $?)"
fi

echo "== bench re-check $(date -u +%H:%M:%S) =="
timeout 1200 python bench.py > /tmp/r5_bench2.log 2>&1
tail -1 /tmp/r5_bench2.log
echo "R5_PHASE3_DONE $(date -u +%H:%M:%S)"
