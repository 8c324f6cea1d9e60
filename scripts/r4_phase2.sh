#!/bin/bash
# Round-4 chip phase 2: waits for the best-iterate campaign driver to
# finish (never run two chip jobs concurrently — CLAUDE.md), then:
#   1. GeLUpoly whole-schedule equivalence (3 arms, chunk-resumable)
#   2. BASELINE dress rehearsal: replicate_baseline --allow_synthetic in
#      full mode on chip, bf16, 1 seed x 2 arms (VERDICT r3 item 3)
#
#   setsid nohup bash scripts/r4_phase2.sh > /tmp/r4_phase2.log 2>&1 &
cd /root/repo || exit 1

for i in $(seq 1 480); do
  grep -q "ALL_DONE" /tmp/r4_campaign.log 2>/dev/null && break
  sleep 60
done
if ! grep -q "ALL_DONE" /tmp/r4_campaign.log 2>/dev/null; then
  echo "campaign never finished; aborting phase 2" && exit 1
fi
echo "== phase 2 start $(date -u +%H:%M:%S) =="

for try in 1 2 3; do
  if python - <<'EOF'
import json, sys
try:
    d = json.load(open("results/gelu_tax/gelu_equiv_36ep.json"))
    sys.exit(0 if "verdict" in d else 1)
except Exception:
    sys.exit(1)
EOF
  then echo "gelu equiv already complete"; break; fi
  echo "== gelu_equiv_36ep try ${try} $(date -u +%H:%M:%S) =="
  timeout 3000 python scripts/gelu_equiv_36ep.py || echo "gelu rc=$?"
done

echo "== dress rehearsal start $(date -u +%H:%M:%S) =="
for try in 1 2 3; do
  [ -f results/baseline_replication_rehearsal/report.json ] \
      && echo "rehearsal already complete" && break
  SECONDS=0
  timeout 14000 python scripts/replicate_baseline.py --subset full \
      --allow_synthetic --precision bf16 --seeds 602 --grad_clip 1.0 \
      --out_dir results/baseline_replication_rehearsal --skip_training \
      || echo "rehearsal rc=$?"
  echo "rehearsal try ${try} took ${SECONDS}s"
done
echo "PHASE2_DONE $(date -u +%H:%M:%S)"
