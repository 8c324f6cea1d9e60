#!/bin/bash
# Round-4 pre-registered fleet best-iterate smoothing confirmation
# (results/RESULTS.md "Round 4: pre-registered DECISIVE best-iterate
# confirmation"): seeds 1000-1447 (n=448 CRN pairs), 28 idempotent chunks
# of 16 seeds x both arms, S=16 fleet programs (the measured amortization
# optimum, SCALING.md).  Re-runnable: completed chunk CSVs are skipped;
# a chunk killed mid-run leaves no CSV and is retried.
#
#   setsid nohup bash scripts/r4_best_iter_campaign.sh \
#       > /tmp/r4_campaign.log 2>&1 &
cd /root/repo || exit 1
mkdir -p results/fleet_best_iter_chunks
for lo in $(seq 1000 16 1447); do
  hi=$((lo + 15))
  out="results/fleet_best_iter_chunks/seeds_${lo}_${hi}.csv"
  if [ -f "$out" ]; then
    echo "== chunk ${lo}-${hi}: already done =="
    continue
  fi
  seeds=$(seq -s, "$lo" "$hi")
  echo "== chunk ${lo}-${hi} start $(date -u +%H:%M:%S) =="
  timeout 1500 python scripts/digits_smoothing_best_iterate.py --fleet \
      --fleet_chunk 16 --seeds "$seeds" --nepochs 72 \
      --output_csv "$out" || echo "chunk ${lo} failed rc=$?"
done
n=$(ls results/fleet_best_iter_chunks/seeds_1*.csv 2>/dev/null | wc -l)
echo "CAMPAIGN_CHUNKS_DONE ${n}/28 $(date -u +%H:%M:%S)"

# item 2: the 72-epoch fleet u-sweep as ONE program (u x seeds = 96
# members), replacing the 12-epoch pilot; must reproduce the stored
# sequential null (results/u_sweep_72ep_24seed.csv) statistically.
if [ ! -f results/fleet_u_sweep_72ep.csv ]; then
  echo "== fleet u-sweep 72ep start $(date -u +%H:%M:%S) =="
  timeout 5400 python -m neural_ode_metasolver_tpu.runners.u_sweep --fleet \
      --fallback_dataset digits --u_grid 0.3,0.5,0.6667,1.0 \
      --seeds $(seq -s, 1 24) --nepochs 72 \
      --adv_training_mode at --eps 0.3 \
      --output_csv results/fleet_u_sweep_72ep.csv \
      || echo "u-sweep failed rc=$?"
fi
echo "ALL_DONE $(date -u +%H:%M:%S)"
