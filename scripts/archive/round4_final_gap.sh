#!/usr/bin/env bash
# Round-4 final chip gap (after the Re=3000 continuation slot, before the
# driver's end-of-round bench):
#   1. bench.py sanity — the fused residual-loss kernel became the on-TPU
#      default this round (artifacts/fused_hw_ok.json marker); make sure
#      the headline bench path still emits its one JSON line BEFORE the
#      driver records BENCH_r04.json, while there is still time to fix it.
#   2. Fixed-points LM probe at Re=4000 h160 (capacity_ladder
#      --fixed-points): separates "resampled-LM random-walks because of the
#      REDRAW" from "Gauss-Newton itself is useless at this Re". Its
#      trajectory gates scripts/round5_queue.sh slot A.
# Usage: GAP_END_TS=<epoch secs> scripts/round4_final_gap.sh
set -u
cd "$(dirname "$0")/.."
END="${GAP_END_TS:-0}"
echo "[gap4] $(date -u +%H:%M:%S) bench sanity"
timeout 900 python bench.py > /tmp/bench_sanity.json 2>/tmp/bench_sanity.err
rc=$?
echo "[gap4] bench rc=$rc: $(cat /tmp/bench_sanity.json)"
if [ "$END" -gt 0 ]; then
  MINS=$(( (END - $(date +%s)) / 60 - 2 ))
else
  MINS=25
fi
if [ "$MINS" -lt 6 ]; then
  echo "[gap4] no time left for the LM probe (${MINS} min)"; exit 0
fi
echo "[gap4] $(date -u +%H:%M:%S) fixed-points LM probe (${MINS} min)"
timeout $(( MINS * 60 + 120 )) python scripts/capacity_ladder.py \
    configs/re4000_polish_h160_ext.yaml \
    artifacts/re4000_polish_h160/final_state.ckpt \
    --rungs 160:12 --steps 150 --nf 80000 --micro 1 --fixed-points \
    --budget-min "$MINS" --outdir artifacts/lm_fixed_re4000
echo "[gap4] $(date -u +%H:%M:%S) probe done (rc=$?)"
cat artifacts/lm_fixed_re4000/trajectory.csv 2>/dev/null
