#!/usr/bin/env bash
# Between-slot chip measurements, run by round4b_queue.sh's gap_hook when
# .gap_request exists (bounded overall by the queue's 2700 s timeout):
#   1. fused residual-loss kernel (ops/pallas_residual.py): Mosaic
#      validation — writes artifacts/fused_hw_ok.json, the marker that
#      flips the solver's on-TPU default to fused — then the fused-vs-
#      stream A/B at highest/high (VERDICT r3 #6: exact-fp32 >= 50x).
#   2. full perf-matrix refresh, incl. the streamfunction Pallas-kernel
#      row on real Mosaic (VERDICT r3 #4's measurement half).
set -u
cd "$(dirname "$0")/.."
if [ -f artifacts/fused_hw_ok.json ] && \
   python -c 'import json,sys; sys.exit(0 if json.load(open("artifacts/fused_hw_ok.json")).get("validated") else 1)'; then
  echo "[gap] fused_hw_check already validated; skipping (~13 min of chip time)"
else
  echo "[gap] $(date -u +%H:%M:%S) fused_hw_check"
  timeout 1800 python scripts/fused_hw_check.py
  echo "[gap] $(date -u +%H:%M:%S) fused_hw_check rc=$?"
fi
if [ -f artifacts/psi_hw_ok.json ] && \
   python -c 'import json,sys; sys.exit(0 if json.load(open("artifacts/psi_hw_ok.json")).get("validated") else 1)'; then
  echo "[gap] psi_hw_check already validated; skipping"
else
  echo "[gap] $(date -u +%H:%M:%S) psi_hw_check"
  timeout 1500 python scripts/psi_hw_check.py
  echo "[gap] $(date -u +%H:%M:%S) psi_hw_check rc=$?"
fi
# perf_matrix: skip when the committed matrix is fresh (<4 h) — one full
# refresh per round is enough chip time
if [ -n "$(find artifacts/perf_matrix.json -mmin -240 2>/dev/null)" ]; then
  echo "[gap] perf_matrix fresh (<4 h); skipping"
else
  echo "[gap] $(date -u +%H:%M:%S) perf_matrix"
  timeout 1500 python scripts/perf_matrix.py
  echo "[gap] $(date -u +%H:%M:%S) perf_matrix rc=$?"
fi
