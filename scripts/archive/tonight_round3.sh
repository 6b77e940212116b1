#!/usr/bin/env bash
# Round-3 evening sequence (run each block manually as the chip frees):
#
# 1) After the Re=5000 gentle campaign completes (logs/re5000_gentle.log
#    says "Training Completed"):
#      python scripts/capture_artifacts.py configs/re5000_ev_gentle.yaml \
#          'results_re5000_gentle/**/model_final.ckpt' artifacts/re5000_gentle
#      python scripts/convergence_table.py configs/re5000_ev_gentle.yaml \
#          'results_re5000_gentle/**/*.ckpt' artifacts/re5000_trajectory.csv --cpu
#
# 2) Pallas tile sweep at exact fp32 (chip must be otherwise idle):
#      python scripts/pallas_tile_sweep.py --precision highest \
#          --tiles 512,1024,2048 --bwd auto,128 --steps 300 \
#          | tee artifacts/tile_sweep_highest.jsonl
#    then refresh the full matrix:
#      python scripts/perf_matrix.py | tee artifacts/perf_matrix.md
#
# 3) Re=4000 widened continuation (stop 02:30 UTC; frees the chip for the
#    end-of-round driver bench):
#      WATCHDOG_DEADLINE_TS=$(date -u -d '2026-08-18 02:30' +%s) \
#      nohup scripts/run_with_watchdog.sh configs/re4000_ev_polish_h160.yaml \
#          logs/re4000_polish.log 600 \
#          --init-from artifacts/re4000_gentle/final_state.ckpt \
#          >/dev/null 2>&1 & echo $! > /tmp/wd4000p.pid
echo "documentation script - read the comments; blocks are manual"
