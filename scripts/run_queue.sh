#!/usr/bin/env bash
# Sequential single-chip campaign queue: runs each fixed-budget campaign
# under the hang-recovery watchdog, then the perf matrix. One TPU process
# at a time (concurrent device processes distort benchmarks and can hang
# the worker). Usage: scripts/run_queue.sh [logdir]
set -u
LOGDIR="${1:-logs/queue}"
mkdir -p "$LOGDIR"

run() {
  cfg="$1"; log="$LOGDIR/$(basename "$cfg" .yaml).log"
  echo "[queue] $(date +%H:%M:%S) starting $cfg -> $log"
  scripts/run_with_watchdog.sh "$cfg" "$log"
  echo "[queue] $(date +%H:%M:%S) finished $cfg (rc=$?)"
}

run configs/re5000_smoke.yaml
run configs/re4000_ev_run.yaml
run configs/re2000_nsfnet_run.yaml

echo "[queue] $(date +%H:%M:%S) perf matrix"
python scripts/perf_matrix.py > "$LOGDIR/perf_matrix.jsonl" 2> "$LOGDIR/perf_matrix.log"
echo "[queue] $(date +%H:%M:%S) queue complete"
