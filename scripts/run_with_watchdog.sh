#!/usr/bin/env bash
# Unattended-training watchdog: restarts the driver from the newest
# full-state checkpoint if the log goes stale (hung device dispatch — seen
# on flaky TPU tunnels) or the process dies. Complements the in-process
# crash auto-resume (which cannot recover from a HUNG dispatch).
#
# Usage: scripts/run_with_watchdog.sh <config.yaml> <logfile> [stale_secs] \
#            [cold-start args...]
# Extra args (e.g. --init-from ckpt) are passed ONLY while no checkpoint
# exists in the config's checkpoint_dir — once the run has checkpointed,
# restarts switch to --resume <newest> and drop them.
# Env: WATCHDOG_DEADLINE_TS=<epoch secs> — hard stop: kill the trainer and
# exit 0 at that time (campaign resumes later from the newest checkpoint);
# frees the chip for a scheduled benchmark without losing work.
set -u
CONFIG="$1"; LOG="$2"; shift 2
STALE=600
if [ $# -gt 0 ] && [[ "$1" =~ ^[0-9]+$ ]]; then
  STALE="$1"; shift   # stale_secs is optional; cold args may follow directly
fi
COLD_ARGS=("$@")
DEADLINE="${WATCHDOG_DEADLINE_TS:-0}"
RESULTS_DIR=$(python - "$CONFIG" <<'PY'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
print((cfg.get("training") or {}).get("checkpoint_dir", "results"))
PY
)
touch "$LOG"
# Bench cooperation: bench.py must never measure while a trainer holds the
# chip (30%+ distortion). The watchdog registers the live trainer PID under
# .run/<config>.pid; bench touches .run/pause, SIGTERMs the registered PIDs
# (graceful checkpoint + exit), measures, then removes the flag — the loop
# below waits for the flag to clear before relaunching.
RUN_REG=".run/$(basename "$CONFIG" .yaml).pid"
PAUSE_FLAG=".run/pause"
mkdir -p .run
trap 'rm -f "$RUN_REG"' EXIT
# Cold-start override: when a better warm-start donor becomes available
# AFTER a queue was launched (queue scripts can't be edited while bash is
# executing them), drop its path into <results_dir>/cold_init_override —
# it replaces the path following --init-from in the cold args. Ignored as
# soon as the run has its own checkpoints (normal resume wins).
OVERRIDE_FILE="$RESULTS_DIR/cold_init_override"
if [ -f "$OVERRIDE_FILE" ]; then
  OVERRIDE=$(head -1 "$OVERRIDE_FILE")
  if [ -f "$OVERRIDE" ]; then
    for i in "${!COLD_ARGS[@]}"; do
      if [ "${COLD_ARGS[$i]}" = "--init-from" ]; then
        COLD_ARGS[$((i+1))]="$OVERRIDE"
        echo "[watchdog] cold-start override: --init-from $OVERRIDE" >> "$LOG"
      fi
    done
  else
    echo "[watchdog] cold_init_override points at missing file: $OVERRIDE (ignored)" >> "$LOG"
  fi
fi
# A pause flag can outlive a CRASHED bench (kill -9 skips bench.py's
# cleanup); without a bound the campaign would stay stopped until a human
# noticed. A healthy bench finishes in well under PAUSE_MAX even on a cold
# compile cache, so a flag older than that is abandoned — remove it and
# resume (VERDICT r4 Weak #5).
PAUSE_MAX="${WATCHDOG_PAUSE_MAX:-1800}"
while true; do
  while [ -f "$PAUSE_FLAG" ]; do
    if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "[watchdog] deadline reached while paused - exiting" >> "$LOG"
      exit 0
    fi
    FLAG_AGE=$(( $(date +%s) - $(stat -c %Y "$PAUSE_FLAG" 2>/dev/null || date +%s) ))
    if [ "$FLAG_AGE" -gt "$PAUSE_MAX" ]; then
      echo "[watchdog] pause flag stale ${FLAG_AGE}s (bench crashed?) - removing and resuming" >> "$LOG"
      rm -f "$PAUSE_FLAG"
      break
    fi
    sleep 15
  done
  RESUME=()
  LATEST=$(find "$RESULTS_DIR" -name '*.ckpt' -printf '%T@ %p\n' 2>/dev/null \
           | sort -rn | head -1 | cut -d' ' -f2-)
  if [ -n "$LATEST" ]; then
    RESUME=(--resume "$LATEST")
  elif [ "${#COLD_ARGS[@]}" -gt 0 ]; then
    RESUME=("${COLD_ARGS[@]}")
  fi
  echo "[watchdog] launching (resume: ${LATEST:-none})" >> "$LOG"
  python -u -m nsfnet_tpu.train --config "$CONFIG" "${RESUME[@]}" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > "$LOG.pid"  # current trainer PID (kill by PID, never by pattern)
  echo "$PID" > "$RUN_REG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
      # Graceful stop: SIGTERM lets the trainer finish the in-flight device
      # dispatch, checkpoint, and exit (train.py GracefulStop). SIGKILL
      # mid-dispatch has wedged the remote TPU worker — only escalate if
      # the trainer ignores TERM for 3 minutes (i.e. the dispatch is hung).
      echo "[watchdog] deadline reached - SIGTERM pid $PID (resume later from newest ckpt)" >> "$LOG"
      kill -TERM "$PID" 2>/dev/null
      for _ in $(seq 1 36); do
        kill -0 "$PID" 2>/dev/null || break
        sleep 5
      done
      if kill -0 "$PID" 2>/dev/null; then
        echo "[watchdog] trainer ignored SIGTERM for 180s - SIGKILL" >> "$LOG"
        kill -9 "$PID" 2>/dev/null
      fi
      wait "$PID" 2>/dev/null  # reap: no zombie left behind
      exit 0
    fi
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALE" ]; then
      # TERM first: a trainer that is merely slow (not hung) checkpoints
      # and exits gracefully. SIGKILL mid-dispatch has wedged the remote
      # TPU worker for hours (CLAUDE.md) — escalate only if TERM is
      # ignored for 180 s, which means the dispatch really is hung.
      echo "[watchdog] log stale ${AGE}s - SIGTERM pid $PID" >> "$LOG"
      kill -TERM "$PID" 2>/dev/null
      for _ in $(seq 1 36); do
        kill -0 "$PID" 2>/dev/null || break
        sleep 5
      done
      if kill -0 "$PID" 2>/dev/null; then
        echo "[watchdog] trainer ignored SIGTERM for 180s - SIGKILL" >> "$LOG"
        kill -9 "$PID" 2>/dev/null
      fi
      sleep 5
      break
    fi
  done
  if wait "$PID" 2>/dev/null; then
    echo "[watchdog] training completed" >> "$LOG"
    exit 0
  else
    RC=$?
    if [ "$RC" -eq 2 ]; then
      # argparse/config errors are deterministic — restarting would loop
      # forever (e.g. a typoed --init-from path); fail fast instead
      echo "[watchdog] trainer exited with a configuration error (rc=2) - aborting" >> "$LOG"
      exit 1
    fi
  fi
  echo "[watchdog] run ended abnormally - restarting" >> "$LOG"
  sleep 10
done
