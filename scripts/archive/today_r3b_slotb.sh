#!/usr/bin/env bash
# Round-3 window-2, slot-B orchestrator (replaces today_r3b.sh's slot B).
#
# Waits for slot A's watchdog (re5000 continuation) to finish — completion
# or its 19:05 deadline — then uses the freed chip for the one hardware
# measurement the perf matrix is missing (the fused streamfunction Pallas
# row, interpret-mode-infeasible on CPU), bounded so it cannot eat the
# campaign budget, and finally launches slot B: the Re=5000 h80->h160
# widened continuation from slot A's newest checkpoint.
#
# Usage:  nohup scripts/today_r3b_slotb.sh >/dev/null 2>&1 & echo $! > /tmp/r3b_slotb.pid
set -u
cd "$(dirname "$0")/.."
LOGDIR=logs/round3b
mkdir -p "$LOGDIR"
SLOT_B_END=$(date -u -d '2026-08-19 01:25' +%s)
A_LOG="$LOGDIR/re5000_cont.log"

log() { echo "[r3b-slotB] $(date -u +%H:%M:%S) $*" >> "$LOGDIR/queue.log"; }

# 1. Wait for slot A's watchdog to end the run (it exits after "training
#    completed" or the deadline SIGTERM; the trainer PID file tracks the
#    live process — never kill by pattern).
log "waiting for slot A to finish"
while true; do
  if grep -q "\[watchdog\] training completed\|deadline reached - SIGTERM" "$A_LOG" 2>/dev/null; then
    PID=$(cat "$A_LOG.pid" 2>/dev/null || echo "")
    if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
      break
    fi
  fi
  sleep 30
done
sleep 15  # let the watchdog reap and exit
log "slot A finished; chip free"

wait_for_tpu() {
  for i in $(seq 1 60); do
    if timeout 150 python -c 'import jax, jax.numpy as jnp; x = jax.random.normal(jax.random.PRNGKey(0), (256,256)); (x @ x).block_until_ready()' >/dev/null 2>&1; then
      return 0
    fi
    log "TPU probe $i failed; retry in 4 min"
    sleep 240
  done
  return 1
}

# 2. Bounded perf-matrix capture (adds the sf/pallas hardware row).
#    35 min hard cap: a fresh third-order Pallas compile can take ~10 min.
wait_for_tpu || exit 1
log "perf matrix capture starting (35 min cap)"
timeout 2100 python scripts/perf_matrix.py > "$LOGDIR/perf_matrix.jsonl" 2> "$LOGDIR/perf_matrix.log"
log "perf matrix done (rc=$?)"

# 3. Slot B: widened continuation from slot A's best state.
CONT_BEST=$(find results_re5000_cont -name '*.ckpt' -printf '%T@ %p\n' 2>/dev/null \
            | sort -rn | head -1 | cut -d' ' -f2-)
log "slot B: h160 widen from ${CONT_BEST:-re5000_gentle fallback} (until $(date -u -d "@$SLOT_B_END" +%H:%M))"
wait_for_tpu || exit 1
WATCHDOG_DEADLINE_TS=$SLOT_B_END scripts/run_with_watchdog.sh \
    configs/re5000_ev_polish_h160.yaml "$LOGDIR/re5000_polish.log" 900 \
    --init-from "${CONT_BEST:-artifacts/re5000_gentle/final_state.ckpt}"
log "slot B done (rc=$?)"
log "queue complete"
