#!/usr/bin/env bash
# Round-3 (second 12h window) chip schedule — two sequential campaign slots
# under the hang-recovery watchdog, each with a hard SIGTERM deadline so the
# end-of-round driver bench always gets a free, healthy chip.
#
#   Slot A  re5000_cont_from_re4000   (Reynolds continuation, ~4h budget)
#   Slot B  re5000_ev_polish_h160     (Net2Net h80->h160 widen of A's output)
#
# Usage:  nohup scripts/today_r3b.sh >/dev/null 2>&1 & echo $! > /tmp/r3b.pid
set -u
cd "$(dirname "$0")/.."
LOGDIR=logs/round3b
mkdir -p "$LOGDIR"

SLOT_A_END=$(date -u -d '2026-08-18 19:05' +%s)
SLOT_B_END=$(date -u -d '2026-08-19 01:25' +%s)

wait_for_tpu() {
  for i in $(seq 1 100); do
    if timeout 150 python -c 'import jax, jax.numpy as jnp; x = jax.random.normal(jax.random.PRNGKey(0), (256,256)); (x @ x).block_until_ready()' >/dev/null 2>&1; then
      return 0
    fi
    echo "[r3b] $(date -u +%H:%M:%S) TPU probe $i failed; retry in 4 min" >> "$LOGDIR/queue.log"
    sleep 240
  done
  return 1
}

echo "[r3b] $(date -u +%H:%M:%S) slot A: re5000 continuation (until $(date -u -d "@$SLOT_A_END" +%H:%M))" >> "$LOGDIR/queue.log"
wait_for_tpu || exit 1
WATCHDOG_DEADLINE_TS=$SLOT_A_END scripts/run_with_watchdog.sh \
    configs/re5000_cont_from_re4000.yaml "$LOGDIR/re5000_cont.log" 900 \
    --init-from artifacts/re4000_gentle/final_state.ckpt
echo "[r3b] $(date -u +%H:%M:%S) slot A done (rc=$?)" >> "$LOGDIR/queue.log"

# Slot B starts from the best continuation state (newest checkpoint —
# model_final.ckpt if A completed, otherwise the deadline checkpoint).
CONT_BEST=$(find results_re5000_cont -name '*.ckpt' -printf '%T@ %p\n' 2>/dev/null \
            | sort -rn | head -1 | cut -d' ' -f2-)
echo "[r3b] $(date -u +%H:%M:%S) slot B: h160 widen from ${CONT_BEST:-re5000_gentle fallback} (until $(date -u -d "@$SLOT_B_END" +%H:%M))" >> "$LOGDIR/queue.log"
wait_for_tpu || exit 1
WATCHDOG_DEADLINE_TS=$SLOT_B_END scripts/run_with_watchdog.sh \
    configs/re5000_ev_polish_h160.yaml "$LOGDIR/re5000_polish.log" 900 \
    --init-from "${CONT_BEST:-artifacts/re5000_gentle/final_state.ckpt}"
echo "[r3b] $(date -u +%H:%M:%S) slot B done (rc=$?)" >> "$LOGDIR/queue.log"
echo "[r3b] $(date -u +%H:%M:%S) queue complete" >> "$LOGDIR/queue.log"
