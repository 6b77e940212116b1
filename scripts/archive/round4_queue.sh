#!/usr/bin/env bash
# Round-4 campaign queue (single chip, sequential, unattended).
#
# Priorities (VERDICT r2 "Next round" #1/#2 + round-3 findings):
#   1. Re=2000 at the REFERENCE architecture (6x80) on the reference's full
#      3M-epoch curriculum (~13 h at measured 63.8 it/s) — closes the
#      "<4% at 6x80" question. configs/re2000_6x80_full.yaml
#   2. Re=4000 widened continuation (h80->h160 warm start, RAR resampling,
#      stall-aware; ~7 h for the full 720k budget) — pushes past the h80
#      capacity floor at 11.6%.
#   3. Re=5000 widened continuation: resume the round-3 h160 widen from
#      its deadline state (u 14.96%, still descending -0.07/25k — Q2 has
#      40k epochs left, then Q3 at 1e-6).
#
# Each campaign runs under the hang-recovery watchdog; a wedged TPU worker
# (seen 2026-08-17: kill -9 mid-dispatch wedged the axon worker for hours)
# is handled by the health gate: wait_for_tpu blocks until a subprocess
# matmul probe succeeds. Set per-campaign deadlines so a slot overrun
# cannot starve the rest of the round:
#
#   ROUND_END_TS=$(date -u -d 'YYYY-MM-DD HH:MM' +%s) scripts/round4_queue.sh
#
# Interrupted campaigns resume bit-exactly from their newest checkpoint
# (sampler/RAR state rides in metadata) on the next queue invocation.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${LOGDIR:-logs/round4}"
mkdir -p "$LOGDIR"
ROUND_END_TS="${ROUND_END_TS:-0}"

wait_for_tpu() {
  # A hung worker blocks INSIDE the runtime — probe in a subprocess with a
  # hard timeout; never import jax in this shell's parent python.
  for i in $(seq 1 200); do
    if timeout 150 python -c 'import jax, jax.numpy as jnp; x = jax.random.normal(jax.random.PRNGKey(0), (256,256)); (x @ x).block_until_ready()' >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue] $(date -u +%H:%M:%S) TPU probe $i failed; retrying in 4 min" | tee -a "$LOGDIR/queue.log"
    sleep 240
  done
  return 1
}

run_slot() {
  # run_slot <config> <hours> [cold-start args...]
  cfg="$1"; hours="$2"; shift 2
  log="$LOGDIR/$(basename "$cfg" .yaml).log"
  now=$(date +%s)
  stop=$((now + hours * 3600))
  if [ "$ROUND_END_TS" -gt 0 ] && [ "$stop" -gt "$ROUND_END_TS" ]; then
    stop="$ROUND_END_TS"
  fi
  if [ "$stop" -le "$now" ]; then
    echo "[queue] $(date -u +%H:%M:%S) SKIP $cfg (past deadline)" | tee -a "$LOGDIR/queue.log"
    return 0
  fi
  wait_for_tpu || { echo "[queue] TPU never recovered; aborting" | tee -a "$LOGDIR/queue.log"; return 1; }
  echo "[queue] $(date -u +%H:%M:%S) starting $cfg (slot ends $(date -u -d "@$stop" +%H:%M))" | tee -a "$LOGDIR/queue.log"
  WATCHDOG_DEADLINE_TS="$stop" scripts/run_with_watchdog.sh "$cfg" "$log" 900 "$@"
  echo "[queue] $(date -u +%H:%M:%S) finished $cfg (rc=$?)" | tee -a "$LOGDIR/queue.log"
}

run_slot configs/re2000_6x80_full.yaml 14

# Re=5000: round 3 settled the recipe — Reynolds continuation walked
# GENTLY (constant lr 2e-6, dRe=100, one point draw: +0.19/rung where
# the first walk's lr-restart+RAR rungs cost up to +2.9) then a
# fixed-points h160 widen, ending at u 14.96% still descending. The
# watchdog resumes the widen bit-exactly from its newest checkpoint
# (results_re5000_walk_polish has checkpoints, so the cold --init-from
# below is ignored); if the Q3 end still hasn't flattened, clone the
# config with extended stages or a second widen h160->h320.
# Explicit preference order (NOT newest-mtime: on a fresh checkout mtimes
# are checkout times, which could nondeterministically warm-start the h160
# polish from the weaker h80 walk state): the polish slot's own scratch
# checkpoints first (watchdog resume), then the curated widened state,
# then the h80 walk best.
WALK_BEST=""
for cand in \
    "$(find results_re5000_walk_polish -name '*.ckpt' -printf '%T@ %p\n' 2>/dev/null \
        | sort -rn | head -1 | cut -d' ' -f2-)" \
    artifacts/re5000_walk/best_state.ckpt \
    artifacts/re5000_polish/best_state.ckpt \
    artifacts/re5000_walk/best_h80_state.ckpt; do
  if [ -n "$cand" ] && [ -f "$cand" ]; then WALK_BEST="$cand"; break; fi
done
run_slot configs/re5000_walk_polish_h160.yaml 8 \
    --init-from "${WALK_BEST:-artifacts/re5000_polish/best_state.ckpt}"

# Re=4000: widen past the h80 11.6% floor with the SAME lessons (the
# re4000_ev_polish_h160 config predates them — per-stage RAR resampling
# measured as a +/-2% random walk at Re=5000; prefer a fixed-points
# variant cloned from re5000_walk_polish_h160 with Re: 4000).
run_slot configs/re4000_ev_polish_h160.yaml 8 \
    --init-from artifacts/re4000_gentle/final_state.ckpt

# Re=3000: the reference ships the DNS field but no config — completes
# the published-DNS family (2000/3000/4000/5000).
run_slot configs/re3000_ev_gentle.yaml 6

# Streamfunction formulation at Re=2000 (round-3 feature): exact
# continuity + stall-aware gentle anneal. Scientifically the most
# interesting open run — does the hard div-free constraint move the DNS
# error at production scale the way the Re=100 A/B suggests?
run_slot configs/re2000_sf_ev.yaml 10

echo "[queue] $(date -u +%H:%M:%S) queue complete" | tee -a "$LOGDIR/queue.log"
