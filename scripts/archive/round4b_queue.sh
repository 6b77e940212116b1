#!/usr/bin/env bash
# Round-4 (live) campaign queue — single chip, sequential, unattended.
#
# Chip-time plan for the ~11 h round (VERDICT r3 "Next round" items):
#   A. Re=4000 toward the <4% north star (VERDICT #1): LM capacity ladder
#      (the machinery that took Re=2000 4.62% -> 3.93%) straight from the
#      11.64% gentle-anneal state. The ladder self-probes: if resampled LM
#      random-walks at this Re (the Re=5000 redraw pathology), per-rung
#      stall advances end it cheaply and the queue falls back to the
#      fixed-points Adam h160 widen (configs/re4000_walk_polish_h160.yaml).
#   B. Re=5000: finish the deadline-cut Q2/Q3 descent (VERDICT #3),
#      resumed bit-exactly from the committed artifacts/re5000_walk/
#      best_state.ckpt (step 180k, mid-Q2).
#   C. Re=3000 gentle anneal vs the shipped DNS (VERDICT #5).
#   D. Remainder: Re=2000 streamfunction campaign (VERDICT #4) — will be
#      deadline-cut and is resumable next round.
# (VERDICT #2, the 13 h re2000_6x80_full replay, cannot fit in the same
# round as A-C on one chip; it stays queued in scripts/round4_queue.sh
# for a round that can dedicate the chip to it.)
#
# Between slots: if .gap_request exists, run scripts/round4_gap.sh (bounded)
# — used for perf-matrix / psi-kernel measurements on the freed chip.
#
# Usage: ROUND_END_TS=$(date -u -d '2026-08-19 16:00' +%s) scripts/round4b_queue.sh
set -u
cd "$(dirname "$0")/.."
LOGDIR="${LOGDIR:-logs/round4}"
mkdir -p "$LOGDIR"
ROUND_END_TS="${ROUND_END_TS:-0}"

note() { echo "[queue] $(date -u +%H:%M:%S) $*" | tee -a "$LOGDIR/queue.log"; }

mins_left() {
  if [ "$ROUND_END_TS" -le 0 ]; then echo 99999; return; fi
  echo $(( (ROUND_END_TS - $(date +%s)) / 60 ))
}

wait_for_tpu() {
  # A hung worker blocks INSIDE the runtime — probe in a subprocess with a
  # hard timeout; never import jax in this shell's parent python.
  for i in $(seq 1 200); do
    if timeout 600 python -c 'import jax, jax.numpy as jnp; jax.config.update("jax_compilation_cache_dir", ".jax_cache"); x = jax.random.normal(jax.random.PRNGKey(0), (256,256)); (x @ x).block_until_ready()' >/dev/null 2>&1; then
      return 0
    fi
    note "TPU probe $i failed; retrying in 4 min"
    sleep 240
  done
  return 1
}

gap_hook() {
  if [ -f .gap_request ] && [ -x scripts/round4_gap.sh ]; then
    note "running gap hook"
    rm -f .gap_request
    timeout 2700 scripts/round4_gap.sh >> "$LOGDIR/gap.log" 2>&1
    note "gap hook done (rc=$?)"
  fi
}

run_slot() {
  # run_slot <config> <hours> [cold-start args...]
  cfg="$1"; hours="$2"; shift 2
  log="$LOGDIR/$(basename "$cfg" .yaml).log"
  now=$(date +%s)
  stop=$(( now + $(python -c "print(int($hours*3600))") ))
  if [ "$ROUND_END_TS" -gt 0 ] && [ "$stop" -gt "$ROUND_END_TS" ]; then
    stop="$ROUND_END_TS"
  fi
  if [ "$stop" -le "$((now + 600))" ]; then
    note "SKIP $cfg (past deadline)"
    return 0
  fi
  wait_for_tpu || { note "TPU never recovered; aborting"; return 1; }
  note "starting $cfg (slot ends $(date -u -d "@$stop" +%H:%M))"
  WATCHDOG_DEADLINE_TS="$stop" scripts/run_with_watchdog.sh "$cfg" "$log" 900 "$@"
  note "finished $cfg (rc=$?)"
  gap_hook
}

# ---------------------------------------------------------------- Slot A
# Re=4000 LM capacity ladder from the committed 11.64% h80 state.
LADDER_DIR=artifacts/ladder_re4000
if [ ! -f "$LADDER_DIR/trajectory.csv" ] || [ "$(mins_left)" -gt 540 ]; then
  wait_for_tpu || exit 1
  note "slot A: re4000 capacity ladder (budget 190 min)"
  timeout 13500 python scripts/capacity_ladder.py \
      configs/re4000_ev_gentle.yaml artifacts/re4000_gentle/final_state.ckpt \
      --rungs 80:6,160:24 --steps 150 --nf 80000 --micro 1 \
      --budget-min 190 --target 3.95 --outdir "$LADDER_DIR" \
      >> "$LOGDIR/ladder_re4000.log" 2>&1
  note "slot A ladder phase 1 done (rc=$?)"
fi
gap_hook

START=$(sed -n 2p "$LADDER_DIR/trajectory.csv" 2>/dev/null | cut -d, -f5)
BEST=$(tail -1 "$LADDER_DIR/trajectory.csv" 2>/dev/null | cut -d, -f6)
IMPROVED=$(python -c "print(1 if (${START:-0}) - (${BEST:-0}) >= 0.75 else 0)" 2>/dev/null || echo 0)
if [ "$IMPROVED" = "1" ]; then
  # LM ladder works at Re=4000 — push higher rungs (microbatched GN).
  LAST_CKPT=$(find "$LADDER_DIR" -name 'model_h*.ckpt' -printf '%T@ %p\n' \
              | sort -rn | head -1 | cut -d' ' -f2-)
  if [ -n "$LAST_CKPT" ] && [ "$(mins_left)" -gt 200 ]; then
    # phase-2 config must match the donor width; ladder widens from there.
    H=$(python - "$LAST_CKPT" <<'PY'
import json, sys
print(json.load(open(sys.argv[1] + ".json"))["hidden_size"])
PY
)
    sed "s/hidden_size: 80/hidden_size: ${H}/" configs/re4000_ev_gentle.yaml \
        > configs/_re4000_ladder_p2.yaml
    note "slot A phase 2: rungs 224/288 from $LAST_CKPT (h=$H)"
    timeout 10800 python scripts/capacity_ladder.py \
        configs/_re4000_ladder_p2.yaml "$LAST_CKPT" \
        --rungs 224:15,288:12 --steps 150 --nf 80000 --micro 3 \
        --budget-min 150 --target 3.95 --outdir "$LADDER_DIR" \
        >> "$LOGDIR/ladder_re4000.log" 2>&1
    note "slot A ladder phase 2 done (rc=$?)"
  fi
else
  # LM random-walked (Re=5000 redraw pathology) — Adam fixed-points widen.
  note "slot A fallback: Adam h160 fixed-points widen (ladder gained <0.75)"
  run_slot configs/re4000_walk_polish_h160.yaml 3 \
      --init-from artifacts/re4000_gentle/final_state.ckpt
fi
gap_hook

# ---------------------------------------------------------------- Slot B
# Re=5000: resume the deadline-cut Q2 descent bit-exactly.
if [ ! -d results_re5000_walk_polish ] || \
   [ -z "$(find results_re5000_walk_polish -name '*.ckpt' 2>/dev/null)" ]; then
  mkdir -p results_re5000_walk_polish
  cp artifacts/re5000_walk/best_state.ckpt \
     results_re5000_walk_polish/resume_step180000.ckpt
  cp artifacts/re5000_walk/best_state.ckpt.json \
     results_re5000_walk_polish/resume_step180000.ckpt.json
  note "seeded results_re5000_walk_polish from artifacts/re5000_walk (step 180k, Q2)"
fi
run_slot configs/re5000_walk_polish_h160.yaml 2.0

# ---------------------------------------------------------------- Slot C
# Re=3000 gentle anneal (stall-aware; nominal 1.05M epochs).
run_slot configs/re3000_ev_gentle.yaml 3.5

# ---------------------------------------------------------------- Slot D
# Remainder: streamfunction campaign (deadline-cut, resumable).
run_slot configs/re2000_sf_ev.yaml 12

note "queue complete"
