#!/usr/bin/env bash
# Round-5 (final round) campaign queue — single chip, sequential, unattended.
#
# Priorities (VERDICT r3 + round-4 results):
#   A. Re=4000 <4% north star — the one open BASELINE bar. Round 4 took it
#      11.64% -> 9.82% (h160 fixed-points Adam, still -0.33/80k at budget
#      exhaustion). The route is picked by the round-4 end-of-round probe
#      artifacts/lm_fixed_re4000/trajectory.csv:
#        * probe gained >=0.5 pts  -> fixed-points LM ladder h160/h224/h288
#          (second-order tail convergence works at this Re once the redraw
#          pathology is removed) — fastest plausible path to <4%;
#        * probe flat/absent       -> brute extended low-lr Adam descent
#          (configs/re4000_polish_h160_ext.yaml, ~4.5 h) then the h224 rung
#          (configs/re4000_widen_h224.yaml, ~2.5 h).
#      Either way, if a floor blocks <4%, the deliverable degrades to the
#      quantified per-width plateau table (VERDICT r3 #1 fallback).
#   B. Re=5000 h224 rung (~2 h) from the quasi-converged h160 floor 14.63%.
#   C. Streamfunction Re=2000 campaign resume (results_re2000_sf has the
#      round-4 deadline-cut start) — VERDICT #4's campaign half.
#
# NOT in this queue: the 13 h re2000_6x80_full replay (VERDICT r2 #2 /
# r3 #2). It is mutually exclusive with A-C on one chip; running it means
# running ONLY it. If the judge's round-4 verdict ranks it above the north
# star, launch `scripts/run_with_watchdog.sh configs/re2000_6x80_full.yaml
# logs/round5/re2000_6x80.log 900` as the whole round instead.
#
# Usage: ROUND_END_TS=$(date -u -d '<end>' +%s) scripts/round5_queue.sh
set -u
cd "$(dirname "$0")/.."
LOGDIR="${LOGDIR:-logs/round5}"
mkdir -p "$LOGDIR"
ROUND_END_TS="${ROUND_END_TS:-0}"

note() { echo "[queue] $(date -u +%H:%M:%S) $*" | tee -a "$LOGDIR/queue.log"; }

mins_left() {
  if [ "$ROUND_END_TS" -le 0 ]; then echo 99999; return; fi
  echo $(( (ROUND_END_TS - $(date +%s)) / 60 ))
}

wait_for_tpu() {
  for i in $(seq 1 200); do
    if timeout 600 python -c 'import jax; jax.config.update("jax_compilation_cache_dir", ".jax_cache"); x = jax.random.normal(jax.random.PRNGKey(0), (256,256)); (x @ x).block_until_ready()' >/dev/null 2>&1; then
      return 0
    fi
    note "TPU probe $i failed; retrying in 4 min"
    sleep 240
  done
  return 1
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
}

newest_ckpt() {  # newest_ckpt <dir> — scratch resume beats curated artifacts
  find "$1" -name '*.ckpt' -printf '%T@ %p\n' 2>/dev/null \
    | sort -rn | head -1 | cut -d' ' -f2-
}

# ---------------------------------------------------------------- Slot A
PROBE=artifacts/lm_fixed_re4000/trajectory.csv
PROBE_GAIN=$(python - "$PROBE" 2>/dev/null <<'PY' || echo 0
import csv, sys
rows = list(csv.DictReader(open(sys.argv[1])))
print(f"{float(rows[0]['mean_uv']) - min(float(r['best']) for r in rows):.3f}")
PY
)
note "slot A: fixed-LM probe gain = ${PROBE_GAIN} pts"
if python -c "exit(0 if ${PROBE_GAIN:-0} >= 0.5 else 1)" 2>/dev/null; then
  # Fixed-points LM ladder: the Re=2000 closer, redraw pathology removed.
  wait_for_tpu || exit 1
  BEST=$(newest_ckpt artifacts/lm_fixed_re4000)
  note "slot A: fixed-points LM ladder from ${BEST}"
  timeout 21600 python scripts/capacity_ladder.py \
      configs/re4000_polish_h160_ext.yaml "${BEST:-artifacts/re4000_polish_h160/final_state.ckpt}" \
      --rungs 160:40,224:30,288:20 --steps 150 --nf 80000 --micro 3 \
      --fixed-points --budget-min 330 --target 3.95 \
      --outdir artifacts/lm_fixed_re4000 >> "$LOGDIR/ladder.log" 2>&1
  note "slot A LM ladder done (rc=$?)"
else
  # Brute descent, then the h224 rung from whatever the descent reached.
  run_slot configs/re4000_polish_h160_ext.yaml 4.5 \
      --init-from artifacts/re4000_polish_h160/final_state.ckpt
  H224_DONOR=$(newest_ckpt results_re4000_ext)
  run_slot configs/re4000_widen_h224.yaml 2.5 \
      --init-from "${H224_DONOR:-artifacts/re4000_polish_h160/final_state.ckpt}"
fi

# ---------------------------------------------------------------- Slot B
run_slot configs/re5000_widen_h224.yaml 2.0 \
    --init-from artifacts/re5000_final/final_state.ckpt

# ---------------------------------------------------------------- Slot C
# Streamfunction campaign: resumes from results_re2000_sf if the round-4
# deadline-cut start left checkpoints there (watchdog auto-resume).
run_slot configs/re2000_sf_ev.yaml 12

note "queue complete"
