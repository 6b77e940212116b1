#!/usr/bin/env bash
# Checkpoint guard: bound what a VM REBOOT can erase.
#
# Gitignored scratch dirs (results_*) do not survive a host reboot — the
# workspace is re-checked-out from git. The 2026-08-20 01:57 reboot erased
# results_re4000_ext/ with the Re=4000 campaign at u 6.998% (step 1.525M);
# the newest committed state was 9.26%, costing ~6 h of descent. This loop
# makes the committed state track the live one:
#   every INTERVAL seconds
#     1. copy the newest *.ckpt (+ sidecar) from RESULTS_DIR to GUARD_DIR
#        (stable name latest.ckpt, tmp+rename so a reboot mid-copy can't
#        leave a torn file)
#     2. append new checkpoints' DNS errors to TRAJ_CSV on the CPU
#        (convergence_table --cpu --append; never touches the chip)
#     3. git add + commit both (retries next cycle on index-lock contention)
#
# Usage: scripts/ckpt_guard.sh <config.yaml> <results_dir> <guard_dir> \
#            <traj_csv> [interval_secs=1800]
set -u
CONFIG="$1"; RESULTS_DIR="$2"; GUARD_DIR="$3"; TRAJ="$4"
INTERVAL="${5:-1800}"
cd "$(dirname "$0")/.."
mkdir -p "$GUARD_DIR" logs
GLOG="logs/ckpt_guard_$(basename "$RESULTS_DIR").log"
# Restart detection: convergence_table --append dedups by checkpoint PATH,
# and a campaign restarted into the same results dir (reboot + --init-from)
# reuses the same loop<N>.ckpt paths with a reset step counter — the CSV
# would freeze at the previous segment's rows and the commit messages would
# report stale metrics (seen live 2026-08-20: guard said "step 100000
# u 8.826%" forever while the replay descended). If the CSV's newest row
# points at a checkpoint that no longer exists, rotate the CSV to a _segN
# sibling and start fresh; segment step counters overlap (each restart
# resets to 0 at its warm-start state), so readers stitch segments in
# rotation order.
# A missing row-checkpoint alone is NOT proof of a restart (ADVICE r4:
# pruning a sigterm_step*.ckpt recorded in the CSV, then restarting the
# guard, would spuriously rotate a live trajectory). Require the step
# counter to actually have gone BACKWARDS: rotate only if the results dir
# holds no checkpoint at all (fresh boot) or its newest checkpoint's step
# is below the CSV's last recorded step.
if [ -f "$TRAJ" ]; then
  NEWEST_ROW_CKPT=$(tail -1 "$TRAJ" | cut -d, -f2)
  CSV_STEP=$(tail -1 "$TRAJ" | cut -d, -f1)
  if [ -n "$NEWEST_ROW_CKPT" ] && [ "$NEWEST_ROW_CKPT" != "ckpt" ] \
     && [ ! -f "$NEWEST_ROW_CKPT" ]; then
    NEWEST_DIR_CKPT=$(find "$RESULTS_DIR" -name '*.ckpt' -printf '%T@ %p\n' 2>/dev/null \
                      | sort -rn | head -1 | cut -d' ' -f2-)
    DIR_STEP=-1
    if [ -n "$NEWEST_DIR_CKPT" ]; then
      DIR_STEP=$(python - "$NEWEST_DIR_CKPT" <<'STEP'
import json, re, sys
p = sys.argv[1]
try:
    print(int(json.load(open(p + ".json")).get("global_step", -1)))
except Exception:
    m = re.search(r"loop(\d+)\.ckpt$", p)
    print(int(m.group(1)) if m else -1)
STEP
)
    fi
    if [ "$DIR_STEP" -ge "${CSV_STEP:-0}" ] 2>/dev/null; then
      echo "[guard] row ckpt pruned but dir step $DIR_STEP >= CSV step $CSV_STEP — same segment, no rotation" >> "$GLOG"
    else
      N=1
      while [ -f "${TRAJ%.csv}_seg${N}.csv" ]; do N=$((N+1)); done
      mv "$TRAJ" "${TRAJ%.csv}_seg${N}.csv"
      git add "${TRAJ%.csv}_seg${N}.csv" >> "$GLOG" 2>&1 || true
      echo "[guard] rotated stale $TRAJ -> seg${N} (campaign restarted)" >> "$GLOG"
    fi
  fi
fi
LAST_COMMITTED=""
while true; do
  # a checkpoint modified in the last 30 s may still be renaming its
  # sidecar pair into place — wait it out and re-find rather than skip the
  # whole cycle (the first live cycle lost 30 min to a skip here)
  for _ in 1 2; do
    LATEST=$(find "$RESULTS_DIR" -name '*.ckpt' -printf '%T@ %p\n' 2>/dev/null \
             | sort -rn | head -1 | cut -d' ' -f2-)
    [ -z "$LATEST" ] && break
    AGE=$(( $(date +%s) - $(stat -c %Y "$LATEST") ))
    [ "$AGE" -ge 30 ] && break
    sleep 35
  done
  if [ -z "$LATEST" ] || [ "$LATEST" = "$LAST_COMMITTED" ]; then
    sleep "$INTERVAL"; continue
  fi
  cp "$LATEST" "$GUARD_DIR/latest.ckpt.tmp" \
    && mv "$GUARD_DIR/latest.ckpt.tmp" "$GUARD_DIR/latest.ckpt"
  if [ -f "$LATEST.json" ]; then
    cp "$LATEST.json" "$GUARD_DIR/latest.ckpt.json.tmp" \
      && mv "$GUARD_DIR/latest.ckpt.json.tmp" "$GUARD_DIR/latest.ckpt.json"
  fi
  timeout 1200 python scripts/convergence_table.py "$CONFIG" \
      "$RESULTS_DIR/**/*.ckpt" "$TRAJ" --cpu --append \
      >> "$GLOG" 2>&1
  STEP=$(tail -1 "$TRAJ" 2>/dev/null | cut -d, -f1)
  ERR=$(tail -1 "$TRAJ" 2>/dev/null | cut -d, -f3)
  # keep the README's live headline in lockstep with the committed CSV
  # (no-op for campaigns other than the one the markers track)
  if [ "$TRAJ" = "artifacts/re4000_r4b_trajectory.csv" ]; then
    python scripts/update_readme_headline.py --csv "$TRAJ" >> "$GLOG" 2>&1 \
      && git add README.md >> "$GLOG" 2>&1 || true
  fi
  git add "$GUARD_DIR" "$TRAJ" >> "$GLOG" 2>&1 \
    && git commit -m "ckpt guard: $(basename "$RESULTS_DIR") step ${STEP:-?} u ${ERR:-?}%" \
         >> "$GLOG" 2>&1 \
    && LAST_COMMITTED="$LATEST"
  sleep "$INTERVAL"
done
