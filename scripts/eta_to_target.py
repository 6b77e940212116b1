#!/usr/bin/env python
"""ETA of a descending guarded trajectory to a target error.

Fits the recent per-window descent rate (same windows as
scripts/escalation_check.py) and extrapolates to --target, reporting the
step and wall-clock at the measured steps/s. Used at campaign decision
points (extend vs escalate vs stop) and in VALIDATION writeups.

Usage: python scripts/eta_to_target.py artifacts/re4000_r4b_trajectory.csv \
           [--target 4.0] [--metric u_pct] [--windows 4] [--steps-per-sec 45.5]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from escalation_check import window_rates  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("--target", type=float, default=4.0)
    p.add_argument("--metric", default="u_pct")
    p.add_argument("--windows", type=int, default=4,
                   help="recent windows averaged for the rate")
    p.add_argument("--steps-per-sec", type=float, default=0.0,
                   help="optional: convert steps to wall-clock hours")
    args = p.parse_args(argv)

    with open(args.csv) as f:
        rows = list(csv.DictReader(f))
    if len(rows) < 2:
        print(json.dumps({"error": "need >= 2 rows"}))
        return 2
    rates = window_rates(rows, metric=args.metric)[-args.windows:]
    rate = sum(rates) / len(rates)  # pts per 25k epochs
    last_step = int(rows[-1]["step"])
    last_err = float(rows[-1][args.metric])
    out = {
        "last": {"step": last_step, args.metric: last_err},
        "rate_per_25k": round(rate, 4),
        "target": args.target,
    }
    if last_err <= args.target:
        out["eta_steps"] = 0
    elif rate <= 0:
        out["eta_steps"] = None  # not descending
    else:
        need = (last_err - args.target) / rate * 25000
        out["eta_steps"] = int(need)
        out["eta_step_at_target"] = int(last_step + need)
        if args.steps_per_sec > 0:
            out["eta_hours"] = round(need / args.steps_per_sec / 3600, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
