#!/usr/bin/env python
"""Codified h224 escalation trigger for the Re=4000 north-star descent.

VERDICT r4 (Weak #1): the "widen to h224 if the line bends" rule was
qualitative — eyeballed from the trajectory. This makes it a committed
threshold: the descent has FLATTENED iff the per-window error rate has been
below THRESHOLD pts/25k-epochs for WINDOWS consecutive trajectory windows
(guard rows are written every eval cadence, typically 10k steps; each
adjacent row pair is one window, normalized to per-25k).

Usage:  python scripts/escalation_check.py <trajectory.csv> \
            [--threshold 0.05] [--windows 3] [--metric u_pct]

Prints one JSON line {"flat": bool, "rates": [...], ...} on stdout and
exits 1 when flat (escalate to the next capacity rung), 0 while still
descending, 2 when the CSV has too few rows to judge (treated as "keep
going" by callers — never escalate on no evidence).

The queue (scripts/round5_queue.sh) calls this after slot A's deadline;
it can also be run ad hoc against any guard-committed trajectory.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys


def window_rates(rows, metric="u_pct", norm_epochs=25000):
    """Per-adjacent-window descent rates (positive = error decreasing),
    normalized to pts per `norm_epochs` epochs."""
    rates = []
    for a, b in zip(rows[:-1], rows[1:]):
        d_err = float(a[metric]) - float(b[metric])
        d_step = int(b["step"]) - int(a["step"])
        if d_step <= 0:
            continue  # duplicate guard commit / segment seam
        rates.append(d_err / d_step * norm_epochs)
    return rates


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("--threshold", type=float, default=0.05,
                   help="pts/25k-epochs below which a window counts as flat")
    p.add_argument("--windows", type=int, default=3,
                   help="consecutive flat windows required to escalate")
    p.add_argument("--metric", default="u_pct")
    args = p.parse_args(argv)

    try:
        with open(args.csv) as f:
            rows = list(csv.DictReader(f))
    except OSError as e:
        print(json.dumps({"flat": False, "error": str(e)}))
        return 2

    rates = window_rates(rows, metric=args.metric)
    if len(rates) < args.windows:
        print(json.dumps({"flat": False, "rates": rates,
                          "reason": f"need {args.windows} windows, "
                                    f"have {len(rates)}"}))
        return 2

    tail = rates[-args.windows:]
    flat = all(r < args.threshold for r in tail)
    print(json.dumps({
        "flat": flat,
        "rates": [round(r, 4) for r in tail],
        "threshold": args.threshold,
        "windows": args.windows,
        "metric": args.metric,
        "last": {"step": int(rows[-1]["step"]),
                 args.metric: float(rows[-1][args.metric])},
    }))
    return 1 if flat else 0


if __name__ == "__main__":
    raise SystemExit(main())
