#!/usr/bin/env python
"""Rewrite the README's live Re=4000 headline from the guarded trajectory.

VERDICT r4 (Weak #2): hand-updated prose numbers drift behind the
guard-committed trajectory CSV within one guard cycle. This makes the CSV
the single source of truth: the text between the RE4000_LIVE markers in
README.md is regenerated from the newest CSV row; the checkpoint guard
calls this after each trajectory append so every guard commit carries a
current headline.

Usage: python scripts/update_readme_headline.py \
           [--csv artifacts/re4000_r4b_trajectory.csv] [--readme README.md]

Exit 0 on update or no-change, 2 when markers or CSV are missing (callers
treat that as a skip, never a campaign failure).
"""

from __future__ import annotations

import argparse
import csv
import re
import sys

BEGIN = "<!-- RE4000_LIVE -->"
END = "<!-- /RE4000_LIVE -->"


def render(row: dict) -> str:
    step = int(row["step"])
    return (f"**u {float(row['u_pct']):.3f}% / v {float(row['v_pct']):.3f}%**"
            f" at replay step {step:,}\n"
            "  (guard commit of `artifacts/re4000_r4b_trajectory.csv`)")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default="artifacts/re4000_r4b_trajectory.csv")
    p.add_argument("--readme", default="README.md")
    args = p.parse_args(argv)

    try:
        with open(args.csv) as f:
            rows = list(csv.DictReader(f))
    except OSError:
        print(f"[headline] no CSV at {args.csv}; skip", file=sys.stderr)
        return 2
    if not rows:
        print("[headline] empty CSV; skip", file=sys.stderr)
        return 2

    with open(args.readme) as f:
        text = f.read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not pat.search(text):
        print(f"[headline] markers missing in {args.readme}; skip",
              file=sys.stderr)
        return 2
    new = pat.sub(BEGIN + render(rows[-1]) + END, text)
    if new != text:
        with open(args.readme, "w") as f:
            f.write(new)
        print(f"[headline] README updated: step {rows[-1]['step']} "
              f"u {rows[-1]['u_pct']}%", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
