"""Parse a campaign log into a per-stage markdown table for VALIDATION.md.

Extracts each stage header (>>> NAME: alpha_evm=... epochs=... lr=...),
the stage's final loss/Re_eff lines, the end-of-stage DNS evaluation
(Error u/v/p), and stall-advance events.

Usage: python scripts/stage_table.py <logfile>
"""

import re
import sys


def main(path):
    stage_re = re.compile(
        r">>> (\S+): alpha_evm=([\d.e-]+) epochs=([\d,]+) lr=([\d.e-]+)")
    err_re = re.compile(
        r"Error u: ([\d.]+) %  v: ([\d.]+) %  p: ([\d.]+) % "
        r"\(gauge-corrected ([\d.]+) %")
    loss_re = re.compile(r"loss: total=([\d.e-]+) eq=([\d.e-]+)")
    reeff_re = re.compile(r"Re_eff=([\d.]+)")
    stall_re = re.compile(r"stalled at epoch (\d+)/(\d+)")

    stages = []
    cur = None
    for line in open(path):
        m = stage_re.search(line)
        if m:
            cur = {"name": m.group(1), "alpha": m.group(2),
                   "epochs": m.group(3), "lr": m.group(4),
                   "stalled": "", "loss": "", "re_eff": "", "err": None}
            stages.append(cur)
            continue
        if cur is None:
            continue
        m = loss_re.search(line)
        if m:
            cur["loss"] = m.group(1)
        m = reeff_re.search(line)
        if m:
            cur["re_eff"] = m.group(1)
        m = stall_re.search(line)
        if m:
            cur["stalled"] = f"advanced at {int(m.group(1)):,}/{int(m.group(2)):,}"
        m = err_re.search(line)
        if m:
            cur["err"] = m.groups()

    print("| stage | alpha | lr | epochs | final total loss | Re_eff | "
          "u err % | v err % | p err % (gauge) | stall advance |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for s in stages:
        e = s["err"] or ("-", "-", "-", "-")
        print(f"| {s['name']} | {s['alpha']} | {s['lr']} | {s['epochs']} | "
              f"{s['loss']} | {s['re_eff']} | {e[0]} | {e[1]} | "
              f"{e[2]} ({e[3]}) | {s['stalled'] or '-'} |")


if __name__ == "__main__":
    main(sys.argv[1])
