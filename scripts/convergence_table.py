"""Evaluate every stored checkpoint against the config's DNS field and
write a convergence table (CSV + markdown) — the measured-at-fp32 version
of the trajectory the training log reports at stage boundaries.

Usage:
    python scripts/convergence_table.py <config.yaml> <ckpt_glob> <out_csv> \
        [--cpu] [--append]

--append: keep rows already in <out_csv> and evaluate only checkpoints whose
path is not yet listed — the cheap way to poll a live campaign's results dir
from the CPU while the chip trains.
"""

import csv
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path, ckpt_glob, out_csv, cpu=False, append=False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(config_path).config
    solver = build_solver(cfg)
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      sdf_enabled=cfg.training.sdf_weighting.enabled,
                      seed=cfg.training.seed)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    fields = data.evaluate_data(cfg.eval_data)

    paths = sorted(glob.glob(ckpt_glob, recursive=True))
    rows = []
    if append and os.path.exists(out_csv):
        with open(out_csv) as f:
            rows = [dict(r) for r in csv.DictReader(f)]
        for r in rows:
            r["step"] = int(r["step"])
        done = {r["ckpt"] for r in rows}
        paths = [p for p in paths if p not in done]
    for path in paths:
        solver.load(path)
        e = solver.evaluate(*fields)
        rows.append({"step": solver.global_step, "ckpt": path,
                     "u_pct": round(e["u"], 3), "v_pct": round(e["v"], 3),
                     "p_pct": round(e["p"], 3),
                     "p_gauge_pct": round(e["p_gauge"], 3)})
    rows.sort(key=lambda r: r["step"])
    os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv} ({len(rows)} checkpoints)", file=sys.stderr)
    for r in rows:
        print(f"| {r['step']:,} | {r['u_pct']} | {r['v_pct']} | "
              f"{r['p_gauge_pct']} |", file=sys.stderr)
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(args[0], args[1], args[2], cpu="--cpu" in sys.argv,
                  append="--append" in sys.argv))
