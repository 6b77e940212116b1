"""Sweep the Pallas kernel's forward/backward tile sizes at a given matmul
precision and report pts/s per combo (VERDICT r2 next #4: tune the
backward tile toward the fp32 >=50x bar).

Each combo runs in a SUBPROCESS (TILE is an import-time constant and each
tile shape is a separate TPU compile). Run only when no other device
process is active.

Usage: python scripts/pallas_tile_sweep.py [--precision highest]
           [--tiles 512,1024] [--bwd 64,128,256] [--nf 120000] [--steps 300]
"""

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join({repo!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from nsfnet_tpu.data.cavity import CavityData
from nsfnet_tpu.training.solver import PINNSolver

n_f, steps, prec = {nf}, {steps}, {prec!r}
solver = PINNSolver(Re=2000, layers=6, layers_1=4, hidden_size=80,
                    hidden_size_1=40, N_f=n_f, alpha_evm=0.05, bc_weight=10,
                    eq_weight=1, log_interval=10**9, checkpoint_freq=10**9,
                    seed=0, matmul_precision=prec, engine="pallas")
data = CavityData(N_f=n_f, sort_training_points=False, sdf_enabled=True, seed=0)
solver.set_boundary_data(X=data.boundary_data())
solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
solver._ensure_ready()
sc = solver._stage_scalars(1e-3)
pts_per_step = n_f + 4 * 513
solver.state, m = solver._runner(solver.state, solver._batch, sc, n_steps=steps)
jax.block_until_ready(m.total)
dt = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    solver.state, m = solver._runner(solver.state, solver._batch, sc, n_steps=steps)
    jax.block_until_ready(m.total)
    dt = min(dt, time.perf_counter() - t0)
assert np.isfinite(float(m.total))
print("RESULT " + json.dumps({{"pts_per_s": steps * pts_per_step / dt}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--tiles", default="512")
    ap.add_argument("--bwd", default="auto,64,128,256")
    ap.add_argument("--nf", type=int, default=120000)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lane-pad", default="0",
                    help="comma list of NSFNET_PALLAS_LANE_PAD values "
                         "(0=off, 128=pad hidden dims to full MXU lanes — "
                         "the fp32 occupancy experiment, VERDICT r2 weak #2)")
    args = ap.parse_args()

    rows = []
    for tile in args.tiles.split(","):
      for lane in args.lane_pad.split(","):
        for bwd in args.bwd.split(","):
            env = dict(os.environ)
            env["NSFNET_PALLAS_TILE"] = tile
            env["NSFNET_PALLAS_LANE_PAD"] = lane
            if bwd != "auto":
                env["NSFNET_PALLAS_BWD_TILE"] = bwd
            else:
                env.pop("NSFNET_PALLAS_BWD_TILE", None)
            code = _CHILD.format(repo=_REPO, nf=args.nf, steps=args.steps,
                                 prec=args.precision)
            pts, err = None, None
            try:
                r = subprocess.run([sys.executable, "-c", code], env=env,
                                   capture_output=True, text=True, timeout=1800)
                for line in r.stdout.splitlines():
                    if line.startswith("RESULT "):
                        pts = json.loads(line[len("RESULT "):])["pts_per_s"]
                if pts is None:
                    err = r.stderr[-500:]
            except subprocess.TimeoutExpired:
                # one wedged TPU combo must not abort the sweep — record an
                # error row and keep going
                err = "timeout after 1800s (hung device dispatch?)"
            row = {"tile": tile, "bwd_tile": bwd, "lane_pad": lane,
                   "pts_per_s": round(pts, 1) if pts else None,
                   "vs_baseline": round(pts / 142000.0, 2) if pts else None,
                   "error": err}
            rows.append(row)
            print(json.dumps(row), flush=True)
    best = max((r for r in rows if r["pts_per_s"]), key=lambda r: r["pts_per_s"],
               default=None)
    print(f"# best: {best}", file=sys.stderr)


if __name__ == "__main__":
    main()
