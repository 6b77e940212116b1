"""Spatial error diagnostic: where does the prediction diverge from DNS?

Loads a checkpoint on CPU, predicts the 257x257 field, and reports the
u/v error broken down by region (near-wall bands vs core) plus the
locations of the worst absolute errors. Distinguishes a boundary-layer
resolution floor (error concentrated in thin near-wall bands -> denser /
adaptive collocation helps) from a basin/branch offset (smooth global
error -> more/other optimization helps).

Usage: python scripts/error_map.py <config.yaml> <ckpt>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path, ckpt):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(config_path).config
    solver = build_solver(cfg)
    data = CavityData(N_f=1000, sort_training_points=False,
                      sdf_enabled=False, seed=0)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data())
    solver.load(ckpt)

    x, y, u, v, p = data.evaluate_data(cfg.eval_data)
    u_p, v_p, p_p, _e = solver.predict((x, y))
    u_p, v_p = np.asarray(u_p), np.asarray(v_p)

    du, dv = np.abs(u_p - u), np.abs(v_p - v)
    err = np.sqrt(du**2 + dv**2).ravel()
    xr, yr = x.ravel(), y.ravel()
    # generation frame may be centered [-1,1]; normalize to [0,1]
    lo, span = xr.min(), xr.max() - xr.min()
    xn, yn = (xr - lo) / span, (yr - yr.min()) / span
    d_wall = np.minimum.reduce([xn, 1 - xn, yn, 1 - yn])

    norm = np.sqrt(np.mean(u**2 + v**2))
    print(f"rms velocity err: {np.sqrt(np.mean(err**2)):.5f} "
          f"(rel {100*np.sqrt(np.mean(err**2))/norm:.2f}%)", file=sys.stderr)
    for lab, m in [("wall band d<0.05", d_wall < 0.05),
                   ("band 0.05-0.15", (d_wall >= 0.05) & (d_wall < 0.15)),
                   ("core d>0.15", d_wall >= 0.15)]:
        e = err[m]
        print(f"{lab:18s}: n={m.sum():6d} rms={np.sqrt(np.mean(e**2)):.5f} "
              f"max={e.max():.4f} share_of_sq_err="
              f"{100*np.sum(e**2)/np.sum(err**2):.1f}%", file=sys.stderr)
    worst = np.argsort(err)[-8:][::-1]
    print("worst points (x, y, |err|):", file=sys.stderr)
    for i in worst:
        print(f"  ({xn[i]:.3f}, {yn[i]:.3f})  {err[i]:.4f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
