"""Residual-based adaptive resampling (RAR) polish rounds.

Each round draws a fresh Latin-Hypercube candidate pool POOL_MULT x N_f,
scores it with the current nets' PDE residual magnitude
(solver.residuals_at), keeps the worst TOP_FRAC x N_f points, fills the
rest with a uniform fresh draw, and runs an LM (Gauss-Newton-CG) polish
segment on the mixed set. Concentrates collocation where the PDE is
violated (corner eddies, boundary layers) instead of re-descending the
same uniform-draw loss floor.

No reference counterpart: ev-NSFnet trains ONE fixed LHS draw for the
entire 3M-epoch curriculum (ev-NSFnet/pinn_solver.py:160-184).

Usage: python scripts/rar_polish.py <config.yaml> <ckpt> [rounds] [steps] [--cpu]
Env:   POOL_MULT (4), TOP_FRAC (0.5), POLISH_OPT (lm), POLISH_ALPHA (stage alpha)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path, ckpt, rounds=6, steps=150, cpu=False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    import numpy as np

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(config_path).config
    solver = build_solver(cfg)
    solver.matmul_precision = "highest"
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      sdf_enabled=False, seed=cfg.training.seed)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data())
    solver.load(ckpt)
    print(f"loaded {ckpt} (step {solver.global_step})", file=sys.stderr)
    eval_fields = data.evaluate_data(cfg.eval_data)
    alpha = float(os.environ.get(
        "POLISH_ALPHA", cfg.training.training_stages[-1].alpha))
    solver.set_alpha_evm(alpha)
    print("start:", solver.evaluate(*eval_fields), file=sys.stderr)

    n_f = cfg.training.N_f
    pool_mult = int(os.environ.get("POOL_MULT", "4"))
    top_frac = float(os.environ.get("TOP_FRAC", "0.5"))
    opt = os.environ.get("POLISH_OPT", "lm")
    n_top = int(top_frac * n_f)
    pool_data = CavityData(N_f=pool_mult * n_f, sort_training_points=False,
                           sdf_enabled=False, seed=cfg.training.seed + 101)
    pool_data.boundary_data()

    for r in range(int(rounds)):
        px, py = pool_data.training_data()
        score = solver.residuals_at(px, py)
        top = np.argsort(score)[-n_top:]
        ux, uy = data.training_data()  # uniform refill
        x_f = np.concatenate([px[top], ux[: n_f - n_top]])
        y_f = np.concatenate([py[top], uy[: n_f - n_top]])
        solver.set_eq_training_data(X=(x_f, y_f))
        print(f"round {r+1}: pool residual mean={score.mean():.3e} "
              f"p50={np.percentile(score, 50):.3e} "
              f"p99={np.percentile(score, 99):.3e} "
              f"kept worst {n_top}", file=sys.stderr)
        solver.train(num_epoch=int(steps), lr=1.0, optimizer=opt)
        res = solver.evaluate(*eval_fields)
        print(f"round {r+1}:", res, file=sys.stderr)
        out = solver.save(f"model_rar_r{r+1}.ckpt", directory="artifacts/rar")
        print(f"saved {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if x != "--cpu"]
    sys.exit(main(a[0], a[1],
                  int(a[2]) if len(a) > 2 else 6,
                  int(a[3]) if len(a) > 3 else 150,
                  cpu="--cpu" in sys.argv))
