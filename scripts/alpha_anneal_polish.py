"""Alpha-annealing L-BFGS experiment: is the EVM viscosity the error floor?

From a converged state, L-BFGS stalls (stationary point of the fixed
objective) while the DNS error sits above target. Two candidate floors:
(a) the artificial eddy viscosity alpha_evm*|e| perturbing the physics —
anneal alpha below the reference's final 0.002; (b) the fixed collocation
set — redraw it. This driver does both, one L-BFGS segment per phase,
evaluating after each, so the contributions separate cleanly.

Usage:
    python scripts/alpha_anneal_polish.py <config.yaml> <ckpt> [--cpu]
Env:  ANNEAL_ALPHAS="0.002,0.001,0.0005,0.0002"  ANNEAL_STEPS=3000
      ANNEAL_RESAMPLE=1 (redraw collocation points each phase)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path, ckpt, cpu=False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(config_path).config
    solver = build_solver(cfg)
    solver.matmul_precision = "highest"
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      sdf_enabled=(cfg.training.sdf_weighting.enabled
                                   and os.environ.get("POLISH_SDF", "1") != "0"),
                      seed=cfg.training.seed)
    solver.attach_dataset(data)  # sampler state rides in ckpt metadata
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.load(ckpt)
    print(f"loaded {ckpt} (step {solver.global_step})", file=sys.stderr)

    eval_fields = data.evaluate_data(cfg.eval_data)
    print("start:", solver.evaluate(*eval_fields), file=sys.stderr)

    alphas = [float(a) for a in
              os.environ.get("ANNEAL_ALPHAS", "0.002,0.001,0.0005,0.0002").split(",")]
    steps = int(os.environ.get("ANNEAL_STEPS", 3000))
    resample = os.environ.get("ANNEAL_RESAMPLE", "0") == "1"

    for ph, alpha in enumerate(alphas):
        solver.set_alpha_evm(alpha)
        if resample:
            solver.set_eq_training_data(X=data.training_data(),
                                        weights=data.sdf_weights)
        else:
            solver.refresh_vis_t()
        solver.train(num_epoch=steps, lr=1.0, optimizer=os.environ.get("POLISH_OPT", "lbfgs"))
        res = solver.evaluate(*eval_fields)
        print(f"alpha={alpha} resample={resample}: {res}", file=sys.stderr)
        out = solver.save(f"model_anneal_ph{ph}_a{alpha}.ckpt", directory="artifacts/anneal")
        print(f"saved {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    sys.exit(main(args[0], args[1], cpu="--cpu" in sys.argv))
