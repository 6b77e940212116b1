"""Full-batch L-BFGS polish of a trained checkpoint + evaluation.

The north-star schedule is Adam -> L-BFGS polish; the framework's L-BFGS
(jitted optax.lbfgs + zoom strong-Wolfe, training/lbfgs.py) runs on the
full collocation batch with the vis_t carry frozen. This driver loads a
full-state checkpoint, runs N polish steps, evaluates against the config's
DNS field, and saves the polished state.

Usage:
    python scripts/lbfgs_polish.py <config.yaml> <ckpt> [n_steps] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path, ckpt, n_steps=200, cpu=False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(config_path).config
    solver = build_solver(cfg)
    # L-BFGS line search needs exact arithmetic: force fp32 matmuls
    solver.matmul_precision = "highest"
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      sdf_enabled=(cfg.training.sdf_weighting.enabled
                                   and os.environ.get("POLISH_SDF", "1") != "0"),
                      seed=cfg.training.seed)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.load(ckpt)
    print(f"loaded {ckpt} (step {solver.global_step})", file=sys.stderr)

    eval_fields = (data.evaluate_data(cfg.eval_data)
                   if cfg.eval_data and os.path.exists(cfg.eval_data) else None)
    if eval_fields:
        print("before polish:", solver.evaluate(*eval_fields), file=sys.stderr)
    solver.set_alpha_evm(cfg.training.training_stages[-1].alpha)
    # Segmented polish: the vis_t carry is frozen inside an L-BFGS stage
    # (stationary objective for the line search) — re-anchor it to the
    # updated EVM net between segments, evaluating + saving each time.
    seg = int(os.environ.get("POLISH_SEG", 5000))
    opt = os.environ.get("POLISH_OPT", "lbfgs")  # lbfgs | lm
    done = 0
    while done < int(n_steps):
        n = min(seg, int(n_steps) - done)
        solver.train(num_epoch=n, lr=1.0, optimizer=opt)
        done += n
        solver.refresh_vis_t()
        if eval_fields:
            print(f"after {done} polish steps:",
                  solver.evaluate(*eval_fields), file=sys.stderr)
        # save OUTSIDE the config's checkpoint_dir: an unattended-run
        # watchdog resumes from the newest ckpt there and must never pick
        # up a polish experiment's state
        out = solver.save(f"model_polish_{opt}_{done}.ckpt",
                          directory="artifacts/lbfgs")
        print(f"saved {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    sys.exit(main(args[0], args[1],
                  int(args[2]) if len(args) > 2 else 200,
                  cpu="--cpu" in sys.argv))
