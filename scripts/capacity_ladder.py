"""Autonomous capacity-ladder campaign: widen -> resampled-LM rounds -> widen.

Runs the round-2 accuracy recipe (VALIDATION.md "capacity-ladder polish")
unattended: at each rung, the trained net is widened function-preservingly
(models/mlp.py widen_mlp_params) and polished with resampled LM rounds
until the rung's round budget is spent or the per-round gain stalls, then
the next rung starts. Stops on a target error or a wall-clock budget.

Usage:
  python scripts/capacity_ladder.py <config.yaml> <ckpt> \
      --rungs 160:20,224:20 [--steps 150] [--target 3.95] \
      [--budget-min 170] [--nf 80000] [--micro 1] [--cpu]

config.yaml's network.hidden_size must match <ckpt>'s architecture.
Checkpoints land in artifacts/ladder/ as model_h{H}_r{N}.ckpt.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("ckpt")
    ap.add_argument("--rungs", default="160:20",
                    help="comma list of hidden:max_rounds (in ladder order)")
    ap.add_argument("--steps", type=int, default=150, help="LM steps per round")
    ap.add_argument("--target", type=float, default=0.0,
                    help="stop when mean(u,v) rel-L2 %% falls below this")
    ap.add_argument("--budget-min", type=float, default=1e9,
                    help="wall-clock budget in minutes")
    ap.add_argument("--nf", type=int, default=0, help="override training N_f")
    ap.add_argument("--micro", type=int, default=1, help="lm_microbatches")
    ap.add_argument("--fixed-points", action="store_true",
                    help="draw the collocation set ONCE and keep it for every "
                         "LM round (no per-round redraw). Probes whether the "
                         "redraw — not Gauss-Newton itself — is what "
                         "random-walks at Re>=4000 (VALIDATION.md round-4 "
                         "ladder postmortem).")
    ap.add_argument("--stall", type=float, default=0.005,
                    help="advance to next rung when the mean per-round gain "
                         "over the last 3 rounds drops below this (%%)")
    ap.add_argument("--outdir", default="artifacts/ladder",
                    help="checkpoint/trajectory output directory (separate "
                         "per campaign: re4000/re5000 ladders must not "
                         "overwrite each other's model_h{H}_r{N}.ckpt)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.models.mlp import widen_mlp_params
    from nsfnet_tpu.train import build_solver

    t0 = time.time()
    deadline = t0 + args.budget_min * 60.0

    cfg = ConfigManager.from_file(args.config).config
    if args.nf:
        cfg.training.N_f = args.nf
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      sdf_enabled=False, seed=cfg.training.seed)

    solver = build_solver(cfg)
    solver.matmul_precision = "highest"
    solver.lm_microbatches = max(1, args.micro)
    solver.attach_dataset(data)  # sampler state rides in ckpt metadata
    solver.set_boundary_data(X=data.boundary_data())
    X0 = data.training_data()  # setup draw; the only one in --fixed-points mode
    solver.set_eq_training_data(X=X0)
    solver.load(args.ckpt)
    eval_fields = data.evaluate_data(cfg.eval_data)
    alpha = float(cfg.training.training_stages[-1].alpha)
    solver.set_alpha_evm(alpha)
    res = solver.evaluate(*eval_fields)
    best = 0.5 * (res["u"] + res["v"])
    print(f"start h={cfg.network.hidden_size}: mean_uv={best:.4f}%",
          file=sys.stderr)
    os.makedirs(args.outdir, exist_ok=True)
    traj_path = os.path.join(args.outdir, "trajectory.csv")
    if not os.path.exists(traj_path):
        with open(traj_path, "w") as fh:
            fh.write("hidden,round,u_err,v_err,mean_uv,best,elapsed_min\n")

    def log_traj(hidden, rnd, res, mean_uv, best):
        with open(traj_path, "a") as fh:
            fh.write(f"{hidden},{rnd},{res['u']:.4f},{res['v']:.4f},"
                     f"{mean_uv:.4f},{best:.4f},{(time.time()-t0)/60:.1f}\n")

    log_traj(cfg.network.hidden_size, 0, res, best, best)

    rungs = [(int(h), int(r)) for h, r in
             (tok.split(":") for tok in args.rungs.split(","))]

    for hidden, max_rounds in rungs:
        if time.time() > deadline:
            break
        if hidden != cfg.network.hidden_size:
            wide = widen_mlp_params(solver.state.params, hidden,
                                    jax.random.PRNGKey(hidden))
            evm_params = solver.state.params_evm
            step0, old = solver.global_step, solver
            cfg.network.hidden_size = hidden
            solver = build_solver(cfg)
            solver.matmul_precision = "highest"
            solver.lm_microbatches = max(1, args.micro)
            solver.set_boundary_data(X=data.boundary_data())
            solver.set_eq_training_data(
                X=X0 if args.fixed_points else data.training_data())
            solver.state = solver.state._replace(params=wide,
                                                 params_evm=evm_params)
            solver.global_step = step0
            solver.refresh_vis_t()
            solver.set_alpha_evm(alpha)
            del old
            print(f"== rung h={hidden} installed (function-preserving)",
                  file=sys.stderr)
        gains = []
        for r in range(max_rounds):
            if time.time() > deadline:
                print("wall-clock budget reached", file=sys.stderr)
                break
            if not args.fixed_points:
                solver.set_eq_training_data(X=data.training_data())
            solver.train(num_epoch=args.steps, lr=1.0, optimizer="lm")
            res = solver.evaluate(*eval_fields)
            mean_uv = 0.5 * (res["u"] + res["v"])
            gains.append(best - mean_uv)
            best = min(best, mean_uv)
            log_traj(hidden, r + 1, res, mean_uv, best)
            out = solver.save(f"model_h{hidden}_r{r+1}.ckpt",
                              directory=args.outdir)
            print(f"h={hidden} round {r+1}: mean_uv={mean_uv:.4f}% "
                  f"(best {best:.4f}%) saved {out}", file=sys.stderr)
            if args.target and best < args.target:
                print(f"TARGET REACHED: {best:.4f}% < {args.target}%",
                      file=sys.stderr)
                return 0
            if len(gains) >= 3 and sum(gains[-3:]) / 3.0 < args.stall:
                print(f"rung h={hidden} stalled "
                      f"(mean gain {sum(gains[-3:])/3.0:.4f}%/round)",
                      file=sys.stderr)
                break
    print(f"ladder done: best mean_uv={best:.4f}% "
          f"in {(time.time()-t0)/60:.1f} min", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
