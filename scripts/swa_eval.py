"""SWA-style parameter averaging across polish-round checkpoints.

Each resampled polish round ends at a slightly different point around the
same attractor (per-draw fp32 loss floor); averaging the weights cancels
part of that sampling noise without any device time. Evaluates each
member and the average vs the DNS grid, and (optionally) writes the
averaged state as a new checkpoint seed for further polish.

No reference counterpart (the reference keeps single checkpoints).

Usage: python scripts/swa_eval.py <config.yaml> <ckpt1> <ckpt2> ...
       [--save out.ckpt] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    cpu = "--cpu" in argv
    save_out = None
    if "--save" in argv:
        i = argv.index("--save")
        save_out = argv[i + 1]
        del argv[i:i + 2]
    argv = [a for a in argv if a != "--cpu"]
    config_path, ckpts = argv[0], argv[1:]

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(config_path).config
    solver = build_solver(cfg)
    # small N_f: evaluation only touches the nets, not the collocation batch
    data = CavityData(N_f=1024, sort_training_points=False,
                      sdf_enabled=False, seed=cfg.training.seed)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data())
    eval_fields = data.evaluate_data(cfg.eval_data)

    members, members_evm = [], []
    for c in ckpts:
        solver.load(c)
        members.append(solver.state.params)
        members_evm.append(solver.state.params_evm)
        res = solver.evaluate(*eval_fields)
        print(f"member {os.path.basename(c)}: u={res['u']:.4f} v={res['v']:.4f}",
              file=sys.stderr)

    n = float(len(members))
    avg = jax.tree.map(lambda *xs: sum(xs) / n, *members)
    avg_evm = (jax.tree.map(lambda *xs: sum(xs) / n, *members_evm)
               if members_evm[0] is not None else None)
    solver.state = solver.state._replace(params=avg, params_evm=avg_evm)
    res = solver.evaluate(*eval_fields)
    print(f"SWA({len(members)}): u={res['u']:.4f} v={res['v']:.4f} "
          f"p_gauge={res['p_gauge']:.3f}", file=sys.stderr)
    if save_out:
        solver.refresh_vis_t()
        out = solver.save(os.path.basename(save_out),
                          directory=os.path.dirname(save_out) or ".")
        print(f"saved {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
