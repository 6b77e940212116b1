"""Capacity probe: widen the trained main net (function-preserving) and LM.

If the fp32-LM error plateau is a MODEL-capacity floor, adding hidden
units (Net2Net zero-outgoing widening, models/mlp.py widen_mlp_params)
gives the optimizer new directions and the error should move; if it is a
precision/objective floor, widening changes nothing. Either result
decides the next campaign.

Usage: python scripts/widen_polish.py <config.yaml> <ckpt> <new_hidden>
       [n_rounds] [steps_per_round] [--cpu]
Env:   WIDEN_RESAMPLE=1 (default: redraw collocation each round),
       POLISH_SDF=0 to drop SDF weighting from the polish objective.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path, ckpt, new_hidden, n_rounds=4, steps=150, cpu=False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    import numpy as np

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.models.mlp import widen_mlp_params
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(config_path).config
    sdf_on = (cfg.training.sdf_weighting.enabled
              and os.environ.get("POLISH_SDF", "1") != "0")
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      sdf_enabled=sdf_on, seed=cfg.training.seed)

    # donor solver at the checkpoint's architecture
    donor = build_solver(cfg)
    donor.set_boundary_data(X=data.boundary_data())
    donor.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    donor.load(ckpt)
    print(f"loaded {ckpt} (step {donor.global_step})", file=sys.stderr)
    eval_fields = data.evaluate_data(cfg.eval_data)
    print("donor:", donor.evaluate(*eval_fields), file=sys.stderr)

    wide_params = widen_mlp_params(donor.state.params, int(new_hidden),
                                   jax.random.PRNGKey(17))
    evm_params = donor.state.params_evm
    step0 = donor.global_step
    del donor

    cfg.network.hidden_size = int(new_hidden)
    solver = build_solver(cfg)
    solver.matmul_precision = "highest"
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.state = solver.state._replace(params=wide_params,
                                         params_evm=evm_params)
    solver.global_step = step0
    solver.refresh_vis_t()
    solver.set_alpha_evm(cfg.training.training_stages[-1].alpha)
    print("widened (must equal donor):", solver.evaluate(*eval_fields),
          file=sys.stderr)

    resample = os.environ.get("WIDEN_RESAMPLE", "1") == "1"
    for r in range(int(n_rounds)):
        if resample and r > 0:
            solver.set_eq_training_data(X=data.training_data(),
                                        weights=data.sdf_weights)
        else:
            solver.refresh_vis_t()
        solver.train(num_epoch=int(steps), lr=1.0, optimizer="lm")
        print(f"round {r+1}:", solver.evaluate(*eval_fields), file=sys.stderr)
        out = solver.save(f"model_widened_h{new_hidden}_r{r+1}.ckpt",
                          directory="artifacts/widen")
        print(f"saved {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if x != "--cpu"]
    sys.exit(main(a[0], a[1], int(a[2]),
                  int(a[3]) if len(a) > 3 else 4,
                  int(a[4]) if len(a) > 4 else 150,
                  cpu="--cpu" in sys.argv))
