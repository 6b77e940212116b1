"""fp64 LM probe: is fp32 arithmetic the optimization floor?

Loads a TPU-converged checkpoint on CPU with x64 enabled, casts params
(and the frozen vis_t carry) to fp64, and runs Levenberg-Marquardt on the
fp64 objective. If the loss descends well below the fp32 plateau, the
plateau is a precision floor, not a model-capacity floor — and CPU-fp64
polish is a valid (if slow) accuracy path that runs in parallel with TPU
work.

Usage: python scripts/lm_fp64_probe.py <config.yaml> <ckpt> [n_steps] [cg_iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path, ckpt, n_steps=30, cg_iters=30):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver
    from nsfnet_tpu.training.lm import run_lm
    from nsfnet_tpu.training.step import make_residual_fn

    cfg = ConfigManager.from_file(config_path).config
    solver = build_solver(cfg)
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      sdf_enabled=cfg.training.sdf_weighting.enabled,
                      seed=cfg.training.seed)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.load(ckpt)
    solver.set_alpha_evm(cfg.training.training_stages[-1].alpha)
    solver._ensure_ready()
    print(f"loaded {ckpt} (step {solver.global_step})", file=sys.stderr)

    eval_fields = data.evaluate_data(cfg.eval_data)
    print("start:", solver.evaluate(*eval_fields), file=sys.stderr)

    to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)
    batch64 = to64(solver._batch)
    vtm64 = to64(solver.state.vis_t_minus)
    sc64 = to64(solver._stage_scalars(1.0))
    params64 = to64((solver.state.params, solver.state.params_evm))

    residual = make_residual_fn(
        engine=solver._engine("xla"), apply_main=solver.net.apply,
        apply_evm=(solver.net_1.apply if solver.evm else None),
        coord_scale=solver.coord_scale,
        alpha_e=solver.alpha_e, alpha_s=solver.alpha_s,
        entropy_weight=solver.entropy_residual_weight, evm=solver.evm)

    def res(params_all):
        return residual(params_all, batch64, vtm64, sc64)

    r0 = res(params64)
    print(f"fp64 loss at fp32 optimum: {float(r0 @ r0):.6e}", file=sys.stderr)

    def progress(done, loss, lam):
        print(f"[LM64] {done}/{n_steps} loss={loss:.6e} lam={lam:.1e}",
              file=sys.stderr, flush=True)

    (p64, e64), hist, _ = run_lm(res, params64, n_steps=int(n_steps),
                                 cg_iters=int(cg_iters), max_chunk=1,
                                 progress=progress)

    # install back (solver state is fp32; cast down for evaluation)
    to32 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    solver.state = solver.state._replace(params=to32(p64), params_evm=to32(e64))
    print("after fp64 LM:", solver.evaluate(*eval_fields), file=sys.stderr)
    out = solver.save(f"model_lm64_{int(n_steps)}.ckpt", directory="artifacts/lm64")
    print(f"saved {out}", file=sys.stderr)
    np.save("artifacts/lm64/history.npy", np.asarray(hist))
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    sys.exit(main(a[0], a[1],
                  int(a[2]) if len(a) > 2 else 30,
                  int(a[3]) if len(a) > 3 else 30))
