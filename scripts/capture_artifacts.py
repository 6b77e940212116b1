"""Capture post-training artifacts: copy the newest checkpoint into
artifacts/, render streamplot + field heatmaps, and print final DNS errors.

Usage: python scripts/capture_artifacts.py <config.yaml> <ckpt_glob> <out_dir>
"""

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path, ckpt_glob, out_dir):
    import jax

    if os.environ.get("NSFNET_CPU"):  # render while the TPU is busy training
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver
    from nsfnet_tpu.utils.visualization import field_heatmaps, streamplot_cavity

    cfg = ConfigManager.from_file(config_path).config
    ckpts = sorted(glob.glob(ckpt_glob, recursive=True), key=os.path.getmtime)
    assert ckpts, f"no checkpoints match {ckpt_glob}"
    latest = ckpts[-1]
    os.makedirs(out_dir, exist_ok=True)

    solver = build_solver(cfg)
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      sdf_enabled=cfg.training.sdf_weighting.enabled,
                      seed=cfg.training.seed)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.load(latest)
    print(f"loaded {latest} (step {solver.global_step})")

    shutil.copy(latest, os.path.join(out_dir, "final_state.ckpt"))
    if os.path.exists(latest + ".json"):
        shutil.copy(latest + ".json", os.path.join(out_dir, "final_state.ckpt.json"))

    streamplot_cavity(solver, n=100, out_path=os.path.join(out_dir, "cavity.png"),
                      title=f"Re={cfg.physics.Re:g} after {solver.global_step:,} steps")
    field_heatmaps(solver, n=257, out_path=os.path.join(out_dir, "fields.png"))
    if solver.backbone == "kan":
        from nsfnet_tpu.utils.visualization import kan_plot

        kan_plot(solver.net, solver.state.params,
                 out_path=os.path.join(out_dir, "kan_splines.png"))
    if solver.formulation == "streamfunction":
        from nsfnet_tpu.utils.visualization import psi_contours

        psi_contours(solver, out_path=os.path.join(out_dir, "psi.png"),
                     title=f"psi, Re={cfg.physics.Re:g}")

    if cfg.eval_data and os.path.exists(cfg.eval_data):
        from nsfnet_tpu.utils.visualization import centerline_profiles

        eval_fields = data.evaluate_data(cfg.eval_data)
        centerline_profiles(
            solver, eval_fields,
            out_path=os.path.join(out_dir, "profiles.png"),
            title=f"Re={cfg.physics.Re:g} centerline profiles vs DNS")
        errs = solver.evaluate(*eval_fields)
        print("final errors:", errs)
    print(f"artifacts in {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
