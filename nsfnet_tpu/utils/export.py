"""AOT model export for serving: the solver's prediction function —
params baked in, batch dimension symbolic — serialized to a portable
StableHLO artifact via `jax.export`.

The reference has no serving story: deploying an ev-NSFnet model means
shipping the torch checkpoint plus the full training stack, and test-time
prediction rebuilds the whole solver (ev-NSFnet/test.py:27-99,
pinn_solver.py:280-288). TPU-native serving does better: lower the jitted
predict fn ONCE (shape-polymorphic batch, multi-platform cpu+tpu), ship
one self-contained artifact. The serving process needs only `jax` and the
blob — no model code, no config, no checkpoint format — and the lowering
is frozen, so serving results cannot drift under framework refactors.

Artifact layout: `<path>` holds the serialized `jax.export.Exported`
bytes; `<path>.json` is a human-readable sidecar (architecture,
formulation, Re, jax version, platforms) for inventory tooling.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

SIDECAR_SUFFIX = ".json"


def _predict_fn(solver):
    """Pure (pts[N,2] f32) -> [N,4] f32 (u, v, p, e) with the solver's
    CURRENT params closed over as constants. Mirrors predict()'s contract:
    always exact-fp32 matmuls regardless of the training precision."""
    params = jax.device_get(solver.state.params)
    uvp_apply = solver._uvp_apply()
    if solver.evm:
        params_evm = jax.device_get(solver.state.params_evm)
        evm_apply = solver.net_1.apply
    else:
        params_evm, evm_apply = None, None

    def predict(pts):
        with jax.default_matmul_precision("highest"):
            uvp = uvp_apply(params, pts)
            if evm_apply is not None:
                e = evm_apply(params_evm, pts)[:, 0:1]
            else:
                e = jnp.zeros((pts.shape[0], 1), pts.dtype)
        return jnp.concatenate([uvp, e], axis=1)

    return predict


def _residual_fn(solver):
    """Pure (pts[N,2] f32) -> [N] f32 per-point PDE residual magnitude
    sqrt(eq1^2+eq2^2+eq3^2) under the solver's CURRENT nets and physics
    (EVM effective viscosity included when enabled) — the served
    physics-QC head, same contract as solver.residuals_at()."""
    from nsfnet_tpu.ops.residuals import ev_ns_residuals, ns_residuals

    params = jax.device_get(solver.state.params)
    engine = solver._engine("xla")
    evm = solver.evm
    params_evm = jax.device_get(solver.state.params_evm) if evm else None
    apply_evm = solver.net_1.apply if evm else None
    coord_scale = solver.coord_scale
    re = float(solver.current_re)
    alpha_evm = float(solver.alpha_evm)

    def score(pts):
        with jax.default_matmul_precision("highest"):
            derivs = engine(params, pts)
            if evm:
                e = apply_evm(params_evm, pts)[:, 0:1]
                vis_t = jnp.minimum(20.0 / re, alpha_evm * jnp.abs(e))
                r = ev_ns_residuals(derivs, e, vis_t, re, coord_scale)
            else:
                r = ns_residuals(derivs, re, coord_scale)
        return jnp.sqrt(r.eq1**2 + r.eq2**2 + r.eq3**2)[:, 0]

    return score


def _export(solver, fn, path, platforms, kind, outputs,
            extra_meta=None) -> dict:
    from jax import export as jexport

    (n,) = jexport.symbolic_shape("n")
    spec = jax.ShapeDtypeStruct((n, 2), jnp.float32)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(spec)
    blob = exported.serialize()

    meta = {
        "kind": kind,
        "outputs": outputs,
        "input": "[n, 2] float32 (x, y)",
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "formulation": solver.formulation,
        "backbone": solver.backbone,
        "Re": float(solver.current_re),
        "evm": bool(solver.evm),
        "alpha_evm": float(solver.alpha_evm),
        "coord_scale": float(solver.coord_scale),
        "global_step": int(solver.global_step),
    }
    if extra_meta:
        meta.update(extra_meta)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic, same contract as checkpoint writes
    # sidecar atomically too: a crash mid-write must not leave a valid
    # artifact next to a truncated/corrupt sidecar
    tmp_sc = path + SIDECAR_SUFFIX + ".tmp"
    with open(tmp_sc, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp_sc, path + SIDECAR_SUFFIX)
    return meta


def export_predict(solver, path: str, platforms=("cpu", "tpu"),
                   extra_meta=None) -> dict:
    """Serialize the solver's prediction head to `path` (+ `.json` sidecar).

    `platforms` lists every backend the artifact must serve on; lowering
    for "tpu" does NOT require TPU hardware to be present at export time.
    Returns the sidecar metadata dict.
    """
    return _export(solver, _predict_fn(solver), path, platforms,
                   kind="nsfnet_tpu.predict", outputs=["u", "v", "p", "e"],
                   extra_meta=extra_meta)


def export_residuals(solver, path: str, platforms=("cpu", "tpu"),
                     extra_meta=None) -> dict:
    """Serialize the physics-QC head — per-point PDE residual magnitude at
    arbitrary points — alongside the prediction artifact, so a serving
    deployment can bound the model's equation error on live query points
    without any framework code. The baked vis_t cap uses the solver's
    CURRENT alpha_evm — the CLI restores it from checkpoint metadata so an
    alpha-annealed curriculum exports its final-stage physics."""
    return _export(solver, _residual_fn(solver), path, platforms,
                   kind="nsfnet_tpu.residuals",
                   outputs=["sqrt(eq1^2+eq2^2+eq3^2)"],
                   extra_meta=extra_meta)


def load_predict(path: str):
    """Deserialize an exported artifact into a callable
    (pts[N,2] f32) -> [N,4] f32, any N. No model code required."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    def call(pts):
        pts = jnp.asarray(pts, jnp.float32).reshape(-1, 2)
        return exported.call(pts)

    return call


def main(argv=None):
    """CLI: export a trained checkpoint's prediction head.

    python -m nsfnet_tpu.utils.export --config configs/re5000_production.yaml \
        --ckpt results/.../model_final.ckpt --out artifacts/re5000_predict.hlo
    """
    import argparse

    p = argparse.ArgumentParser(description="Export predict head to StableHLO")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True, help="full-state checkpoint")
    p.add_argument("--out", required=True, help="artifact path")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--residuals", action="store_true",
                   help="also export the physics-QC residual head "
                        "(<out>.residuals)")
    p.add_argument("--alpha-evm", type=float, default=None,
                   help="override the EVM alpha baked into the residual "
                        "head (default: the checkpoint's training-time "
                        "alpha from metadata, falling back to the config)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(args.config).config
    solver = build_solver(cfg)
    # restore template (collocation shapes size the vis_t carry); mirror
    # train.py's wiring exactly — in particular the coordinate transform,
    # or a transform-trained checkpoint would export with coord_scale=1.0
    # baked in (u,v off by the chain-rule factor in the psi head, residual
    # derivative scaling wrong)
    data = CavityData(N_f=cfg.training.N_f,
                      sort_training_points=cfg.training.sort_training_points,
                      sdf_enabled=cfg.training.sdf_weighting.enabled,
                      coord_transform=cfg.training.coordinate_transform,
                      seed=cfg.training.seed)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.set_coordinate_transform(data.coord_scale)
    solver.load(args.ckpt)
    # the residual head's vis_t cap depends on alpha_evm, which the driver
    # normally sets per stage — restore the value the checkpoint actually
    # trained at (load() deliberately leaves it to the caller)
    from nsfnet_tpu.training import checkpoint as ckpt_io

    ckpt_meta = ckpt_io.load_metadata(args.ckpt) or {}
    if args.alpha_evm is not None:
        solver.set_alpha_evm(args.alpha_evm)
        alpha_src = "cli"
    elif "alpha_evm" in ckpt_meta:
        solver.set_alpha_evm(float(ckpt_meta["alpha_evm"]))
        alpha_src = "checkpoint"
    else:
        alpha_src = "config"
    platforms = tuple(args.platforms.split(","))
    extra = {"alpha_evm_source": alpha_src}
    meta = export_predict(solver, args.out, platforms=platforms,
                          extra_meta=extra)
    print(json.dumps(meta))
    if args.residuals:
        print(json.dumps(export_residuals(
            solver, args.out + ".residuals", platforms=platforms,
            extra_meta=extra)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
