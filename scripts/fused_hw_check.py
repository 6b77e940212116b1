"""Validate + measure the fused residual-loss kernel on real TPU hardware.

The fused kernel pair (ops/pallas_residual.py) is interpret-validated by
the CPU suite (tests/test_pallas_residual.py); this script proves the
Mosaic lowering on a real chip and measures the win, in two phases:

1. VALIDATE (small N_f): run the same training chunk with the fused loss
   ON and OFF at exact-fp32 matmuls; the metrics after 10 steps must agree
   to reduction-order noise. On success, write artifacts/fused_hw_ok.json
   — the marker that flips the solver's on-TPU default to fused
   (solver._fused_loss_enabled); unattended campaigns stay on the proven
   stream engine until this exists.
2. MEASURE (flagship size, N_f=120k, 1000-step chunks, best-of-3): fused
   vs stream at highest and high — the VERDICT #6 target is exact-fp32
   >= 50x the P100 baseline (stream engine: 43.5x).

Run on the real TPU with no other device process active:
    python scripts/fused_hw_check.py [--validate-only]
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

REFERENCE_PTS_PER_SEC = 142_000.0  # 1x P100 (ev-NSFnet/README.md:56)


def build(n_f, fused: bool, precision: str, evm_update_freq: int = 10000):
    os.environ["NSFNET_FUSED_LOSS"] = "1" if fused else "0"
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.training.solver import PINNSolver

    solver = PINNSolver(
        Re=2000, layers=6, layers_1=4, hidden_size=80, hidden_size_1=40,
        N_f=n_f, alpha_evm=0.05, bc_weight=10, eq_weight=1,
        log_interval=10**9, checkpoint_freq=10**9, seed=0,
        evm_update_freq=evm_update_freq,
        matmul_precision=precision)
    data = CavityData(N_f=n_f, sort_training_points=False,
                      sdf_enabled=True, seed=0)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver._ensure_ready()
    return solver


def run_chunk(solver, steps):
    sc = solver._stage_scalars(1e-3)
    state, m = solver._runner(solver.state, solver._batch, sc, n_steps=steps)
    jax.block_until_ready(m.total)
    solver.state = state
    return m


def validate() -> dict:
    """Fused vs stream at exact fp32 on a small batch: same data, same
    init, 10 full optimizer steps — metrics must match."""
    n_f, steps = 8_192, 10
    metrics = {}
    for fused in (False, True):
        # evm_update_freq=2: the EVM net updates 5x inside the window, so a
        # wrong g_e cotangent from the fused backward WOULD move the metrics
        solver = build(n_f, fused, "highest", evm_update_freq=2)
        m = run_chunk(solver, steps)
        metrics[fused] = {k: float(getattr(m, k)) for k in
                          ("total", "boundary", "equation", "eq1", "eq2",
                           "eq3", "eq4", "vis_t_mean")}
    diffs = {}
    for k, ref in metrics[False].items():
        got = metrics[True][k]
        denom = max(abs(ref), 1e-12)
        diffs[k] = abs(got - ref) / denom
        # exact matmuls both sides; only reduction order differs, then 10
        # optimizer steps amplify — 1e-3 relative is the generous bound,
        # real agreement should be ~1e-5
        if not np.isfinite(got) or diffs[k] > 1e-3:
            raise SystemExit(
                f"FUSED-KERNEL MISMATCH on hardware: {k} fused={got!r} "
                f"stream={ref!r} rel={diffs[k]:.2e} — NOT writing the "
                f"marker; campaigns stay on the stream engine")
    return {"metrics_stream": metrics[False], "metrics_fused": metrics[True],
            "rel_diffs": diffs, "n_f": n_f, "steps": steps}


def measure(n_f=120_000, steps=1000) -> list:
    rows = []
    pts_per_step = n_f + 4 * 513
    for precision in ("highest", "high"):
        for fused in (True, False):
            solver = build(n_f, fused, precision)
            run_chunk(solver, steps)  # compile + warm
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                m = run_chunk(solver, steps)
                dt = min(dt, time.perf_counter() - t0)
            assert np.isfinite(float(m.total)), "diverged"
            pts = steps * pts_per_step / dt / len(jax.devices())
            rows.append({
                "config": f"mlp/pallas {precision}"
                          + ("" if fused else " (stream engine)"),
                "fused_loss": fused,
                "pts_per_s_per_chip": round(pts, 1),
                "vs_baseline": round(pts / REFERENCE_PTS_PER_SEC, 2),
            })
            print(json.dumps(rows[-1]), flush=True)
            del solver
    return rows


def main():
    if jax.devices()[0].platform != "tpu":
        print("not on TPU — nothing to validate", file=sys.stderr)
        return 1
    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    report = validate()
    marker = os.path.join(_REPO, "artifacts", "fused_hw_ok.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"validated": True, "max_rel_diff":
                   max(report["rel_diffs"].values()), **report}, f, indent=1)
    os.replace(tmp, marker)
    print(f"validation OK (max rel diff "
          f"{max(report['rel_diffs'].values()):.2e}) -> {marker}",
          file=sys.stderr)
    if "--validate-only" in sys.argv:
        return 0
    rows = measure()
    out = os.path.join(_REPO, "artifacts", "fused_perf.json")
    with open(out + ".tmp", "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    os.replace(out + ".tmp", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
