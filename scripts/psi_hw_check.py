"""Numerically validate the fused order-3 psi kernel on real TPU hardware.

The streamfunction Pallas kernel pair (ops/pallas_psi.py) is
interpret-validated by the CPU suite (tests/test_pallas_psi.py) and its
throughput is measured by scripts/perf_matrix.py (3.44M vs the closed-form
XLA engine's 2.13M pts/s on the v5e) — but throughput alone does not prove
the Mosaic lowering computes the right numbers. This script trains the
same streamfunction chunk with engine="pallas" and engine="xla" at exact
fp32 matmuls; the metrics after 10 full optimizer steps must agree to
reduction-order noise. On success it writes artifacts/psi_hw_ok.json —
the marker that lets auto engine selection pick the kernel on TPU
(solver._psi_kernel_validated); until then unattended streamfunction
campaigns stay on the proven closed-form engine.

Run on the real TPU with no other device process active:
    python scripts/psi_hw_check.py
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def build(n_f, engine: str):
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.training.solver import PINNSolver

    solver = PINNSolver(
        Re=2000, layers=6, layers_1=4, hidden_size=80, hidden_size_1=40,
        N_f=n_f, alpha_evm=0.05, bc_weight=10, eq_weight=1,
        log_interval=10**9, checkpoint_freq=10**9, seed=0,
        evm_update_freq=2,  # EVM updates inside the window: a wrong g_e
        # cotangent from the fused backward WOULD move the metrics
        matmul_precision="highest", formulation="streamfunction",
        engine=engine)
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


def main():
    if jax.devices()[0].platform != "tpu":
        print("not on TPU — nothing to validate", file=sys.stderr)
        return 1
    n_f, steps = 8_192, 10
    metrics = {}
    for engine in ("xla", "pallas"):
        m = run_chunk(build(n_f, engine), steps)
        metrics[engine] = {k: float(getattr(m, k)) for k in
                           ("total", "boundary", "equation", "eq1", "eq2",
                            "eq3", "eq4", "vis_t_mean")}
        print(json.dumps({engine: metrics[engine]}), flush=True)
    diffs = {}
    for k, ref in metrics["xla"].items():
        got = metrics["pallas"][k]
        denom = max(abs(ref), 1e-12)
        diffs[k] = abs(got - ref) / denom
        # exact matmuls both sides; only reduction order differs, then 10
        # optimizer steps amplify — 1e-3 relative is the generous bound
        if not np.isfinite(got) or diffs[k] > 1e-3:
            raise SystemExit(
                f"PSI-KERNEL MISMATCH on hardware: {k} pallas={got!r} "
                f"xla={ref!r} rel={diffs[k]:.2e} — NOT writing the marker; "
                f"streamfunction campaigns stay on the closed-form engine")
    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    marker = os.path.join(_REPO, "artifacts", "psi_hw_ok.json")
    with open(marker + ".tmp", "w") as f:
        json.dump({"validated": True,
                   "max_rel_diff": max(diffs.values()),
                   "metrics_xla": metrics["xla"],
                   "metrics_pallas": metrics["pallas"],
                   "rel_diffs": diffs, "n_f": n_f, "steps": steps}, f,
                  indent=1)
    os.replace(marker + ".tmp", marker)
    print(f"validation OK (max rel diff {max(diffs.values()):.2e}) "
          f"-> {marker}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
