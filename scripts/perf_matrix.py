"""Precision/backbone throughput matrix (VERDICT round-1 item 10).

Measures collocation points/sec/chip for the flagship ev-NSFnet step at
each matmul precision (highest = exact fp32 6-pass, high = bf16x3,
default = bf16) and for the KAN backbone (generic jvp engine), using the
same methodology as bench.py (scan-chunked steps, best-of-3 after a
warm-up chunk). Writes artifacts/perf_matrix.json and prints a markdown
table to stderr plus one JSON line per row to stdout.

Run on the real TPU with no other device process active:
    python scripts/perf_matrix.py [--quick]
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

REFERENCE_PTS_PER_SEC = 142_000.0  # 1x P100 (ev-NSFnet/README.md:56)
V5E_BF16_PEAK = 197e12  # TPU v5e MXU peak, bf16 FLOP/s per chip

# MXU passes a single model-FLOP costs at each matmul precision:
# default = one bf16 pass, high = bf16x3, highest = fp32 via 6 passes
PASSES = {"default": 1, "high": 3, "highest": 6}


def model_flops_per_point(layers=6, hidden=80, layers_1=4, hidden_1=40):
    """Analytic model-FLOPs per collocation point per training step.

    The residual engine carries 5 streams (value, d/dx, d/dy, d2/dx2,
    d2/dy2) through every matmul after the analytic first layer
    (ops/derivatives.py:81-123): fwd = 2*2*h + (L-1)*5*(2*h*h) + 5*(2*h*3)
    for the main net. The EVM net is a plain VALUE forward in the loss
    (training/step.py:93 — no derivative streams). Reverse mode costs
    ~2x the forward (grads wrt params + activations), so a step is
    ~3x fwd. Boundary/supervised rows (~2% of points) are counted at the
    same rate — a slight overestimate offset by ignoring VPU work.
    """

    def fwd(L, h, n_out, streams):
        return (2 * 2 * h + (L - 1) * streams * (2 * h * h)
                + streams * (2 * h * n_out))

    return 3.0 * (fwd(layers, hidden, 3, 5) + fwd(layers_1, hidden_1, 1, 1))


def measure(solver, n_f, steps):
    sc = solver._stage_scalars(1e-3)
    pts_per_step = n_f + 4 * 513
    solver.state, m = solver._runner(solver.state, solver._batch, sc,
                                     n_steps=steps)
    jax.block_until_ready(m.total)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        solver.state, m = solver._runner(solver.state, solver._batch, sc,
                                         n_steps=steps)
        jax.block_until_ready(m.total)
        dt = min(dt, time.perf_counter() - t0)
    assert np.isfinite(float(m.total)), "diverged"
    return steps * pts_per_step / dt / len(jax.devices())


def build(n_f, **kw):
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.training.solver import PINNSolver

    defaults = dict(
        Re=2000, layers=6, layers_1=4, hidden_size=80, hidden_size_1=40,
        N_f=n_f, alpha_evm=0.05, bc_weight=10, eq_weight=1,
        log_interval=10**9, checkpoint_freq=10**9, seed=0)
    defaults.update(kw)
    solver = PINNSolver(**defaults)
    data = CavityData(N_f=n_f, sort_training_points=False,
                      sdf_enabled=True, seed=0)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver._ensure_ready()
    return solver


def main():
    quick = "--quick" in sys.argv
    on_tpu = jax.devices()[0].platform == "tpu"
    n_f = 120_000 if (on_tpu and not quick) else 8_192
    steps = 1000 if (on_tpu and not quick) else 20
    kan_n_f = 16_384 if (on_tpu and not quick) else 2_048
    kan_steps = 100 if (on_tpu and not quick) else 5

    rows = []
    flop_pt = model_flops_per_point()
    for prec in ("highest", "high", "default"):
        solver = build(n_f, matmul_precision=prec)
        # fused residual-loss kernel state (on-TPU it requires the
        # fused_hw_ok.json marker; scripts/fused_hw_check.py measures the
        # explicit fused-vs-stream A/B)
        fused = solver._fused_loss_enabled()
        pts = measure(solver, n_f, steps)
        model_tflops = pts * flop_pt / 1e12
        rows.append({
            "config": f"mlp/pallas {prec}",
            "fused_loss": fused,
            "pts_per_s_per_chip": round(pts, 1),
            "vs_baseline": round(pts / REFERENCE_PTS_PER_SEC, 2),
            "model_tflops_per_s": round(model_tflops, 2),
            # hardware MXU utilization: each model-FLOP costs PASSES[prec]
            # bf16 MXU passes at this precision
            "mxu_util_pct": round(100 * model_tflops * 1e12 * PASSES[prec]
                                  / V5E_BF16_PEAK, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    # streamfunction formulation: third-order engines (13 packed streams
    # vs 5 — expect ~2.5x the per-point cost of the velocity kernel).
    # The explicit-pallas row only runs on real hardware: interpret mode
    # on CPU is hours-slow for a fused kernel.
    sf_engines = [("xla", "sf/xla-closed-form")]
    if on_tpu:
        sf_engines.append(("pallas", "sf/pallas"))
    for eng, label in sf_engines:
        # one failing engine must not lose the rest of the matrix (the
        # round-4 psi-kernel VMEM OOM crashed the whole run before the
        # JSON write — logs/round4/gap.log)
        try:
            pts = measure(build(n_f, formulation="streamfunction", engine=eng,
                                matmul_precision="high"), n_f, steps)
            rows.append({"config": f"{label} high",
                         "pts_per_s_per_chip": round(pts, 1),
                         "vs_baseline": round(pts / REFERENCE_PTS_PER_SEC, 2)})
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            rows.append({"config": f"{label} high",
                         "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(json.dumps(rows[-1]), flush=True)

    # KAN backbone: generic jvp engine (no fused kernel yet); smaller N_f —
    # its activation footprint per point is much larger than the MLP's
    try:
        kan = build(kan_n_f, backbone="kan", kan_width=(2, 16, 16, 8),
                    kan_grid=5, kan_k=3, evm=False, layers_1=None,
                    matmul_precision="high")
        pts = measure(kan, kan_n_f, kan_steps)
        rows.append({"config": "kan/generic high", "pts_per_s_per_chip":
                     round(pts, 1), "vs_baseline": round(pts / REFERENCE_PTS_PER_SEC, 2)})
    except Exception as e:  # noqa: BLE001
        rows.append({"config": "kan/generic high",
                     "error": f"{type(e).__name__}: {str(e)[:300]}"})
    print(json.dumps(rows[-1]), flush=True)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/perf_matrix.json", "w") as f:
        json.dump({"platform": jax.devices()[0].platform,
                   "n_f": n_f, "rows": rows}, f, indent=1)
    print("| config | pts/s/chip | vs P100 baseline | model TFLOP/s | MXU util |",
          file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        if "error" in r:
            print(f"| {r['config']} | ERROR: {r['error']} | | | |",
                  file=sys.stderr)
            continue
        tf = r.get("model_tflops_per_s")
        mfu = r.get("mxu_util_pct")
        print(f"| {r['config']} | {r['pts_per_s_per_chip']:,.0f} | "
              f"{r['vs_baseline']:.1f}x | "
              f"{tf if tf is not None else '-'} | "
              f"{str(mfu) + '%' if mfu is not None else '-'} |",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
