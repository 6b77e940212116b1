"""The PINN solver: the user-facing orchestrator.

API parity with the reference `PysicsInformedNeuralNetwork`
(ev-NSFnet/pinn_solver.py:27-765): set_boundary_data, set_eq_training_data,
set_supervised_data, set_supervised_loss_weight, set_coordinate_transform,
set_alpha_evm, train, evaluate, test, predict, save — re-designed around a
jitted scan-chunked train step on a device mesh instead of a Python-loop of
op-by-op torch calls.

Key TPU-native differences (all documented divergences, see SURVEY §7):
  * point batches are padded + sharded over a 1-D mesh, losses are exact
    global means (no per-rank slicing, no loss all_reduce);
  * the EVM lag field vis_t is a device carry (no per-step host sync);
  * the EVM freeze schedule is a gated in-jit update (no optimizer rebuild,
    Adam moments preserved);
  * checkpoints capture the FULL train state for exact resume.
"""

from __future__ import annotations

import contextlib
import os
import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nsfnet_tpu.logger import get_logger
from nsfnet_tpu.models.kan import KAN
from nsfnet_tpu.models.mlp import MLP
from nsfnet_tpu.ops.derivatives import derivatives_2d, mlp_derivatives_2d
from nsfnet_tpu.parallel import mesh as pmesh
from nsfnet_tpu.training import checkpoint as ckpt
from nsfnet_tpu.training.lbfgs import run_lbfgs
from nsfnet_tpu.training.state import Batch, TrainState
from nsfnet_tpu.training.step import (
    StageScalars,
    make_chunk_runner,
    make_loss_fn,
    make_sharded_chunk_runner,
    make_train_step,
)
from nsfnet_tpu.utils.tensorboard import ScalarWriter


@contextlib.contextmanager
def _defer_sigterm():
    """Mask SIGTERM across the dispatch + step-counter critical section.

    The driver's SIGTERM handler (train.py GracefulStop) raises between
    Python bytecodes; landing between the runner-result assignment and the
    global_step increment would checkpoint params one full chunk ahead of
    the step counter. Masking makes the pair atomic — a pending SIGTERM
    delivers at unmask, i.e. at a consistent chunk boundary."""
    try:
        prev = signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGTERM})
    except (AttributeError, ValueError, OSError):
        # non-main-thread restrictions / platforms without pthread_sigmask:
        # fall back to the (narrow) unmasked race rather than failing
        yield
        return
    try:
        yield
    finally:
        signal.pthread_sigmask(signal.SIG_SETMASK, prev)


def stall_gain(eq_track, window: int) -> float:
    """Relative improvement of the best (minimum) equation loss achieved in
    the last `window` log intervals over the best before them. Minimum-based
    so eq-loss oscillation around a converged value reads as ~0 gain while a
    noisy-but-descending track reads positive (endpoint-to-endpoint deltas
    fire on transient upticks — observed in the Re=5000 gentle campaign)."""
    window = max(1, int(window))
    if len(eq_track) <= window:
        return float("inf")  # not enough history to call a stall
    best_before = min(eq_track[:-window])
    best_now = min(eq_track[-window:])
    return (best_before - best_now) / max(abs(best_before), 1e-30)


class PINNSolver:
    """2-D steady cavity PINN solver (vanilla NSFnet or ev-NSFnet variant).

    Constructor knob parity with ev-NSFnet/pinn_solver.py:32-54 (Re, layers,
    layers_1, hidden_size, hidden_size_1, N_f, alpha_evm, bc_weight,
    eq_weight, supervised_data_weight, checkpoint_path, net_params...),
    plus TPU-native knobs (mesh, seed, precision, backbone).
    """

    tb_writer: Optional[ScalarWriter] = None

    def __init__(
        self,
        Re: float = 1000,
        layers: int = 6,
        layers_1: Optional[int] = 4,
        hidden_size: int = 80,
        hidden_size_1: int = 40,
        N_f: int = 100000,
        alpha_evm: float = 0.03,
        learning_rate: float = 0.001,
        bc_weight: float = 10.0,
        eq_weight: float = 1.0,
        supervised_data_weight: float = 1.0,
        entropy_residual_weight: float = 0.1,
        num_ins: int = 2,
        num_outs: int = 3,
        num_outs_1: int = 1,
        net_params: Optional[str] = None,
        net_params_1: Optional[str] = None,
        checkpoint_freq: int = 10000,
        checkpoint_path: str = "./results",
        evm: bool = True,
        backbone: str = "mlp",
        kan_width=(2, 16, 16, 8),
        kan_grid: int = 5,
        kan_k: int = 3,
        seed: int = 42,
        mesh=None,
        mesh_devices: Optional[int] = None,
        matmul_precision: str = "high",  # bf16x3 (validated default; see config.py)
        evm_update_freq: int = 10000,
        log_interval: int = 1000,
        engine: str = "auto",  # auto | pallas | xla — residual-engine backend
        loss_mode: str = "MSE",  # MSE | L2 (reference v1's un-normalized norms)
        max_chunk: int = 2000,  # max steps per device dispatch: keeps one
        # scan under typical runtime watchdogs (a 10k-step dispatch was
        # observed to kill the TPU worker) while still amortizing dispatch
        microbatches: int = 1,  # gradient-accumulation microbatches over the
        # collocation batch (lets N_f exceed per-chip HBM; SURVEY §5.7)
        lm_microbatches: int = 1,  # LM Gauss-Newton-product slicing (memory;
        # see train_lm / training/lm.py run_lm_micro)
        fourier_features: int = 0,  # random Fourier input embedding size for
        fourier_sigma: float = 3.0,  # the main MLP (0 = off; generic engine)
        adaptive_bc_weight: bool = False,  # grad-norm loss balancing
        adaptive_bc_ema: float = 0.9,      # (config.py adaptive_bc_*)
        adaptive_bc_max: float = 1000.0,
        formulation: str = "velocity",  # velocity (reference parity) |
        # streamfunction: net outputs (psi, p), u = psi_y, v = -psi_x —
        # continuity is EXACT by construction (ops/derivatives.py
        # psi_p_derivatives_2d); needs 3rd-order Taylor sweeps, XLA engine
    ):
        self.max_chunk = max_chunk
        self.microbatches = max(1, int(microbatches))
        self.lm_microbatches = max(1, int(lm_microbatches))
        self.loss_mode = loss_mode
        if loss_mode == "L2" and self.microbatches > 1:
            raise ValueError("L2 loss mode does not compose with microbatching")
        self.Re = float(Re)
        self.vis_t0 = 20.0 / self.Re  # ev-NSFnet/pinn_solver.py:67
        self.N_f = N_f
        self.alpha_evm = float(alpha_evm)
        self.alpha_b = float(bc_weight)
        self.alpha_e = float(eq_weight)
        self.alpha_s = float(supervised_data_weight)
        self.entropy_residual_weight = float(entropy_residual_weight)
        self.evm = bool(evm) and layers_1 is not None
        self.checkpoint_freq = checkpoint_freq
        self.checkpoint_path = checkpoint_path
        self.evm_update_freq = evm_update_freq
        self.log_interval = log_interval
        self.matmul_precision = matmul_precision
        self.current_stage = " "
        self.current_lr = learning_rate
        self.current_re = self.Re
        self.current_alpha_b = self.alpha_b
        self.adaptive_bc_weight = bool(adaptive_bc_weight)
        self.adaptive_bc_ema = float(adaptive_bc_ema)
        self.adaptive_bc_max = float(adaptive_bc_max)
        self._gnr_fn = None  # jitted grad-norm-ratio probe (built lazily)
        self.coord_scale = 1.0
        self.layers = layers
        self.hidden_size = hidden_size
        self.layers_1 = layers_1
        self.hidden_size_1 = hidden_size_1
        self.logger = get_logger()

        self.mesh = mesh if mesh is not None else pmesh.create_mesh(mesh_devices)
        self.rank = jax.process_index()
        self.world_size = self.mesh.devices.size
        requested_engine = engine
        if engine == "auto":
            is_tpu = self.mesh.devices.flat[0].platform == "tpu"
            engine = "pallas" if (is_tpu and backbone == "mlp") else "xla"
        self.engine = engine

        if formulation not in ("velocity", "streamfunction"):
            raise ValueError(f"unknown formulation {formulation!r}")
        self.formulation = formulation
        if formulation == "streamfunction":
            if backbone != "mlp":
                raise ValueError(
                    "formulation='streamfunction' supports the MLP backbone")
            num_outs = 2  # (psi, p); u/v are psi derivatives
            if net_params and net_params.endswith(".pth"):
                raise ValueError(
                    ".pth import is velocity-formulation only (the "
                    "reference nets predict (u, v, p) directly)")

        key = jax.random.PRNGKey(seed)
        k_main, k_evm = jax.random.split(key)
        if backbone == "kan":
            self.net = KAN(width=tuple(kan_width), grid=kan_grid, k=kan_k)
            self._generic_engine = True
        else:
            self.net = MLP(num_ins=num_ins, num_outs=num_outs,
                           num_layers=layers, hidden_size=hidden_size,
                           fourier_features=int(fourier_features),
                           fourier_sigma=float(fourier_sigma))
            # the closed-form tanh engine and the Pallas kernel assume a
            # plain MLP; the Fourier-embedded net runs the generic
            # jvp-of-jvp engine (sin/cos differentiate through cleanly)
            self._generic_engine = fourier_features > 0
            if self._generic_engine and self.engine == "pallas":
                # no fused kernel for the Fourier-embedded net
                self.engine = "xla"
            elif formulation == "streamfunction" \
                    and requested_engine != "pallas" \
                    and self.engine == "pallas" \
                    and not self._psi_kernel_validated():
                # auto picks the third-order kernel (pallas_psi.py) only
                # once it is hardware-validated: measured 3.44M pts/s vs
                # the closed-form XLA engine's 2.13M on the v5e
                # (artifacts/perf_matrix.json), but an unattended campaign
                # must never gamble on an unproven Mosaic lowering — the
                # numeric marker artifacts/psi_hw_ok.json is written by
                # scripts/psi_hw_check.py. Opt in with engine="pallas".
                self.engine = "xla"
        self.backbone = backbone
        params = self.net.init(k_main)
        if self.evm:
            self.net_1 = MLP(num_ins=num_ins, num_outs=num_outs_1,
                             num_layers=layers_1, hidden_size=hidden_size_1)
            params_evm = self.net_1.init(k_evm)
        else:
            self.net_1 = None
            params_evm = None

        # Adam as scale_by_adam + runtime lr (stage lr changes never retrace).
        self.tx_main = optax.scale_by_adam()
        self.tx_evm = optax.scale_by_adam() if self.evm else None
        rep = pmesh.replicated_sharding(self.mesh)
        self.state = TrainState(
            params=jax.device_put(params, rep),
            params_evm=jax.device_put(params_evm, rep) if self.evm else None,
            opt_main=jax.device_put(self.tx_main.init(params), rep),
            opt_evm=jax.device_put(self.tx_evm.init(params_evm), rep) if self.evm else None,
            vis_t_minus=None,
            step=jnp.zeros((), jnp.int32),
            epoch_in_stage=jnp.zeros((), jnp.int32),
        )
        self.global_step = 0

        # loss history, dumped as eq_losses.mat next to checkpoints
        # (parity: NSFnet/pinn_solver.py:374-380)
        self._loss_history = []

        # host-side staged data (set_* fills these)
        self._bc = None
        self._eq = None
        self._eq_weights = None
        self._sup = None
        self._batch: Optional[Batch] = None
        self._runner = None
        self._score_jit = None
        self._dirty = True
        self._eval_fields = None  # DNS (x, y, u, v, p) for eval_error stall

        if net_params and net_params.endswith(".pth"):
            # reference-format torch state_dict(s): net_params is the main
            # net, net_params_1 (or the reference's '<file>_evm' sibling)
            # the EVM net (ev-NSFnet/pinn_solver.py:108-120, 755-759)
            self.load_torch(net_params, net_params_1)
        elif net_params:
            self.load(net_params)
            if net_params_1:
                raise ValueError(
                    "net_params_1 only applies to reference .pth imports; "
                    "full-state checkpoints carry both networks")

        # jitted prediction head: (params[, params_evm], X[N,2]) -> (u,v,p,e)
        self._predict_jit = jax.jit(self._predict_impl)

        if self.rank == 0:
            self.logger.info(
                f"PINNSolver: variant={'ev-nsfnet' if self.evm else 'nsfnet'} "
                f"backbone={backbone} mesh={self.world_size}x'{pmesh.DATA_AXIS}' "
                f"devices={[str(d) for d in self.mesh.devices.flat][:4]}"
                f"{'...' if self.world_size > 4 else ''}")

    # ---------------------------------------------------------------- data

    def set_boundary_data(self, X=None):
        """X = (x_b, y_b, u_b, v_b) host arrays [N,1]
        (parity: ev-NSFnet/pinn_solver.py:142-158; no per-rank slicing —
        the mesh shards the padded batch)."""
        self._bc = tuple(np.asarray(a, np.float32).reshape(-1, 1) for a in X[:4])
        self._dirty = True

    def set_eq_training_data(self, X=None, weights=None):
        """X = (x_f, y_f); optional per-point SDF weights
        (parity: ev-NSFnet/pinn_solver.py:160-184)."""
        self._eq = tuple(np.asarray(a, np.float32).reshape(-1, 1) for a in X[:2])
        self._eq_weights = (np.asarray(weights, np.float32).reshape(-1, 1)
                            if weights is not None else None)
        self._dirty = True
        if self.evm:
            self._init_vis_t()
            # the carried vis_t belongs to the PREVIOUS point set — force
            # _build_batch to install the freshly computed init even when
            # the new draw has the same shape (per-stage resampling)
            self._vis_stale = True

    def eq_points(self):
        """The currently-installed (x_f, y_f) collocation columns — lets a
        second solver (e.g. the --init-from donor) share this exact draw
        without advancing the dataset's sampler state."""
        return self._eq

    def _init_vis_t(self):
        """vis_t_minus := alpha_evm*|e(x_f)| with the current EVM net
        (parity: init_vis_t, ev-NSFnet/pinn_solver.py:138-140)."""
        x = np.concatenate(self._eq, axis=1)
        e = np.asarray(self.net_1.apply(self.state.params_evm, jnp.asarray(x)))[:, 0:1]
        self._vis_t_init = self.alpha_evm * np.abs(e).astype(np.float32)

    def set_supervised_data(self, data):
        """data = (x, y, u, v, p) or None; p may contain NaN (masked)
        (parity: ev-NSFnet/pinn_solver.py:202-254)."""
        if data is None:
            self._sup = None
        else:
            x, y, u, v, p = data
            self._sup = (
                np.asarray(x, np.float32).reshape(-1, 1),
                np.asarray(y, np.float32).reshape(-1, 1),
                np.asarray(u, np.float32).reshape(-1, 1),
                np.asarray(v, np.float32).reshape(-1, 1),
                np.asarray(p, np.float32).reshape(-1, 1) if p is not None else None,
            )
        self._dirty = True

    def clear_supervised_data(self):
        self.set_supervised_data(None)

    def set_supervised_loss_weight(self, weight: float):
        self.alpha_s = float(weight)
        self._dirty = True

    def set_coordinate_transform(self, scale: Optional[float]):
        """Chain-rule scale for [0,1]->[-1,1] domains
        (parity: ev-NSFnet/pinn_solver.py:186-192)."""
        self.coord_scale = 1.0 if (scale is None or scale <= 0) else float(scale)
        self._score_jit = None  # closes over coord_scale
        self._predict_jit = jax.jit(self._predict_impl)  # ditto (psi u,v scale)
        self._dirty = True

    def set_alpha_evm(self, alpha: float):
        self.alpha_evm = float(alpha)  # runtime scalar; no recompile

    def refresh_vis_t(self):
        """Recompute the lagged viscosity carry from the CURRENT EVM params.

        During an L-BFGS stage the carry is frozen (the line search needs a
        stationary objective); after many polish steps it goes stale w.r.t.
        the updated nets. Call this between polish segments to re-anchor it
        — the Adam path needs none of this (the carry updates every step)."""
        if not self.evm:
            return
        self._init_vis_t()
        self._vis_stale = True
        self._dirty = True

    # ------------------------------------------------------------ assembly

    def _build_batch(self) -> Batch:
        if self._bc is None or self._eq is None:
            raise RuntimeError("set_boundary_data and set_eq_training_data first")
        msize = self.world_size
        sh = lambda a: pmesh.shard_batch(self.mesh, a)

        x_f, y_f = self._eq
        n_f = x_f.shape[0]
        nf_pad = self._eq_pad_size(n_f)
        w = self._eq_weights if self._eq_weights is not None else np.ones((n_f, 1), np.float32)
        eq_w = pmesh.pad_rows(w, nf_pad, 0.0)

        x_b, y_b, u_b, v_b = self._bc
        n_b = x_b.shape[0]
        nb_pad = pmesh.padded_size(n_b, msize)
        b_mask = pmesh.pad_rows(np.ones((n_b, 1), np.float32), nb_pad, 0.0)

        kw = {}
        if self._sup is not None and self.alpha_s != 0.0:
            x_s, y_s, u_s, v_s, p_s = self._sup
            n_s = x_s.shape[0]
            ns_pad = pmesh.padded_size(n_s, msize)
            s_mask = pmesh.pad_rows(np.ones((n_s, 1), np.float32), ns_pad, 0.0)
            if p_s is not None:
                p_finite = np.isfinite(p_s).astype(np.float32)
                p_mask = pmesh.pad_rows(p_finite, ns_pad, 0.0)
                n_p = float(p_finite.sum())
                p_arr = pmesh.pad_rows(np.nan_to_num(p_s), ns_pad, 0.0)
            else:
                p_mask, n_p, p_arr = None, 0.0, None
            kw = dict(
                x_s=sh(pmesh.pad_rows(x_s, ns_pad)), y_s=sh(pmesh.pad_rows(y_s, ns_pad)),
                u_s=sh(pmesh.pad_rows(u_s, ns_pad)), v_s=sh(pmesh.pad_rows(v_s, ns_pad)),
                p_s=sh(p_arr) if p_arr is not None else None,
                s_mask=sh(s_mask),
                p_mask=sh(p_mask) if p_mask is not None else None,
                n_s=jnp.float32(n_s), n_p=jnp.float32(n_p),
            )

        batch = Batch(
            x_f=sh(pmesh.pad_rows(x_f, nf_pad)),
            y_f=sh(pmesh.pad_rows(y_f, nf_pad)),
            eq_w=sh(eq_w), n_f=jnp.float32(n_f),
            x_b=sh(pmesh.pad_rows(x_b, nb_pad)),
            y_b=sh(pmesh.pad_rows(y_b, nb_pad)),
            u_b=sh(pmesh.pad_rows(u_b, nb_pad)),
            v_b=sh(pmesh.pad_rows(v_b, nb_pad)),
            b_mask=sh(b_mask), n_b=jnp.float32(n_b),
            **kw,
        )

        if self.evm:
            vtm = pmesh.pad_rows(self._vis_t_init, nf_pad, self.vis_t0)
            if (getattr(self, "_vis_stale", True)
                    or self.state.vis_t_minus is None
                    or self.state.vis_t_minus.shape != vtm.shape):
                self.state = self.state._replace(vis_t_minus=sh(vtm))
                self._vis_stale = False
        return batch

    def _eq_pad_size(self, n_f: int) -> int:
        """Padded collocation-row count for THIS engine/mesh: the Pallas
        engine needs whole kernel tiles per device shard; each per-device,
        per-microbatch slice must stay lane-aligned."""
        eq_lane = 8
        if self.engine == "pallas":
            from nsfnet_tpu.ops.pallas_mlp import TILE

            eq_lane = TILE
        return pmesh.padded_size(n_f, self.world_size,
                                 lane=eq_lane * self.microbatches)

    def _uvp_apply(self):
        """(params, x) -> [N, 3] (u, v, p) values — the formulation-aware
        'forward pass' every consumer of velocities uses (BC/supervised
        losses, prediction). Velocity formulation: the net output itself.
        Streamfunction: u = s·psi_y, v = -s·psi_x via one tangent sweep per
        direction (ops/derivatives.py psi_p_uv)."""
        if self.formulation == "streamfunction":
            from nsfnet_tpu.ops.derivatives import psi_p_uv

            apply = self.net.apply
            scale = self.coord_scale
            return lambda params, x: psi_p_uv(
                lambda z: apply(params, z), x, scale)
        return self.net.apply

    def _engine(self, kind: Optional[str] = None):
        kind = kind or self.engine
        if self.formulation == "streamfunction":
            apply = self.net.apply
            scale = self.coord_scale
            if kind == "pallas" and not self._generic_engine:
                # fused third-order kernel (explicit opt-in; see __init__)
                from nsfnet_tpu.ops.pallas_psi import make_fused_psi_derivatives

                fe = make_fused_psi_derivatives(self.matmul_precision)
                return lambda params, x: fe(params, x, scale)
            if not self._generic_engine and kind != "generic":
                # closed-form third-order tanh propagation: one shared
                # primal, stacked-direction tangents (see derivatives.py)
                from nsfnet_tpu.ops.derivatives import mlp_psi_derivatives_2d

                return lambda params, x: mlp_psi_derivatives_2d(
                    params, x, scale)
            from nsfnet_tpu.ops.derivatives import psi_p_derivatives_2d

            return lambda params, x: psi_p_derivatives_2d(
                lambda z: apply(params, z), x, scale)
        if self._generic_engine:
            if self.backbone == "kan" and kind != "generic":
                # closed-form B-spline/silu tangent propagation — one basis
                # evaluation per layer instead of two traced jvp sweeps
                from nsfnet_tpu.ops.derivatives import make_kan_derivatives_2d

                return make_kan_derivatives_2d(self.net)
            apply = self.net.apply
            return lambda params, x: derivatives_2d(lambda z: apply(params, z), x)
        if kind == "pallas":
            from nsfnet_tpu.ops.pallas_mlp import make_fused_mlp_derivatives

            return make_fused_mlp_derivatives(self.matmul_precision)
        return mlp_derivatives_2d

    def _psi_kernel_validated(self) -> bool:
        """Marker gate for auto-selecting the fused order-3 psi kernel
        (ops/pallas_psi.py) under formulation='streamfunction' — same
        policy as the fused residual loss: hardware numeric validation
        (scripts/psi_hw_check.py -> artifacts/psi_hw_ok.json) before any
        unattended campaign runs on it. NSFNET_PALLAS_PSI=0/1 forces."""
        env = os.environ.get("NSFNET_PALLAS_PSI")
        if env is not None:
            return env != "0"
        marker = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "artifacts", "psi_hw_ok.json")
        return os.path.exists(marker)

    def _fused_loss_enabled(self) -> bool:
        env = os.environ.get("NSFNET_FUSED_LOSS")
        if env is not None:
            return env != "0"
        if self.mesh.devices.flat[0].platform != "tpu":
            return True  # interpret mode — covered by the CPU test suite
        marker = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "artifacts", "fused_hw_ok.json")
        return os.path.exists(marker)

    def _make_loss(self, engine_kind: str, axis_name: Optional[str]):
        # The EVM net runs through XLA's own fusion even on the pallas
        # engine: a fused Pallas value kernel for the tiny 4x40 net was
        # built and measured SLOWER (kernel dispatch overhead exceeds the
        # HBM round-trip it saves) — see VALIDATION.md "fused EVM forward".
        apply_evm = self.net_1.apply if self.evm else None
        # Fully-fused equation loss: residual algebra + loss reduction run
        # inside the Pallas kernel pair (ops/pallas_residual.py), removing
        # the 5-stream [N,3] HBM round trips on both sides of the engine.
        # Enable policy: NSFNET_FUSED_LOSS=0/1 forces it; otherwise on by
        # default, except on REAL TPU hardware it additionally requires the
        # Mosaic validation marker (artifacts/fused_hw_ok.json, written by
        # scripts/fused_hw_check.py) so an unattended campaign never
        # crash-loops on an unproven kernel lowering.
        fused_eq_loss = None
        if (engine_kind == "pallas" and self.backbone == "mlp"
                and not self._generic_engine
                and self.formulation == "velocity"
                and self.loss_mode == "MSE"
                and self._fused_loss_enabled()):
            from nsfnet_tpu.ops.pallas_residual import make_fused_residual_loss

            fused_eq_loss = make_fused_residual_loss(
                self.matmul_precision, self.coord_scale, self.evm)
        return make_loss_fn(
            engine=self._engine(engine_kind),
            apply_main=self._uvp_apply(),
            apply_evm=apply_evm,
            coord_scale=self.coord_scale,
            alpha_e=self.alpha_e,
            alpha_s=self.alpha_s,
            entropy_weight=self.entropy_residual_weight,
            evm=self.evm,
            axis_name=axis_name,
            loss_mode=self.loss_mode,
            fused_eq_loss=fused_eq_loss,
        )

    def _ensure_ready(self):
        if not self._dirty and self._runner is not None:
            return
        self._batch = self._build_batch()
        # XLA auto-partitions the jit path; a Pallas custom call cannot be
        # auto-partitioned, so the multi-device Pallas path runs the step
        # under shard_map with explicit psums.
        sharded = self.engine == "pallas" and self.world_size > 1
        if self.loss_mode == "L2" and sharded:
            raise ValueError("L2 loss mode is single-program only (like the reference's)")
        axis_name = pmesh.DATA_AXIS if sharded else None
        loss_fn = self._make_loss(self.engine, axis_name)
        # diagnostics/L-BFGS loss: XLA engine, no collectives — valid under
        # plain jit on any mesh (math identical to the pallas engine, tested)
        self._loss_fn = self._make_loss("xla", None)
        self._gnr_fn = None  # probe closes over _loss_fn; rebuild with it
        if self.microbatches > 1:
            from nsfnet_tpu.training.step import make_microbatched_train_step

            train_step = make_microbatched_train_step(
                loss_fn, self.tx_main, self.tx_evm, self.microbatches,
                evm_update_freq=self.evm_update_freq, evm=self.evm,
                axis_name=axis_name)
        else:
            train_step = make_train_step(
                loss_fn, self.tx_main, self.tx_evm,
                evm_update_freq=self.evm_update_freq, evm=self.evm,
                axis_name=axis_name)
        if sharded:
            self._runner = make_sharded_chunk_runner(
                train_step, self.mesh, self.state, self._batch,
                self.matmul_precision, data_axis=pmesh.DATA_AXIS)
        else:
            self._runner = make_chunk_runner(train_step, self.matmul_precision)
        self._dirty = False

    # ------------------------------------------------------------- training

    def _stage_scalars(self, lr: float) -> StageScalars:
        return StageScalars(
            lr=jnp.float32(lr),
            alpha_evm=jnp.float32(self.alpha_evm),
            re=jnp.float32(self.current_re),
            alpha_b=jnp.float32(self.current_alpha_b),
        )

    def _grad_norm_ratio(self, sc) -> float:
        """||grad_theta L_eq|| / ||grad_theta L_bc|| over the MAIN net's
        params on the current batch — the balance signal for adaptive
        bc-weighting (gradient-pathology recipe). Uses the XLA diagnostic
        loss (self._loss_fn), valid under plain jit on any mesh; the raw
        (unweighted) boundary component is differentiated so the current
        lambda_bc does not feed back into its own update."""
        if self._gnr_fn is None:
            lf = self._loss_fn

            @jax.jit
            def gnr(state, batch, sc):
                def eq_part(p):
                    val, _ = lf.eq_loss_fn((p, state.params_evm), batch.x_f,
                                           batch.y_f, batch.eq_w, batch.n_f,
                                           state.vis_t_minus, sc)
                    return val

                def bc_part(p):
                    _, (loss_b, _) = lf.aux_loss_fn((p, state.params_evm),
                                                    batch, sc)
                    return loss_b

                def norm(tree):
                    leaves = jax.tree_util.tree_leaves(tree)
                    return jnp.sqrt(sum(jnp.vdot(g, g).real for g in leaves))

                g_eq = norm(jax.grad(eq_part)(state.params))
                g_bc = norm(jax.grad(bc_part)(state.params))
                return g_eq / (g_bc + 1e-12)

            self._gnr_fn = gnr
        return float(self._gnr_fn(self.state, self._batch, sc))

    def _update_adaptive_bc(self, sc, lr: float):
        """EMA the boundary weight toward the measured grad-norm ratio and
        rebuild the runtime stage scalars (no retrace: alpha_b is already a
        runtime scalar)."""
        ratio = self._grad_norm_ratio(sc)
        if not np.isfinite(ratio):
            return sc
        target = float(np.clip(ratio, 1.0, self.adaptive_bc_max))
        m = self.adaptive_bc_ema
        self.current_alpha_b = m * self.current_alpha_b + (1.0 - m) * target
        if self.rank == 0:
            self.logger.info(
                f"  adaptive bc_weight -> {self.current_alpha_b:.3f} "
                f"(grad-norm ratio {ratio:.3f})")
        return self._stage_scalars(lr)

    def train(self, num_epoch: int = 1, lr: float = 1e-4, optimizer: str = "adam",
              Re: Optional[float] = None, bc_weight: Optional[float] = None,
              resume_in_stage: bool = False, advance_on_stall: bool = False,
              stall_threshold: float = 0.02, stall_window: int = 3,
              stall_min_epochs: int = 0, stall_metric: str = "eq_loss",
              **_compat):
        """One training stage: num_epoch full-batch steps at fixed lr
        (parity: ev-NSFnet/pinn_solver.py:430-487). Extensions:
        optimizer='lbfgs' runs the L-BFGS polish; Re / bc_weight override
        the physics per stage (staged-Re curriculum, boundary-weight
        annealing) without recompiling; resume_in_stage=True continues a
        restored checkpoint mid-stage — num_epoch is then the FULL stage
        length and training starts at the restored epoch_in_stage, keeping
        the EVM alternating-freeze phase (epoch %% evm_update_freq)
        bit-identical to the uninterrupted run."""
        self.current_re = float(Re) if Re is not None else self.Re
        if bc_weight is not None:
            self.current_alpha_b = float(bc_weight)
        elif not self.adaptive_bc_weight:
            # static mode resets to the config weight each stage; adaptive
            # mode KEEPS the EMA'd weight across stage boundaries and — via
            # load()'s metadata restore — across watchdog resumes (resetting
            # here would snap an adapted weight back to the config value and
            # put a loss-landscape discontinuity mid-campaign)
            self.current_alpha_b = self.alpha_b
        if optimizer == "lbfgs":
            return self.train_lbfgs(num_epoch)
        if optimizer == "lm":
            return self.train_lm(num_epoch)
        self._ensure_ready()
        self.current_lr = lr
        sc = self._stage_scalars(lr)
        if not resume_in_stage:
            self.state = self.state._replace(epoch_in_stage=jnp.zeros((), jnp.int32))

        if not hasattr(self, "cumulative_start_time"):
            self.cumulative_start_time = time.time()
        stage_start = time.time()
        done = int(self.state.epoch_in_stage) if resume_in_stage else 0
        last_log_t, last_log_e = stage_start, done

        pts_per_step = int(self._batch.x_f.shape[0] + self._batch.x_b.shape[0])
        # Stall track at log boundaries. 'eval_error' tracks the mean u/v
        # DNS error (requires attach_eval_data) — at the late-campaign 1e-6
        # loss plateau the eq-loss is flat while the error still descends
        # linearly, so eq_loss false-fires there (ext2 X2 postmortem,
        # VALIDATION.md); the error track sees the descent directly. One
        # evaluate() per log interval is ~148k fp32 forward points —
        # amortized noise next to log_interval full training steps.
        use_eval_track = (advance_on_stall and stall_metric == "eval_error"
                          and self._eval_fields is not None)
        if (advance_on_stall and stall_metric == "eval_error"
                and self._eval_fields is None and self.rank == 0):
            self.logger.warning(
                "stall_metric='eval_error' but no eval data attached "
                "(attach_eval_data) — falling back to the eq-loss track")
        eq_track: list = []  # stall-metric values at log boundaries
        last_ckpt: Optional[str] = None
        crashes = 0
        while done < num_epoch:
            # chunk boundaries: first step alone (log+ckpt parity with the
            # reference's epoch 0), then to the next log/ckpt boundary.
            if done == 0:
                n = 1
            else:
                nxt = min(
                    ((done // self.log_interval) + 1) * self.log_interval,
                    ((done // self.checkpoint_freq) + 1) * self.checkpoint_freq,
                    num_epoch)
                n = min(nxt - done, self.max_chunk)
            with _defer_sigterm():
                try:
                    self.state, metrics = self._runner(
                        self.state, self._batch, sc, n_steps=n)
                except jax.errors.JaxRuntimeError as e:
                    # Failure recovery (reference has none, SURVEY §5.3): a
                    # TPU worker crash/restart invalidates the (donated)
                    # state — roll back to the last full-state checkpoint
                    # and continue.
                    crashes += 1
                    if last_ckpt is None or crashes > 3:
                        raise
                    if self.rank == 0:
                        self.logger.error(
                            f"device runtime error at stage-epoch {done} "
                            f"({e}); resuming from {last_ckpt} "
                            f"(crash {crashes}/3)")
                    self._runner = None
                    self._dirty = True
                    self._ensure_ready()
                    self.load(last_ckpt)
                    done = int(self.state.epoch_in_stage)
                    continue
                done += n
                self.global_step += n

            if done == 1 or done % self.log_interval == 0 or done == num_epoch:
                m = jax.device_get(metrics)
                now = time.time()
                interval_it_s = (done - last_log_e) / max(now - last_log_t, 1e-9)
                avg_it_s = done / max(now - stage_start, 1e-9)
                self._print_log(m, done, num_epoch, avg_it_s, interval_it_s,
                                pts_per_step, now - stage_start,
                                now - self.cumulative_start_time, lr)
                # a completed chunk has logged: startup is over — let the
                # driver stop its startup keepalive so a later hung
                # dispatch goes visibly stale for the watchdog
                cb = getattr(self, "on_first_log", None)
                if cb is not None:
                    self.on_first_log = None
                    cb()
                last_log_t, last_log_e = now, done
                if done > 1:  # epoch-1 loss is pre-descent; skip it
                    if use_eval_track:
                        errs = self.evaluate(*self._eval_fields, log=False)
                        eq_track.append(0.5 * (errs["u"] + errs["v"]))
                    else:
                        eq_track.append(float(m.equation))
                if self.adaptive_bc_weight and done < num_epoch:
                    sc = self._update_adaptive_bc(sc, lr)
            if (done == 1 and num_epoch >= self.checkpoint_freq) \
                    or done % self.checkpoint_freq == 0:
                last_ckpt = self.save(f"model_cavity_loop{done}.ckpt") or last_ckpt
            if (advance_on_stall and done >= max(stall_min_epochs, 1)
                    and done < num_epoch and len(eq_track) > stall_window):
                # Oscillation-robust criterion: the stage is stalled only
                # when the last `stall_window` log intervals failed to set a
                # meaningfully better MINIMUM than everything before them.
                # (An endpoint-to-endpoint gain fires on eq-loss noise: the
                # Re=5000 gentle campaign advanced stages mid-convergence on
                # transient upticks — VALIDATION.md.)
                gain = stall_gain(eq_track, stall_window)
                if gain < stall_threshold:
                    if self.rank == 0:
                        metric_name = ("u/v eval-error" if use_eval_track
                                       else "eq-loss")
                        self.logger.info(
                            f"[{self.current_stage}] stalled at epoch {done}/"
                            f"{num_epoch}: best {metric_name} gain "
                            f"{gain * 100:.2f}% over {stall_window} log "
                            f"intervals < {stall_threshold * 100:.2f}% — "
                            f"advancing stage")
                    # fast-forward the global step to the stage end so the
                    # driver's stage<->step mapping (and a watchdog resume
                    # from this checkpoint) land on the NEXT stage
                    self.global_step += num_epoch - done
                    last_ckpt = self.save(
                        f"model_cavity_loop{num_epoch}.ckpt") or last_ckpt
                    break
        return self.state

    def train_lbfgs(self, num_steps: int):
        """L-BFGS polish over all trainable params, vis_t frozen."""
        self._ensure_ready()
        batch, vtm = self._batch, self.state.vis_t_minus
        sc = self._stage_scalars(1.0)

        def scalar_loss(params_all):
            total, _aux = self._loss_fn(params_all, batch, vtm, sc)
            return total

        t0 = time.time()

        def _progress(done, last_loss):
            if self.rank == 0 and done % 200 == 0:
                self.logger.info(
                    f"[L-BFGS] step {done}/{num_steps}  loss={last_loss:.3e}  "
                    f"({done / max(time.time() - t0, 1e-9):.2f} it/s)")

        # one L-BFGS step = up to ~25 line-search evals, so the per-dispatch
        # step budget is ~40x smaller than the Adam path's max_chunk
        (new_params, new_evm), history = run_lbfgs(
            scalar_loss, (self.state.params, self.state.params_evm),
            n_steps=num_steps, matmul_precision=self.matmul_precision,
            max_chunk=max(1, self.max_chunk // 40), progress=_progress)
        self.state = self.state._replace(params=new_params, params_evm=new_evm)
        self.global_step += int(history.shape[0])  # n_steps rounded up to whole chunks
        if self.rank == 0:
            h = jax.device_get(history)
            self.logger.info(
                f"[L-BFGS] {num_steps} steps in {time.time()-t0:.1f}s  "
                f"loss {h[0]:.3e} -> {h[-1]:.3e}")
        return self.state

    def train_lm(self, num_steps: int, cg_iters: int = 50,
                 microbatches: Optional[int] = None):
        """Levenberg-Marquardt (matrix-free Gauss-Newton-CG) polish.

        Exploits the least-squares loss structure; converges past the
        fp32 full-batch L-BFGS stall (see training/lm.py). vis_t frozen,
        like the L-BFGS stage.

        microbatches > 1 computes every Gauss-Newton product as a scan
        over that many collocation slices (run_lm_micro) — ~K-fold lower
        peak memory, same math — for nets/batches whose stored
        linearization exceeds HBM. Defaults to self.lm_microbatches."""
        self._ensure_ready()
        from nsfnet_tpu.training.lm import run_lm, run_lm_micro
        from nsfnet_tpu.training.step import make_residual_fn

        residual = make_residual_fn(
            engine=self._engine("xla"),
            apply_main=self._uvp_apply(),
            apply_evm=(self.net_1.apply if self.evm else None),
            coord_scale=self.coord_scale,
            alpha_e=self.alpha_e,
            alpha_s=self.alpha_s,
            entropy_weight=self.entropy_residual_weight,
            evm=self.evm,
        )
        batch, vtm = self._batch, self.state.vis_t_minus
        sc = self._stage_scalars(1.0)

        def res(params_all):
            return residual(params_all, batch, vtm, sc)

        t0 = time.time()

        def _progress(done, last_loss, lam):
            if self.rank == 0:
                self.logger.info(
                    f"[LM] step {done}/{num_steps}  loss={last_loss:.3e}  "
                    f"lam={lam:.1e}  "
                    f"({done / max(time.time() - t0, 1e-9):.2f} it/s)")

        micro = int(microbatches if microbatches is not None
                    else self.lm_microbatches)
        if micro > 1:
            eq_fn, aux_fn = residual.eq_residual_fn, residual.aux_residual_fn
            n = int(batch.x_f.shape[0])
            m = -(-n // micro)
            pad = micro * m - n

            def stack(a):
                a = jnp.asarray(a)
                if pad:
                    a = jnp.concatenate(
                        [a, jnp.zeros((pad, 1), a.dtype)], axis=0)
                return a.reshape(micro, m, 1)

            # pad rows carry eq_w=0 -> zero residual rows; global n_f keeps
            # the row scaling identical to the unsliced vector (vanilla
            # solvers have no carry: slice zeros, ignored by the residual)
            vtm_arr = vtm if vtm is not None else jnp.zeros_like(batch.x_f)
            slices = {"x": stack(batch.x_f), "y": stack(batch.y_f),
                      "w": stack(batch.eq_w), "v": stack(vtm_arr)}
            n_f = batch.n_f

            def eq_slice_fn(params_all, sl):
                return eq_fn(params_all, sl["x"], sl["y"], sl["w"],
                             sl["v"], n_f, sc)

            def aux_fn_w(params_all):
                return aux_fn(params_all, batch, sc)

            (new_params, new_evm), history, _lam = run_lm_micro(
                eq_slice_fn, aux_fn_w, slices,
                (self.state.params, self.state.params_evm),
                n_steps=num_steps, cg_iters=cg_iters,
                matmul_precision=self.matmul_precision,
                max_chunk=max(1, self.max_chunk // (3 * cg_iters + 8)),
                progress=_progress)
        else:
            # one LM step ~= 2*cg_iters+4 residual-grad evals per dispatch
            (new_params, new_evm), history, _lam = run_lm(
                res, (self.state.params, self.state.params_evm),
                n_steps=num_steps, cg_iters=cg_iters,
                matmul_precision=self.matmul_precision,
                max_chunk=max(1, self.max_chunk // (2 * cg_iters + 4)),
                progress=_progress)
        self.state = self.state._replace(params=new_params, params_evm=new_evm)
        self.global_step += int(history.shape[0])
        if self.rank == 0:
            h = jax.device_get(history)
            self.logger.info(
                f"[LM] {num_steps} steps in {time.time()-t0:.1f}s  "
                f"loss {h[0]:.3e} -> {h[-1]:.3e}")
        return self.state

    # ------------------------------------------------------------ inference

    def _predict_impl(self, params, params_evm, x):
        # evaluation always runs at exact fp32 regardless of the TRAINING
        # matmul precision — on TPU the default would be bf16-ish and
        # measurably inflates the reported DNS error (the reference
        # evaluates in full fp32)
        with jax.default_matmul_precision("highest"):
            uvp = self._uvp_apply()(params, x)
            e = (self.net_1.apply(params_evm, x)[:, 0:1]
                 if self.evm else jnp.zeros((x.shape[0], 1), x.dtype))
        return uvp[:, 0:1], uvp[:, 1:2], uvp[:, 2:3], e

    def neural_net_u(self, x, y):
        """(u, v, p, e) at host points (parity: ev-NSFnet/pinn_solver.py:280-288)."""
        pts = jnp.concatenate([jnp.asarray(x, jnp.float32).reshape(-1, 1),
                               jnp.asarray(y, jnp.float32).reshape(-1, 1)], axis=1)
        return self._predict_jit(self.state.params, self.state.params_evm, pts)

    def predict(self, X):
        x, y = X
        return self.neural_net_u(x, y)

    def divergence(self, x, y):
        """Continuity residual u_x + v_y at host points. (The reference's
        divergence() is broken dead code — NSFnet/pinn_solver.py:382-389;
        this is the working equivalent.)"""
        from nsfnet_tpu.ops.residuals import ns_residuals

        pts = jnp.concatenate([jnp.asarray(x, jnp.float32).reshape(-1, 1),
                               jnp.asarray(y, jnp.float32).reshape(-1, 1)], axis=1)
        engine = self._engine("xla")
        derivs = engine(self.state.params, pts)
        return ns_residuals(derivs, self.current_re, self.coord_scale).eq3

    def residuals_at(self, x, y, chunk: int = 32768):
        """Per-point PDE residual magnitude sqrt(eq1²+eq2²+eq3²) at host
        points, under the CURRENT nets (EVM effective viscosity included
        when enabled). Chunked into fixed-size padded dispatches (one
        compile, watchdog-safe). Powers residual-based adaptive resampling
        (RAR) — no reference counterpart: ev-NSFnet trains one fixed LHS
        draw for the whole curriculum (ev-NSFnet/pinn_solver.py:160-184)."""
        from nsfnet_tpu.ops.residuals import ev_ns_residuals, ns_residuals

        if self._score_jit is None:
            engine = self._engine("xla")
            evm = self.evm
            apply_evm = self.net_1.apply if evm else None
            coord_scale = self.coord_scale

            def _score(params, params_evm, pts, re, alpha_evm):
                with jax.default_matmul_precision("highest"):
                    derivs = engine(params, pts)
                    if evm:
                        e = apply_evm(params_evm, pts)[:, 0:1]
                        vis_t = jnp.minimum(20.0 / re, alpha_evm * jnp.abs(e))
                        r = ev_ns_residuals(derivs, e, vis_t, re, coord_scale)
                    else:
                        r = ns_residuals(derivs, re, coord_scale)
                return jnp.sqrt(r.eq1**2 + r.eq2**2 + r.eq3**2)[:, 0]

            self._score_jit = jax.jit(_score)

        xh = np.asarray(x, np.float32).reshape(-1)
        yh = np.asarray(y, np.float32).reshape(-1)
        n = xh.shape[0]
        out = np.empty((n,), np.float32)
        re = jnp.float32(self.current_re)
        al = jnp.float32(self.alpha_evm)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            seg = np.zeros((chunk, 2), np.float32)
            seg[: hi - lo, 0], seg[: hi - lo, 1] = xh[lo:hi], yh[lo:hi]
            s = self._score_jit(self.state.params, self.state.params_evm,
                                jnp.asarray(seg), re, al)
            out[lo:hi] = np.asarray(s)[: hi - lo]
        return out

    def evaluate(self, x, y, u, v, p, log: bool = True):
        """Relative L2 % errors vs DNS (parity: ev-NSFnet/pinn_solver.py:669-693)."""
        u_pred, v_pred, p_pred, _ = self.neural_net_u(x, y)
        u_pred, v_pred, p_pred = (np.asarray(a).reshape(-1, 1)
                                  for a in (u_pred, v_pred, p_pred))
        u_t, v_t, p_t = (np.asarray(a, np.float64).reshape(-1, 1) for a in (u, v, p))
        mask = ~np.isnan(p_t)
        err = lambda t, q: 100.0 * np.linalg.norm(t - q) / np.linalg.norm(t)
        p64 = p_pred.astype(np.float64)
        # steady NS defines p only up to an additive constant; report the
        # raw error (what the reference computes) AND the gauge-corrected
        # one (best-fit constant removed — the physically meaningful metric)
        shift = float(np.mean(p_t[mask] - p64[mask]))
        errors = {
            "u": err(u_t, u_pred.astype(np.float64)),
            "v": err(v_t, v_pred.astype(np.float64)),
            "p": err(p_t[mask], p64[mask]),
            "p_gauge": err(p_t[mask], p64[mask] + shift),
            "p_shift": shift,
        }
        if self.rank == 0 and log:
            self.logger.info(
                "Error u: %.3f %%  v: %.3f %%  p: %.3f %% "
                "(gauge-corrected %.3f %%, shift %.4f)"
                % (errors["u"], errors["v"], errors["p"],
                   errors["p_gauge"], shift))
        return errors

    def test(self, x, y, u, v, p, loop=None, save_dir=None):
        """Predict the full grid, report errors, dump a .mat result file
        (parity: ev-NSFnet/pinn_solver.py:695-740)."""
        import scipy.io

        errors = self.evaluate(x, y, u, v, p)
        u_pred, v_pred, p_pred, e_pred = self.neural_net_u(x, y)
        side = int(round(np.sqrt(np.asarray(x).size)))
        shape = (side, side)
        out_dir = save_dir or os.path.join(
            self.checkpoint_path, f"Re{self.Re:g}", "test_result")
        extra = {}
        if self.formulation == "streamfunction":
            # the raw net psi — EXACT streamlines of the predicted flow
            pts = jnp.concatenate(
                [jnp.asarray(x, jnp.float32).reshape(-1, 1),
                 jnp.asarray(y, jnp.float32).reshape(-1, 1)], axis=1)
            psi = self.net.apply(self.state.params, pts)[:, 0]
            extra["PSI_pred"] = np.asarray(psi).reshape(shape)
        if self.rank == 0:
            os.makedirs(out_dir, exist_ok=True)
            scipy.io.savemat(
                os.path.join(out_dir, f"cavity_result_loop_{loop}.mat"),
                {
                    **extra,
                    "U_pred": np.asarray(u_pred).reshape(shape),
                    "V_pred": np.asarray(v_pred).reshape(shape),
                    "P_pred": np.asarray(p_pred).reshape(shape),
                    "E_pred": np.asarray(e_pred).reshape(shape),
                    "error_u": errors["u"], "error_v": errors["v"],
                    "error_p": errors["p"],
                    "error_p_gauge": errors["p_gauge"],
                    "lam_bcs": self.alpha_b, "lam_equ": self.alpha_e,
                })
        return errors

    # ---------------------------------------------------------- persistence

    def attach_eval_data(self, fields) -> None:
        """Register the DNS evaluation fields (x, y, u, v, p arrays) so the
        stall detector can track the FIELD error instead of the equation
        loss (stall_metric='eval_error'). At the late-campaign 1e-6 loss
        plateau the eq-loss track is flat even while the DNS error descends
        linearly — the ext2 X2 stage was false-stall-advanced on a 0.24%
        eq-loss gain while the error was dropping -0.12 pts/25k epochs
        (artifacts/re4000_ext2_trajectory.csv). Error is the quantity the
        curriculum is actually driving; when attached, it is the honest
        stall signal."""
        self._eval_fields = fields

    def attach_dataset(self, dataset) -> None:
        """Register the collocation sampler (CavityData) so its draw state
        rides along in checkpoint metadata — a watchdog resume during a
        resample-each-stage / LM-resample campaign then replays the
        identical point sequence (SURVEY §5.4)."""
        self.dataset = dataset

    def _ckpt_dir(self) -> str:
        """Directory-name parity with ev-NSFnet/pinn_solver.py:742-747."""
        nn = f"{self.layers}x{self.hidden_size}_Nf{int(self.N_f/1000)}k"
        lam = f"lamB{self.alpha_b:g}_alpha{self.alpha_evm:g}{self.current_stage}"
        return os.path.join(self.checkpoint_path, f"Re{self.Re:g}", f"{nn}_{lam}")

    def save(self, filename: str, directory: Optional[str] = None):
        """Write a full-state checkpoint (rank 0 writes; EVERY rank gets the
        path back so crash auto-resume can roll back consistently on all
        processes — the path is deterministic across ranks)."""
        path = os.path.join(directory or self._ckpt_dir(), filename)
        state = self.state
        if jax.process_count() > 1 and state.vis_t_minus is not None:
            # the vis_t carry is row-sharded across PROCESSES — rank 0 alone
            # cannot device_get it. Gather collectively (all ranks reach
            # this; only rank 0 writes below).
            from jax.experimental import multihost_utils

            vtm = multihost_utils.process_allgather(state.vis_t_minus,
                                                    tiled=True)
            state = state._replace(vis_t_minus=np.asarray(vtm))
        if self.rank != 0:
            return path
        meta = {
            "global_step": self.global_step,
            "Re": self.Re,
            "alpha_evm": self.alpha_evm,
            "alpha_b": self.current_alpha_b,
            "stage": self.current_stage,
            # architecture stamp so --init-from can rebuild the donor
            # template without being told the shape (train.py warm-start)
            "layers": self.layers,
            "hidden_size": self.hidden_size,
            "backbone": self.backbone,
            "formulation": self.formulation,
        }
        if self.evm:
            meta["layers_1"] = self.layers_1
            meta["hidden_size_1"] = self.hidden_size_1
        ds = getattr(self, "dataset", None)
        if ds is not None:
            meta["sampler"] = ds.get_state()
        ckpt.save_state(path, state, metadata=meta)
        if self._loss_history:
            import scipy.io

            hist = np.asarray(self._loss_history, dtype=np.float64)
            scipy.io.savemat(
                os.path.join(os.path.dirname(path), "eq_losses.mat"),
                {"step": hist[:, 0], "total": hist[:, 1], "eq": hist[:, 2],
                 "bc": hist[:, 3], "eq1": hist[:, 4], "eq2": hist[:, 5],
                 "eq3": hist[:, 6], "eq4": hist[:, 7]})
        return path

    def load(self, path: str):
        self._ensure_vis_shape_for_load()
        meta = ckpt.load_metadata(path)
        if meta and meta.get("formulation", "velocity") != self.formulation:
            # flax.from_bytes would silently restore the foreign-head
            # params into this solver's template (the shapes can even
            # coincide) — the net would then train garbage physics
            raise ValueError(
                f"checkpoint {path} was written by a "
                f"{meta.get('formulation', 'velocity')!r}-formulation "
                f"solver; this solver is {self.formulation!r} (the heads "
                f"predict different quantities)")
        if meta:
            # Architecture guard: flax.from_bytes restores the SERIALIZED
            # leaves into the template pytree even when shapes differ (the
            # tuples line up structurally), so an h160 checkpoint loaded
            # into an h224 solver would silently run as an h160 net while
            # every stamp (save metadata, widen donors, perf accounting)
            # claims h224. Cross-width transfer is the driver's job
            # (train.py --init-from, Net2Net widen) — load() is exact.
            mine = {"backbone": self.backbone, "layers": self.layers,
                    "hidden_size": self.hidden_size,
                    "layers_1": self.layers_1,
                    "hidden_size_1": self.hidden_size_1}
            bad = {k: (meta[k], mine[k]) for k, v in mine.items()
                   if k in meta and meta[k] != v}
            if bad:
                raise ValueError(
                    f"checkpoint {path} architecture does not match this "
                    f"solver: " + ", ".join(
                        f"{k}={ck!r} (ckpt) vs {sv!r} (solver)"
                        for k, (ck, sv) in sorted(bad.items())) +
                    " — use train.py --init-from for cross-architecture "
                    "warm starts (function-preserving Net2Net widen)")
        self.state = ckpt.restore_state(path, self.state)
        if meta:
            self.global_step = int(meta.get("global_step", self.global_step))
            self.current_stage = meta.get("stage", self.current_stage)
            if "alpha_b" in meta:  # adaptive bc-weight survives resume
                self.current_alpha_b = float(meta["alpha_b"])
        vtm = self.state.vis_t_minus
        if vtm is not None and self._eq is not None:
            # A checkpoint's carry uses the WRITER's batch padding (e.g.
            # TILE-padded from the Pallas engine); re-pad the real rows to
            # THIS engine's padding — otherwise a foreign shape would later
            # trip _build_batch's guard and silently replace the converged
            # carry with a fresh init.
            n_f = self._eq[0].shape[0]
            if vtm.shape[0] < n_f:
                # the writer trained on FEWER collocation points than this
                # solver holds; padding the carry with the vis_t0 cap would
                # fabricate maximal eddy viscosity for the missing rows —
                # recompute the whole carry from the restored EVM net instead
                self.logger.warning(
                    "restored vis_t carry has %d rows < current %d "
                    "collocation points — reinitializing from the restored "
                    "EVM net" % (vtm.shape[0], n_f))
                self._init_vis_t()
                rows = self._vis_t_init
            else:
                rows = np.asarray(vtm)[:n_f]
            vtm = pmesh.pad_rows(rows, self._eq_pad_size(n_f), self.vis_t0)
        rep = pmesh.replicated_sharding(self.mesh)
        self.state = self.state._replace(
            params=jax.device_put(self.state.params, rep),
            params_evm=(jax.device_put(self.state.params_evm, rep)
                        if self.evm else None),
            opt_main=jax.device_put(self.state.opt_main, rep),
            opt_evm=(jax.device_put(self.state.opt_evm, rep) if self.evm else None),
            vis_t_minus=(pmesh.shard_batch(self.mesh, vtm)
                         if vtm is not None else None),
        )

    def save_torch(self, path: str) -> str:
        """Export the live networks as reference-format torch ``.pth``
        state_dicts (main net at ``path``, EVM net at ``<path>_evm`` —
        the reference's own sibling convention), so models trained in
        this framework replay through the reference's tooling
        (ev-NSFnet/test.py:27-99). Plain-MLP velocity nets only: FCNet
        has no Fourier embedding, KAN, or (psi, p) head."""
        from nsfnet_tpu.utils import torch_import as ti

        if (self.backbone != "mlp"
                or getattr(self.net, "fourier_features", 0)
                or self.formulation != "velocity"):
            raise ValueError(
                ".pth export requires the plain velocity-formulation MLP "
                "(the reference's FCNet predicts (u, v, p) directly)")
        params = jax.device_get(self.state.params)
        params_evm = (jax.device_get(self.state.params_evm)
                      if self.evm else None)
        return ti.save_torch_params(params, path, params_evm)

    def load_torch(self, net_params: str, net_params_1: Optional[str] = None):
        """Import reference-format torch ``.pth`` state_dicts (the published
        checkpoints: bare FCNet state_dicts, ev-NSFnet/pinn_solver.py:108-120)
        into the live state. Only params are imported — the reference never
        checkpoints optimizer moments or vis_t, so those reinitialize exactly
        as a reference restart would. When ``net_params_1`` is omitted, the
        reference's ``<net_params>_evm`` sibling is used if present."""
        from nsfnet_tpu.utils import torch_import as ti

        if self.backbone != "mlp" or getattr(self.net, "fourier_features", 0):
            raise ValueError(".pth import requires the plain MLP backbone "
                             "(the reference's FCNet)")
        params = ti.load_torch_params(net_params)
        expect = tuple(tuple(w.shape) for w, _ in self.state.params)
        got = ti.params_shapes(params)
        if got != expect:
            raise ValueError(
                f"imported net shapes {got} != configured {expect} — check "
                "layers/hidden_size against the checkpoint's architecture")
        rep = pmesh.replicated_sharding(self.mesh)
        params = jax.device_put(
            tuple((jnp.asarray(w), jnp.asarray(b)) for w, b in params), rep)
        params_evm = self.state.params_evm
        if self.evm:
            if net_params_1 is None and os.path.exists(net_params + "_evm"):
                net_params_1 = net_params + "_evm"
            if not net_params_1 and self.rank == 0:
                self.logger.warning(
                    f"no EVM state_dict given and {net_params}_evm does not "
                    "exist — the EVM net keeps its RANDOM initialization "
                    "(vis_t / Re_eff will be meaningless until it trains)")
            if net_params_1:
                pe = ti.load_torch_params(net_params_1)
                expect_e = tuple(tuple(w.shape) for w, _ in params_evm)
                if ti.params_shapes(pe) != expect_e:
                    raise ValueError(
                        f"imported EVM shapes {ti.params_shapes(pe)} != "
                        f"configured {expect_e}")
                params_evm = jax.device_put(
                    tuple((jnp.asarray(w), jnp.asarray(b)) for w, b in pe), rep)
        # fresh optimizer moments (reference restart semantics) + vis_t from
        # the imported EVM net on the next batch build
        self.state = self.state._replace(
            params=params,
            params_evm=params_evm,
            opt_main=jax.device_put(self.tx_main.init(params), rep),
            opt_evm=(jax.device_put(self.tx_evm.init(params_evm), rep)
                     if self.evm else None),
            vis_t_minus=None,
        )
        if self._eq is not None and self.evm:
            self._init_vis_t()
            self._vis_stale = True
        self._dirty = True
        if self.rank == 0:
            self.logger.info(
                f"imported torch params from {net_params}"
                + (f" + {net_params_1}" if net_params_1 else ""))

    def _ensure_vis_shape_for_load(self):
        # restore needs a template with the right vis_t shape if data is set
        if self.evm and self.state.vis_t_minus is None and self._eq is not None:
            self._build_batch()

    # --------------------------------------------------------------- logging

    def _print_log(self, m, done, num_epoch, avg_it_s, interval_it_s,
                   pts_per_step, stage_elapsed, total_elapsed, lr):
        if self.rank != 0:
            return
        self._loss_history.append((
            self.global_step, float(m.total), float(m.equation),
            float(m.boundary), float(m.eq1), float(m.eq2), float(m.eq3),
            float(m.eq4)))
        re_now = getattr(self, "current_re", self.Re)
        re_eff = 1.0 / (1.0 / re_now + float(m.vis_t_mean)) if self.evm else re_now
        throughput = interval_it_s * pts_per_step
        # interval rate, not the stage average: after a mid-stage resume
        # `done` includes epochs restored from the checkpoint, which
        # inflates the average and makes an avg-based eta absurdly short
        eta = (num_epoch - done) / max(interval_it_s, 1e-9)
        width = 30
        filled = int(done / num_epoch * width)
        bar = "#" * filled + " " * (width - filled)
        self.logger.info(
            f"[{self.current_stage}] {done:>7d}/{num_epoch:<7d} "
            f"{done/num_epoch*100:6.2f}% |{bar}|")
        self.logger.info(
            f"  loss: total={float(m.total):.3e} eq={float(m.equation):.3e} "
            f"bc={float(m.boundary):.3e} sup={float(m.supervised):.3e}")
        self.logger.info(
            f"        eq1={float(m.eq1):.2e} eq2={float(m.eq2):.2e} "
            f"eq3={float(m.eq3):.2e} eq4={float(m.eq4):.2e}")
        self.logger.info(
            f"  time: stage={stage_elapsed:.1f}s total={total_elapsed:.1f}s "
            f"it/s={avg_it_s:.2f} (interval {interval_it_s:.2f}) eta={eta:.0f}s")
        mem_line = ""
        try:  # device memory (parity with torch.cuda.memory_allocated logging)
            stats = self.mesh.devices.flat[0].memory_stats()
            if stats:
                used = stats.get("bytes_in_use", 0) / 1024**2
                limit = stats.get("bytes_limit", 0) / 1024**2
                mem_line = f" mem={used:.0f}/{limit:.0f}MB"
        except Exception:
            pass
        self.logger.info(
            f"  perf: throughput={throughput:,.0f} pts/s lr={lr:.2e} "
            f"Re_eff={re_eff:.1f} alpha_evm={self.alpha_evm}{mem_line}")
        if self.tb_writer is not None:
            w, s = self.tb_writer, self.global_step
            w.add_scalar("loss/total", float(m.total), s)
            w.add_scalar("loss/boundary", float(m.boundary), s)
            w.add_scalar("loss/eq_total", float(m.equation), s)
            w.add_scalar("loss/eq1", float(m.eq1), s)
            w.add_scalar("loss/eq2", float(m.eq2), s)
            w.add_scalar("loss/eq3", float(m.eq3), s)
            w.add_scalar("loss/eq4_entropy", float(m.eq4), s)
            w.add_scalar("loss/supervision", float(m.supervised), s)
            w.add_scalar("physics/Re_eff", re_eff, s)
            w.add_scalar("physics/alpha_evm", self.alpha_evm, s)
            w.add_scalar("perf/throughput_pts_per_s", throughput, s)
            w.add_scalar("perf/avg_iter_s", avg_it_s, s)
            w.add_scalar("perf/interval_iter_s", interval_it_s, s)
            w.add_scalar("lr", lr, s)


# The reference class name (typo preserved: ev-NSFnet/pinn_solver.py:27) as a
# drop-in alias.
PysicsInformedNeuralNetwork = PINNSolver
