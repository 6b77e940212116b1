"""Training driver (parity with ev-NSFnet/train.py:74-224).

Usage:
    python -m nsfnet_tpu.train --config configs/re5000_production.yaml [--dry-run]

Flow: config -> distributed bring-up -> solver -> data -> supervision
sampling -> staged training loop with per-stage evaluate.
"""

from __future__ import annotations

import argparse
import os
import signal
import time

import numpy as np

from nsfnet_tpu.config import ConfigManager
from nsfnet_tpu.data.cavity import CavityData
from nsfnet_tpu.logger import get_logger
from nsfnet_tpu.parallel.mesh import initialize_distributed
from nsfnet_tpu.training.solver import PINNSolver
from nsfnet_tpu.utils.tensorboard import ScalarWriter


class GracefulStop(Exception):
    """Raised by the SIGTERM handler between device dispatches.

    Python only delivers signals at bytecode boundaries, so the handler
    fires AFTER the in-flight jit dispatch returns — the device RPC is
    never abandoned mid-call (a SIGKILL mid-dispatch has wedged the remote
    TPU worker; see CLAUDE.md). The driver catches this, checkpoints the
    last completed state, and exits with code 3 so the watchdog can tell
    a graceful deadline stop from a crash.
    """


def _install_sigterm_handler():
    def _on_sigterm(signum, frame):
        raise GracefulStop()

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # main() invoked off the main thread (embedding/tests):
        # graceful stop is unavailable, default TERM behavior applies


def parse_args():
    p = argparse.ArgumentParser(description="NSFnet-TPU training")
    p.add_argument("--config", type=str, default="configs/re5000_production.yaml")
    p.add_argument("--dry-run", action="store_true",
                   help="print config & stages then exit (ev-NSFnet/train.py:18)")
    p.add_argument("--resume", type=str, default=None,
                   help="path to a full-state checkpoint to resume from")
    p.add_argument("--init-from", type=str, default=None,
                   help="warm-start: load ONLY the network params from this "
                        "checkpoint (fresh optimizer, schedule from step 0); "
                        "if the config's hidden_size is wider than the "
                        "checkpoint's, the net is widened function-"
                        "preservingly (Net2Net) first")
    p.add_argument("--init-hidden", type=int, default=0,
                   help="hidden size of the --init-from checkpoint when its "
                        "metadata predates architecture stamping (default: "
                        "the config's hidden_size)")
    p.add_argument("--profile", type=str, default=None,
                   help="capture an XLA profiler trace of the first stage "
                        "into this directory (TensorBoard profile plugin)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the Re=100 smoke config is "
                        "CPU-runnable; env vars can't override the platform "
                        "once the TPU plugin is registered)")
    return p.parse_args()


def build_solver(cfg, mesh=None) -> PINNSolver:
    variant = cfg.model_variant
    return PINNSolver(
        Re=cfg.physics.Re,
        layers=cfg.network.layers,
        layers_1=cfg.network.layers_1 if variant == "ev-nsfnet" else None,
        hidden_size=cfg.network.hidden_size,
        hidden_size_1=cfg.network.hidden_size_1,
        fourier_features=cfg.network.fourier_features,
        fourier_sigma=cfg.network.fourier_sigma,
        N_f=cfg.training.N_f,
        alpha_evm=cfg.physics.alpha_evm,
        bc_weight=cfg.physics.bc_weight,
        eq_weight=cfg.physics.eq_weight,
        supervised_data_weight=(cfg.supervision.loss_weight
                                if cfg.supervision.enabled else 0.0),
        entropy_residual_weight=cfg.physics.entropy_residual_weight,
        evm=(variant == "ev-nsfnet"),
        backbone=cfg.network.backbone if variant != "kan" else "kan",
        formulation=cfg.network.formulation,
        kan_width=tuple(cfg.network.kan_width),
        kan_grid=cfg.network.kan_grid,
        kan_k=cfg.network.kan_k,
        seed=cfg.training.seed,
        mesh=mesh,
        mesh_devices=cfg.training.mesh_devices,
        matmul_precision=cfg.training.matmul_precision,
        evm_update_freq=cfg.training.evm_update_freq,
        log_interval=cfg.training.log_interval,
        microbatches=cfg.training.microbatches,
        lm_microbatches=cfg.training.lm_microbatches,
        loss_mode=cfg.training.loss_mode,
        checkpoint_freq=cfg.training.checkpoint_freq,
        checkpoint_path=cfg.training.checkpoint_dir,
        adaptive_bc_weight=cfg.training.adaptive_bc_weight,
        adaptive_bc_ema=cfg.training.adaptive_bc_ema,
        adaptive_bc_max=cfg.training.adaptive_bc_max,
        max_chunk=cfg.training.max_chunk,
    )


_ACTIVE_KEEPALIVE_STOP = None  # the running startup-keepalive's stop event


def main(argv=None):
    args = parse_args() if argv is None else argv
    if os.path.exists(args.config):
        cm = ConfigManager.from_file(args.config)
    else:
        print(f"config {args.config} not found; using built-in defaults")
        cm = ConfigManager()
    cfg = cm.config

    import jax

    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    else:
        initialize_distributed()

    # persistent compile cache (first compile of the train step is slow)
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.getcwd(), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rank = jax.process_index()
    logger = get_logger(cfg.experiment_name, rank=rank)
    problems = cm.validate()
    if rank == 0:
        logger.header("Experiment Configuration")
        cm.print_config(printer=logger.info)
        for w in problems:
            logger.warning(w)
    if args.dry_run:
        logger.info("dry-run complete (no training)")
        return 0
    if problems:
        logger.error(f"invalid configuration ({len(problems)} problem(s) above); aborting")
        return 2

    # Startup keepalive: the first remote-TPU compiles (initial vis_t
    # forward, the first scan-chunked train dispatch) can silently block
    # for 10-20 min — longer than run_with_watchdog.sh's stale window, so
    # a cold start used to be stale-killed MID-COMPILE and crash-loop (the
    # 2026-08-20 morning lost ~1.5 h to exactly this). A daemon thread
    # refreshes the watchdog's signal (log-file mtime via stdout) whenever
    # nothing has been written for a while, but only during the first
    # STARTUP_KEEPALIVE_MAX seconds of process life — after that, silence
    # again means a hung dispatch and the watchdog must act.
    import threading

    def _startup_keepalive(stop: threading.Event, max_s: float = 2400.0,
                           quiet_s: float = 240.0):
        t0 = time.time()
        while not stop.wait(60.0):
            if time.time() - t0 > max_s:
                return
            try:
                age = time.time() - os.fstat(2).st_mtime
            except OSError:
                return  # stderr is not a regular file; nothing to refresh
            if age > quiet_s:
                # stderr (the console-log channel): stdout stays reserved
                # for machine-readable output
                import sys as _sys

                print(f"[keepalive] startup still initializing "
                      f"(t+{int(time.time() - t0)}s; remote TPU compiles "
                      f"can take 10-20 min)", file=_sys.stderr, flush=True)

    # one live keepalive per process: in-process callers (tests) invoke
    # main() repeatedly — stop the previous thread so it can't keep
    # printing into a captured stderr for its full bound
    global _ACTIVE_KEEPALIVE_STOP
    if _ACTIVE_KEEPALIVE_STOP is not None:
        _ACTIVE_KEEPALIVE_STOP.set()
    _keepalive_stop = _ACTIVE_KEEPALIVE_STOP = threading.Event()
    if rank == 0:
        threading.Thread(target=_startup_keepalive, args=(_keepalive_stop,),
                         daemon=True).start()

    solver = build_solver(cfg)
    # Startup ends at the first completed training log — from then on the
    # trainer logs every log_interval and silence means a HUNG dispatch,
    # which the keepalive must not mask from the watchdog (a masked hang
    # costs the keepalive's full bound instead of one stale window; seen
    # live 14:10-14:21 on 2026-08-20).
    solver.on_first_log = _keepalive_stop.set
    if rank == 0 and cfg.training.enable_tensorboard:
        run_name = f"{cfg.experiment_name}_{time.strftime('%Y%m%d_%H%M%S')}"
        solver.tb_writer = ScalarWriter(
            os.path.join(cfg.training.tb_log_dir, run_name),
            enable_tensorboard=True)

    data = CavityData(
        N_f=cfg.training.N_f,
        sort_training_points=cfg.training.sort_training_points,
        sdf_enabled=cfg.training.sdf_weighting.enabled,
        sdf_min_weight=cfg.training.sdf_weighting.min_weight,
        sdf_decay=cfg.training.sdf_weighting.decay,
        coord_transform=cfg.training.coordinate_transform,
        seed=cfg.training.seed,
    )
    solver.attach_dataset(data)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.set_coordinate_transform(data.coord_scale)

    eval_fields = None
    if cfg.eval_data and os.path.exists(cfg.eval_data):
        eval_fields = data.evaluate_data(cfg.eval_data)
        solver.attach_eval_data(eval_fields)
        logger.info(f"loaded DNS eval data: {cfg.eval_data} "
                    f"({eval_fields[0].shape[0]} points)")
    elif cfg.eval_data:
        logger.warning(f"eval data {cfg.eval_data} missing; skipping evaluation")

    # Supervision: sample DNS points with a fixed seed — every host draws the
    # same indices (replaces the reference's rank-0 broadcast,
    # ev-NSFnet/train.py:164-172).
    if cfg.supervision.enabled and cfg.supervision.num_samples > 0 and eval_fields:
        xs, ys, us, vs, ps = eval_fields
        n = min(cfg.supervision.num_samples, xs.shape[0])
        idx = np.random.default_rng(cfg.training.seed).choice(
            xs.shape[0], size=n, replace=False)
        solver.set_supervised_data((xs[idx], ys[idx], us[idx], vs[idx], ps[idx]))
        solver.set_supervised_loss_weight(cfg.supervision.loss_weight)
        logger.info(f"supervision: {n} DNS samples, weight={cfg.supervision.loss_weight}")
    else:
        solver.clear_supervised_data()
        solver.set_supervised_loss_weight(0.0)

    init_from = getattr(args, "init_from", None)
    if init_from and args.resume:
        logger.error("--init-from and --resume are mutually exclusive")
        return 2
    if init_from:
        # Warm-start (transfer) path: install the donor checkpoint's network
        # weights only — optimizer state, step counter and vis_t carry start
        # fresh, and the config's stage schedule runs from the top. Used to
        # continue a finished campaign at a wider architecture (the round-2
        # capacity-ladder recipe as a first-class driver flag).
        import copy as _copy

        from nsfnet_tpu.models.mlp import widen_mlp_params
        from nsfnet_tpu.parallel import mesh as pmesh
        from nsfnet_tpu.training import checkpoint as ckpt_mod

        # Donor architecture: metadata stamp -> shapes read straight from
        # the serialized state (pre-stamp checkpoints) -> explicit flag.
        # flax.from_bytes silently restores mismatched shapes into a
        # template, so getting this wrong must be caught HERE, not at the
        # first (post-compile) train step.
        meta = ckpt_mod.load_metadata(init_from) or {}
        arch = ckpt_mod.peek_architecture(init_from) or {}
        donor_hidden = int(meta.get("hidden_size") or arch.get("hidden_size")
                           or getattr(args, "init_hidden", 0)
                           or cfg.network.hidden_size)
        donor_layers = int(meta.get("layers") or arch.get("layers")
                           or cfg.network.layers)
        if donor_layers != cfg.network.layers:
            logger.error(
                f"--init-from: donor has {donor_layers} layers, config has "
                f"{cfg.network.layers} — depth transfer is not supported")
            return 2
        if donor_hidden > cfg.network.hidden_size:
            logger.error(
                f"--init-from: donor hidden_size {donor_hidden} exceeds the "
                f"config's {cfg.network.hidden_size} — widening only; use a "
                f"config at least as wide as the donor")
            return 2
        if meta.get("backbone", "mlp") != "mlp" or cfg.network.backbone != "mlp":
            logger.error("--init-from supports the MLP backbone only")
            return 2
        if meta.get("formulation", "velocity") != cfg.network.formulation:
            logger.error(
                f"--init-from: donor formulation "
                f"{meta.get('formulation', 'velocity')!r} != config "
                f"{cfg.network.formulation!r} (the heads predict different "
                f"quantities — transfer would be meaningless)")
            return 2
        # EVM net: transfer requires an exact architecture match — the donor
        # template below is built at the CONFIG's hidden_size_1/layers_1, and
        # flax.from_bytes would silently restore mismatched EVM shapes into
        # it (no widening path exists for the EVM net)
        if cfg.model_variant == "ev-nsfnet":
            donor_h1 = meta.get("hidden_size_1") or arch.get("hidden_size_1")
            donor_l1 = meta.get("layers_1") or arch.get("layers_1")
            if donor_h1 is not None and (
                    int(donor_h1) != cfg.network.hidden_size_1
                    or int(donor_l1 or cfg.network.layers_1) != cfg.network.layers_1):
                logger.error(
                    f"--init-from: donor EVM net is {donor_l1}x{donor_h1}, "
                    f"config wants {cfg.network.layers_1}x"
                    f"{cfg.network.hidden_size_1} — EVM transfer requires an "
                    f"exact architecture match")
                return 2
        dcfg = _copy.deepcopy(cfg)
        dcfg.network.hidden_size = donor_hidden
        donor = build_solver(dcfg)
        donor.set_boundary_data(X=data.boundary_data())
        # reuse the solver's collocation draw: a fresh training_data() call
        # here would advance the sampler, and checkpoints would then stamp
        # sampler state for points the solver never trained on (breaking
        # bit-exact watchdog resume)
        donor.set_eq_training_data(X=solver.eq_points(),
                                   weights=data.sdf_weights)
        donor.load(init_from)
        params, params_evm = donor.state.params, donor.state.params_evm
        del donor
        if donor_hidden != cfg.network.hidden_size:
            params = widen_mlp_params(params, cfg.network.hidden_size,
                                      jax.random.PRNGKey(cfg.training.seed))
            logger.info(f"warm-start: widened h{donor_hidden} -> "
                        f"h{cfg.network.hidden_size} (function-preserving)")
        rep = pmesh.replicated_sharding(solver.mesh)
        solver.state = solver.state._replace(
            params=jax.device_put(params, rep),
            params_evm=(jax.device_put(params_evm, rep)
                        if params_evm is not None else None))
        solver.refresh_vis_t()
        logger.info(f"warm-start from {init_from}: params only; fresh "
                    f"optimizer, schedule from step 0")

    start_step = 0
    sampler_replayed = False
    if args.resume:
        # Sampler state must be restored BEFORE load(): the replayed current
        # point set goes in first (set_eq_training_data resets the vis_t
        # carry), then load() installs the checkpointed carry that matches
        # those exact points — bit-exact resume even mid-resample-campaign.
        from nsfnet_tpu.training import checkpoint as ckpt_mod

        meta = ckpt_mod.load_metadata(args.resume)
        if meta and meta.get("sampler") is not None:
            data.set_state(meta["sampler"])
            solver.set_eq_training_data(X=data.training_data(),
                                        weights=data.sdf_weights)
            sampler_replayed = True
            logger.info("sampler state restored; collocation points replayed")
        solver.load(args.resume)
        start_step = solver.global_step
        logger.info(f"resumed from {args.resume} at step {start_step}")

    stages = cfg.training.training_stages
    total = sum(st.epochs for st in stages)
    logger.info(f"training: total epochs={total:,} over {len(stages)} stages")
    _install_sigterm_handler()
    try:
        cum = 0
        for i, st in enumerate(stages):
            stage_start_epochs = cum
            stage_end = cum + st.epochs
            if start_step >= stage_end:
                cum = stage_end
                continue  # stage fully covered by the restored global step
            epochs = stage_end - max(start_step, cum)
            cum = stage_end
            logger.stage(st.name, st.alpha, epochs, st.lr)
            solver.current_stage = st.name
            solver.set_alpha_evm(st.alpha)
            # a mid-stage resume keeps the stage's existing points (replayed
            # from sampler metadata when present) — resampling here would
            # train the remainder on a different draw
            resumed_mid_stage = bool(args.resume) \
                and start_step > stage_start_epochs and st.optimizer == "adam"
            if (resumed_mid_stage and cfg.training.resample_each_stage
                    and not sampler_replayed):
                # pre-sampler-metadata checkpoint: the writer's draw cannot
                # be reconstructed; the remainder trains on this process's
                # draw-0 points with the restored carry (approximate resume)
                logger.warning(
                    "mid-stage resume without sampler metadata under "
                    "resample_each_stage — collocation points may differ "
                    "from the writer's (approximate resume)")
            if cfg.training.resample_each_stage and i > 0 and not resumed_mid_stage:
                # fresh Latin-Hypercube draw per stage (extension; the
                # reference keeps one fixed point set for the whole run).
                # Same shapes -> no recompilation. With rar_pool_mult > 0
                # the redraw is residual-aware: score a candidate pool with
                # the current nets' PDE residual and keep the worst points
                # (kept indices ride in checkpoint metadata, so mid-stage
                # resume replays the set).
                # rar_schedule "first": residual-aware only on the run's
                # first redraw (stage index 1 — right after a warm start,
                # where it measurably helps); later redraws are plain
                # uniform (repeated RAR redraws random-walked a converged
                # Re=5000 solution ~+1.8 err pts/stage — VALIDATION.md)
                use_rar = cfg.training.rar_pool_mult > 0 and (
                    cfg.training.rar_schedule == "every" or i == 1)
                if use_rar:
                    X = data.rar_training_data(
                        solver.residuals_at,
                        pool_mult=cfg.training.rar_pool_mult,
                        top_frac=cfg.training.rar_top_frac)
                    logger.info(
                        f"RAR resample: scored pool "
                        f"{cfg.training.rar_pool_mult}x{cfg.training.N_f:,}, "
                        f"kept worst {cfg.training.rar_top_frac:.0%}")
                else:
                    X = data.training_data()
                solver.set_eq_training_data(X=X, weights=data.sdf_weights)
            # mid-stage resume trains the FULL stage length starting at the
            # restored epoch_in_stage so the EVM freeze phase stays aligned
            n_epoch = st.epochs if resumed_mid_stage else epochs
            train_kw = dict(num_epoch=n_epoch, lr=st.lr, optimizer=st.optimizer,
                            resume_in_stage=resumed_mid_stage,
                            advance_on_stall=st.advance_on_stall,
                            stall_threshold=cfg.training.stall_threshold,
                            stall_window=cfg.training.stall_window,
                            stall_min_epochs=st.resolved_stall_min(),
                            stall_metric=cfg.training.stall_metric,
                            # per-stage physics overrides (0 = inherit) —
                            # runtime scalars, so a staged-Re continuation
                            # curriculum never retraces
                            Re=st.Re or None,
                            bc_weight=st.bc_weight or None)
            if i == 0 and args.profile:
                from nsfnet_tpu.utils.profiling import xla_trace

                with xla_trace(args.profile):
                    solver.train(**train_kw)
            else:
                solver.train(**train_kw)
            if eval_fields:
                solver.evaluate(*eval_fields)
        solver.save("model_final.ckpt")  # final state, even off ckpt cadence
    except GracefulStop:
        # Deadline/operator stop: the in-flight dispatch already completed
        # (signal handlers run between bytecodes), so solver.state is the
        # last finished chunk — checkpoint it and hand the chip back.
        if jax.process_count() == 1:
            path = solver.save(f"sigterm_step{solver.global_step}.ckpt")
            logger.info(f"SIGTERM: checkpointed {path}; exiting for resume")
        else:
            # solver.save reaches a collective; a single-rank signal would
            # deadlock a pod run — rely on the cadence checkpoints instead
            logger.info("SIGTERM: multi-process run, exiting without a "
                        "collective save (resume from the newest cadence "
                        "checkpoint)")
        if solver.tb_writer is not None:
            solver.tb_writer.close()
        return 3
    finally:
        _keepalive_stop.set()
    logger.header("Training Completed")
    if solver.tb_writer is not None:
        solver.tb_writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
