"""CLI driver integration tests: train.py end-to-end on a tiny config
(incl. dry-run, supervision sampling, eval, checkpointing) and the test.py
checkpoint-sweep driver."""

import argparse
import glob
import os
import textwrap

import numpy as np
import pytest
import scipy.io


def _write_dns_mat(path, n=9):
    g = np.linspace(0, 1, n)
    X, Y = np.meshgrid(g, g)
    scipy.io.savemat(path, {
        "X_ref": X, "Y_ref": Y,
        "U_ref": np.sin(X) * np.cos(Y),
        "V_ref": -np.cos(X) * np.sin(Y),
        "P_ref": np.sin(X + Y),
    })


def _tiny_config(tmp_path, **over):
    mat = str(tmp_path / "dns.mat")
    _write_dns_mat(mat)
    text = textwrap.dedent(f"""
        experiment_name: tiny
        model_variant: ev-nsfnet
        physics: {{Re: 100, alpha_evm: 0.03}}
        network: {{layers: 2, layers_1: 2, hidden_size: 12, hidden_size_1: 8}}
        eval_data: {mat}
        supervision: {{enabled: true, num_samples: 16, loss_weight: 0.5}}
        training:
          N_f: 128
          log_interval: 50
          enable_tensorboard: false
          sort_training_points: false
          checkpoint_freq: 60
          checkpoint_dir: {tmp_path}/results
          training_stages:
            - {{alpha: 0.03, epochs: 60, lr: 1.0e-3, name: S1}}
            - {{alpha: 0.01, epochs: 10, lr: 1.0e-4, name: S2}}
    """)
    p = tmp_path / "tiny.yaml"
    p.write_text(text)
    return str(p)


def _args(config, **kw):
    base = dict(config=config, dry_run=False, resume=None, profile=None)
    base.update(kw)
    return argparse.Namespace(**base)


def test_train_driver_dry_run(tmp_path, capsys):
    from nsfnet_tpu.train import main

    cfg = _tiny_config(tmp_path)
    assert main(_args(cfg, dry_run=True)) == 0


def test_train_driver_end_to_end_and_sweep(tmp_path, monkeypatch):
    from nsfnet_tpu.train import main

    monkeypatch.chdir(tmp_path)
    cfg = _tiny_config(tmp_path)
    assert main(_args(cfg)) == 0
    ckpts = glob.glob(str(tmp_path / "results" / "**" / "*.ckpt"), recursive=True)
    assert ckpts, "training should have checkpointed at step 60"

    # checkpoint-sweep evaluation driver (reference test.py parity)
    import sys

    from nsfnet_tpu import test as sweep

    out_dir = str(tmp_path / "sweep_out")
    monkeypatch.setattr(sys, "argv", [
        "test", "--config", cfg,
        "--checkpoints", str(tmp_path / "results" / "**" / "*.ckpt"),
        "--out", out_dir,
    ])
    assert sweep.main() == 0
    mats = glob.glob(os.path.join(out_dir, "*.mat"))
    assert mats, "sweep should dump .mat result files"
    m = scipy.io.loadmat(mats[0])
    assert "U_pred" in m and "error_u" in m


def test_capacity_ladder_driver(tmp_path, monkeypatch):
    """capacity_ladder.py end-to-end on a tiny config: trains, widens
    function-preservingly between rungs, checkpoints per round, respects
    the rung list, and exits 0."""
    import subprocess
    import sys

    from nsfnet_tpu.train import main

    monkeypatch.chdir(tmp_path)
    cfg = _tiny_config(tmp_path)
    assert main(_args(cfg)) == 0
    ckpts = sorted(glob.glob(str(tmp_path / "results" / "**" / "*.ckpt"),
                             recursive=True), key=os.path.getmtime)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "capacity_ladder.py"),
         cfg, ckpts[-1], "--rungs", "16:1,20:1", "--steps", "4",
         "--micro", "2", "--cpu"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rung h=16 installed" in r.stderr
    assert "rung h=20 installed" in r.stderr
    saved = glob.glob(str(tmp_path / "artifacts" / "ladder" / "*.ckpt"))
    assert len(saved) == 2, saved


def _resume_config(tmp_path, name, ckpt_dir, rar=""):
    """3-stage resampling config with a mid-stage checkpoint cadence and a
    small evm_update_freq so the alternating-freeze phase is exercised."""
    mat = str(tmp_path / "dns.mat")
    if not os.path.exists(mat):
        _write_dns_mat(mat)
    text = textwrap.dedent(f"""
        experiment_name: resume_{name}
        model_variant: ev-nsfnet
        physics: {{Re: 100, alpha_evm: 0.03}}
        network: {{layers: 2, layers_1: 2, hidden_size: 12, hidden_size_1: 8}}
        eval_data: {mat}
        training:
          N_f: 128
          seed: 5
          log_interval: 1000
          enable_tensorboard: false
          sort_training_points: false
          resample_each_stage: true{rar}
          evm_update_freq: 10
          checkpoint_freq: 25
          checkpoint_dir: {ckpt_dir}
          training_stages:
            - {{alpha: 0.03, epochs: 25, lr: 1.0e-3, name: S1}}
            - {{alpha: 0.02, epochs: 50, lr: 5.0e-4, name: S2}}
            - {{alpha: 0.01, epochs: 25, lr: 1.0e-4, name: S3}}
    """)
    p = tmp_path / f"resume_{name}.yaml"
    p.write_text(text)
    return str(p)


def _ckpt_at_step(run_dir, step):
    from nsfnet_tpu.training import checkpoint as ckpt_mod

    for c in glob.glob(os.path.join(run_dir, "**", "*.ckpt"), recursive=True):
        meta = ckpt_mod.load_metadata(c)
        if meta and meta.get("global_step") == step:
            return c
    raise AssertionError(f"no checkpoint at step {step} under {run_dir}")


def _load_final_state(cfg_path, run_dir, step):
    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver

    cfg = ConfigManager.from_file(cfg_path).config
    solver = build_solver(cfg)
    data = CavityData(N_f=cfg.training.N_f, sort_training_points=False,
                      seed=cfg.training.seed)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver.load(_ckpt_at_step(run_dir, step))
    return solver.state


def test_resume_mid_stage_bit_exact_with_resampling(tmp_path, monkeypatch):
    """Watchdog kill-and-resume mid-stage during a resample-each-stage
    campaign reproduces the uninterrupted run bit-exactly: the resumed
    stage replays the writer's exact collocation draw (sampler state from
    checkpoint metadata), later stages continue the draw sequence, and the
    EVM alternating-freeze phase stays aligned (resume_in_stage) —
    VERDICT r2 missing #5 / SURVEY §5.4."""
    import jax

    from nsfnet_tpu.train import main

    monkeypatch.chdir(tmp_path)
    dir_a, dir_b = str(tmp_path / "run_a"), str(tmp_path / "run_b")
    cfg_a = _resume_config(tmp_path, "a", dir_a)
    cfg_b = _resume_config(tmp_path, "b", dir_b)

    assert main(_args(cfg_a)) == 0  # uninterrupted run: steps 1..100
    # resume run: from the MID-S2 checkpoint (global step 50, S2 epoch 25 of
    # 50 — written after S2's resample, so replay actually matters)
    mid = _ckpt_at_step(dir_a, 50)
    assert main(_args(cfg_b, resume=mid)) == 0

    state_a = _load_final_state(cfg_a, dir_a, 100)
    state_b = _load_final_state(cfg_b, dir_b, 100)
    for name in ("params", "params_evm", "vis_t_minus"):
        la = jax.tree_util.tree_leaves(getattr(state_a, name))
        lb = jax.tree_util.tree_leaves(getattr(state_b, name))
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def test_resume_mid_stage_bit_exact_with_rar(tmp_path, monkeypatch):
    """Same kill-and-resume contract under RESIDUAL-AWARE resampling
    (rar_pool_mult > 0): the mid-S2 checkpoint's sampler metadata carries
    the kept-pool indices, so the resumed run reconstructs S2's
    residual-scored mixed set without the writer's params, and S3's fresh
    RAR draw re-scores with bit-identical params — end states match the
    uninterrupted run exactly."""
    import jax

    from nsfnet_tpu.train import main

    monkeypatch.chdir(tmp_path)
    # schedule 'every' so S3's redraw is also residual-scored — this test
    # covers RAR replay at BOTH boundary kinds (resumed-stage + later stage)
    rar = ("\n          rar_pool_mult: 2\n          rar_top_frac: 0.5"
           "\n          rar_schedule: every")
    dir_a, dir_b = str(tmp_path / "rar_a"), str(tmp_path / "rar_b")
    cfg_a = _resume_config(tmp_path, "rar_a", dir_a, rar=rar)
    cfg_b = _resume_config(tmp_path, "rar_b", dir_b, rar=rar)

    assert main(_args(cfg_a)) == 0
    mid = _ckpt_at_step(dir_a, 50)  # written after S2's RAR resample
    assert main(_args(cfg_b, resume=mid)) == 0

    state_a = _load_final_state(cfg_a, dir_a, 100)
    state_b = _load_final_state(cfg_b, dir_b, 100)
    for name in ("params", "params_evm", "vis_t_minus"):
        la = jax.tree_util.tree_leaves(getattr(state_a, name))
        lb = jax.tree_util.tree_leaves(getattr(state_b, name))
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def _stage_table_config(tmp_path, name, ckpt_dir, stages):
    """Like _resume_config but with an explicit stage table — for tests
    that edit the table between writer and resumer."""
    mat = str(tmp_path / "dns.mat")
    if not os.path.exists(mat):
        _write_dns_mat(mat)
    stage_lines = "\n".join(
        f"            - {{alpha: {a}, epochs: {e}, lr: {lr}, name: {n}}}"
        for (n, a, e, lr) in stages)
    text = textwrap.dedent(f"""
        experiment_name: resume_{name}
        model_variant: ev-nsfnet
        physics: {{Re: 100, alpha_evm: 0.03}}
        network: {{layers: 2, layers_1: 2, hidden_size: 12, hidden_size_1: 8}}
        eval_data: {mat}
        training:
          N_f: 128
          seed: 5
          log_interval: 1000
          enable_tensorboard: false
          sort_training_points: false
          resample_each_stage: true
          evm_update_freq: 10
          checkpoint_freq: 25
          checkpoint_dir: {ckpt_dir}
          training_stages:
{stage_lines}
    """)
    p = tmp_path / f"resume_{name}.yaml"
    p.write_text(text)
    return str(p)


def test_resume_into_extended_stage_bit_exact(tmp_path, monkeypatch):
    """Campaign-steering contract: a mid-stage checkpoint written under one
    stage table resumes bit-exactly into a config whose CURRENT stage was
    lengthened and whose later stages were retuned — the live pattern for
    extending a descending stage without restarting the campaign (e.g.
    configs/re4000_ext2.yaml's X2 hold). Stage length must not leak into
    per-step math before the edit point."""
    import jax

    from nsfnet_tpu.train import main

    monkeypatch.chdir(tmp_path)
    short = [("S1", 0.03, 25, "1.0e-3"), ("S2", 0.02, 50, "5.0e-4"),
             ("S3", 0.01, 25, "1.0e-4")]
    # S2 lengthened 50 -> 75, S3's lr retuned: total 125
    ext = [("S1", 0.03, 25, "1.0e-3"), ("S2", 0.02, 75, "5.0e-4"),
           ("S3", 0.01, 25, "2.0e-4")]
    dir_w = str(tmp_path / "ext_writer")
    dir_u = str(tmp_path / "ext_uninterrupted")
    dir_r = str(tmp_path / "ext_resumed")
    cfg_w = _stage_table_config(tmp_path, "ext_w", dir_w, short)
    cfg_u = _stage_table_config(tmp_path, "ext_u", dir_u, ext)
    cfg_r = _stage_table_config(tmp_path, "ext_r", dir_r, ext)

    assert main(_args(cfg_w)) == 0  # writer: old table, ckpt at step 50 mid-S2
    assert main(_args(cfg_u)) == 0  # uninterrupted run of the NEW table
    mid = _ckpt_at_step(dir_w, 50)
    assert main(_args(cfg_r, resume=mid)) == 0

    state_u = _load_final_state(cfg_u, dir_u, 125)
    state_r = _load_final_state(cfg_r, dir_r, 125)
    for name in ("params", "params_evm", "vis_t_minus"):
        lu = jax.tree_util.tree_leaves(getattr(state_u, name))
        lr_ = jax.tree_util.tree_leaves(getattr(state_r, name))
        assert len(lu) == len(lr_)
        for a, b in zip(lu, lr_):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def test_driver_wires_stall_advance(tmp_path, monkeypatch):
    """Config-level advance_on_stall reaches solver.train: an lr~0 stage
    with stall flags ends early (global_step still fast-forwards to the
    stage budget) and the next stage runs — the wiring the Re=5000
    stall-aware campaign config depends on."""
    import textwrap as tw

    from nsfnet_tpu.train import main

    monkeypatch.chdir(tmp_path)
    mat = str(tmp_path / "dns.mat")
    _write_dns_mat(mat)
    cfg = tmp_path / "stall.yaml"
    cfg.write_text(tw.dedent(f"""
        experiment_name: stall_e2e
        model_variant: ev-nsfnet
        physics: {{Re: 100, alpha_evm: 0.03}}
        network: {{layers: 2, layers_1: 2, hidden_size: 12, hidden_size_1: 8}}
        eval_data: {mat}
        training:
          N_f: 128
          log_interval: 10
          enable_tensorboard: false
          sort_training_points: false
          checkpoint_freq: 1000000
          checkpoint_dir: {tmp_path}/results
          stall_threshold: 0.01
          stall_window: 2
          training_stages:
            - {{alpha: 0.03, epochs: 500, lr: 1.0e-30, name: SFLAT,
                advance_on_stall: true, stall_min_epochs: 0}}
            - {{alpha: 0.02, epochs: 20, lr: 1.0e-3, name: SGO}}
    """))
    assert main(_args(str(cfg))) == 0
    # the final checkpoint carries the fast-forwarded step count: 500 + 20
    from nsfnet_tpu.training import checkpoint as ckpt_mod

    finals = glob.glob(str(tmp_path / "results" / "**" / "model_final.ckpt"),
                       recursive=True)
    assert finals
    meta = ckpt_mod.load_metadata(finals[0])
    assert meta["global_step"] == 520, meta


def test_warm_start_init_from_widens(tmp_path, monkeypatch):
    """--init-from warm start: params-only transfer from a finished run's
    checkpoint into a WIDER config — the widened net reproduces the donor
    function at step 0 (Net2Net), the optimizer/schedule start fresh, and
    the donor architecture is auto-detected from checkpoint metadata."""
    import jax

    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import build_solver, main
    from nsfnet_tpu.training import checkpoint as ckpt_mod

    monkeypatch.chdir(tmp_path)
    cfg = _tiny_config(tmp_path)
    assert main(_args(cfg)) == 0  # donor: h12, 70 epochs
    donor_ckpt = sorted(
        glob.glob(str(tmp_path / "results" / "**" / "model_final.ckpt"),
                  recursive=True), key=os.path.getmtime)[-1]
    assert ckpt_mod.load_metadata(donor_ckpt)["hidden_size"] == 12

    import textwrap as tw
    wide_cfg = tmp_path / "wide.yaml"
    wide_cfg.write_text(tw.dedent(f"""
        experiment_name: tiny_wide
        model_variant: ev-nsfnet
        physics: {{Re: 100, alpha_evm: 0.01}}
        network: {{layers: 2, layers_1: 2, hidden_size: 16, hidden_size_1: 8}}
        eval_data: {tmp_path}/dns.mat
        training:
          N_f: 128
          log_interval: 50
          enable_tensorboard: false
          sort_training_points: false
          checkpoint_freq: 1000000
          checkpoint_dir: {tmp_path}/results_wide
          training_stages:
            - {{alpha: 0.01, epochs: 10, lr: 1.0e-4, name: P1}}
    """))

    # function preservation check: donor eval == widened-net eval at step 0
    def _eval_params(cfg_path, params, params_evm):
        c = ConfigManager.from_file(cfg_path).config
        s = build_solver(c)
        d = CavityData(N_f=c.training.N_f, sort_training_points=False,
                       seed=c.training.seed)
        s.set_boundary_data(X=d.boundary_data())
        s.set_eq_training_data(X=d.training_data(), weights=d.sdf_weights)
        if params is not None:
            s.state = s.state._replace(params=params, params_evm=params_evm)
        else:
            s.load(donor_ckpt)
        return s, d, s.evaluate(*d.evaluate_data(c.eval_data))

    donor_solver, _, donor_res = _eval_params(cfg, None, None)
    from nsfnet_tpu.models.mlp import widen_mlp_params
    wide_params = widen_mlp_params(donor_solver.state.params, 16,
                                   jax.random.PRNGKey(0))
    _, _, wide_res = _eval_params(str(wide_cfg), wide_params,
                                  donor_solver.state.params_evm)
    for k in ("u", "v"):
        np.testing.assert_allclose(wide_res[k], donor_res[k], rtol=1e-4)

    # the driver path end-to-end: auto-detects h12, widens to h16, trains a
    # FRESH 10-epoch schedule
    assert main(_args(str(wide_cfg), init_from=donor_ckpt)) == 0
    finals = glob.glob(str(tmp_path / "results_wide" / "**" /
                           "model_final.ckpt"), recursive=True)
    assert finals
    meta = ckpt_mod.load_metadata(finals[0])
    assert meta["global_step"] == 10, meta  # fresh schedule, not donor's 70
    assert meta["hidden_size"] == 16, meta


def test_warm_start_peek_and_guards(tmp_path, monkeypatch):
    """--init-from on a PRE-STAMP checkpoint (no hidden_size in metadata)
    still widens correctly — the donor architecture is read from the
    serialized shapes (peek_architecture). A donor WIDER than the config
    fails fast with exit 2 (before any compile)."""
    import json

    import textwrap as tw

    from nsfnet_tpu.train import main
    from nsfnet_tpu.training import checkpoint as ckpt_mod

    monkeypatch.chdir(tmp_path)
    cfg = _tiny_config(tmp_path)
    assert main(_args(cfg)) == 0  # donor: h12
    donor_ckpt = sorted(
        glob.glob(str(tmp_path / "results" / "**" / "model_final.ckpt"),
                  recursive=True), key=os.path.getmtime)[-1]
    # simulate a checkpoint written before architecture stamping
    meta_path = donor_ckpt + ".json"
    meta = json.load(open(meta_path))
    for k in ("hidden_size", "layers", "backbone"):
        meta.pop(k, None)
    json.dump(meta, open(meta_path, "w"))
    assert ckpt_mod.peek_architecture(donor_ckpt)["hidden_size"] == 12

    wide_cfg = tmp_path / "wide2.yaml"
    wide_cfg.write_text(tw.dedent(f"""
        experiment_name: tiny_wide2
        model_variant: ev-nsfnet
        physics: {{Re: 100, alpha_evm: 0.01}}
        network: {{layers: 2, layers_1: 2, hidden_size: 16, hidden_size_1: 8}}
        eval_data: {tmp_path}/dns.mat
        training:
          N_f: 128
          log_interval: 50
          enable_tensorboard: false
          sort_training_points: false
          checkpoint_freq: 1000000
          checkpoint_dir: {tmp_path}/results_wide2
          training_stages:
            - {{alpha: 0.01, epochs: 10, lr: 1.0e-4, name: P1}}
    """))
    assert main(_args(str(wide_cfg), init_from=donor_ckpt)) == 0
    finals = glob.glob(str(tmp_path / "results_wide2" / "**" /
                           "model_final.ckpt"), recursive=True)
    meta2 = ckpt_mod.load_metadata(finals[0])
    assert meta2["hidden_size"] == 16  # peek found h12 and widening ran

    # donor wider than the config: loud exit 2, no silent shape mangling
    assert main(_args(cfg, init_from=finals[0])) == 2

    # EVM-net mismatch: the donor template is built at the CONFIG's
    # hidden_size_1, and flax would silently restore mismatched EVM shapes
    # into it — must be a loud exit 2 (no EVM widening path exists)
    evm_cfg = tmp_path / "evm_mismatch.yaml"
    evm_cfg.write_text(wide_cfg.read_text()
                       .replace("hidden_size_1: 8", "hidden_size_1: 12")
                       .replace("results_wide2", "results_evm_mm"))
    assert main(_args(str(evm_cfg), init_from=finals[0])) == 2


def test_sigterm_graceful_stop_checkpoints_and_resumes(tmp_path):
    """Deadline stop path: SIGTERM mid-training makes the trainer finish
    the in-flight dispatch, write sigterm_step*.ckpt, and exit 3 (not a
    crash); the checkpoint then resumes cleanly. This is the watchdog's
    WATCHDOG_DEADLINE_TS contract — SIGKILL mid-dispatch has wedged the
    remote TPU worker, so the graceful path must keep working."""
    import signal
    import subprocess
    import sys
    import textwrap as tw
    import time

    mat = str(tmp_path / "dns.mat")
    _write_dns_mat(mat)
    ckpt_dir = tmp_path / "results_sig"
    cfg = tmp_path / "sig.yaml"
    cfg.write_text(tw.dedent(f"""
        experiment_name: sigterm_stop
        model_variant: ev-nsfnet
        physics: {{Re: 100, alpha_evm: 0.03}}
        network: {{layers: 2, layers_1: 2, hidden_size: 12, hidden_size_1: 8}}
        eval_data: {mat}
        training:
          N_f: 128
          log_interval: 25
          enable_tensorboard: false
          sort_training_points: false
          checkpoint_freq: 100
          checkpoint_dir: {ckpt_dir}
          training_stages:
            - {{alpha: 0.03, epochs: 500000, lr: 1.0e-3, name: S1}}
    """))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "nsfnet_tpu.train",
         "--config", str(cfg), "--cpu"],
        cwd=str(tmp_path), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        # wait until training has demonstrably started (first cadence ckpt)
        deadline = time.time() + 240
        while time.time() < deadline:
            if glob.glob(str(ckpt_dir / "**" / "*.ckpt"), recursive=True):
                break
            if proc.poll() is not None:
                out, err = proc.communicate()
                raise AssertionError(f"trainer died early: {err[-2000:]}")
            time.sleep(0.5)
        else:
            raise AssertionError("no cadence checkpoint within 240s")
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=120)
        assert proc.returncode == 3, (proc.returncode, err[-2000:])
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    sig_ckpts = glob.glob(str(ckpt_dir / "**" / "sigterm_step*.ckpt"),
                          recursive=True)
    assert sig_ckpts, "SIGTERM should have written a graceful checkpoint"

    # the graceful checkpoint must be resumable: shrink the stage budget to
    # just past the stopped step and finish the run in-process
    from nsfnet_tpu.train import main
    from nsfnet_tpu.training import checkpoint as ckpt_mod

    step = ckpt_mod.load_metadata(sig_ckpts[0])["global_step"]
    assert step > 0
    cfg2 = tmp_path / "sig_resume.yaml"
    cfg2.write_text(cfg.read_text().replace("epochs: 500000",
                                            f"epochs: {step + 50}"))
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(_args(str(cfg2), resume=sig_ckpts[0])) == 0
    finally:
        os.chdir(old)


def test_driver_wires_stage_re_and_bc_overrides(tmp_path, monkeypatch):
    """Per-stage Re/bc_weight config overrides reach solver.train as
    runtime scalars (the Reynolds-continuation curriculum wiring —
    configs/re5000_cont_from_re4000.yaml), and 0/omitted inherits the
    physics section."""
    import textwrap as tw

    from nsfnet_tpu import train as train_mod
    from nsfnet_tpu.train import main

    monkeypatch.chdir(tmp_path)
    mat = str(tmp_path / "dns.mat")
    _write_dns_mat(mat)
    cfg = tmp_path / "cont.yaml"
    cfg.write_text(tw.dedent(f"""
        experiment_name: cont_e2e
        model_variant: ev-nsfnet
        physics: {{Re: 500, alpha_evm: 0.03, bc_weight: 10}}
        network: {{layers: 2, layers_1: 2, hidden_size: 12, hidden_size_1: 8}}
        eval_data: {mat}
        training:
          N_f: 128
          log_interval: 50
          enable_tensorboard: false
          sort_training_points: false
          checkpoint_freq: 1000000
          checkpoint_dir: {tmp_path}/results_cont
          training_stages:
            - {{alpha: 0.03, Re: 100, epochs: 10, lr: 1.0e-3, name: C0}}
            - {{alpha: 0.03, Re: 300, bc_weight: 20, epochs: 10, lr: 1.0e-3, name: C1}}
            - {{alpha: 0.02, epochs: 10, lr: 1.0e-4, name: C2}}
    """))

    seen = []
    from nsfnet_tpu.training.solver import PINNSolver

    orig_train = PINNSolver.train

    def spy(self, *a, **kw):
        seen.append((kw.get("Re"), kw.get("bc_weight")))
        out = orig_train(self, *a, **kw)
        seen[-1] = seen[-1] + (self.current_re, self.current_alpha_b)
        return out

    monkeypatch.setattr(PINNSolver, "train", spy)
    assert main(_args(str(cfg))) == 0
    assert [s[:2] for s in seen] == [(100.0, None), (300.0, 20.0), (None, None)]
    # and the solver actually ran each stage at the override values
    assert [s[2:] for s in seen] == [(100.0, 10.0), (300.0, 20.0), (500.0, 10.0)]


def test_rar_schedule_first_vs_every(tmp_path, monkeypatch):
    """rar_schedule codifies the measured RAR finding (VALIDATION.md: RAR
    helps the FIRST post-warm-start redraw and hurts thereafter): the
    default 'first' scores only the stage-1 redraw (stages 2+ redraw
    uniformly), 'every' scores all of them."""
    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.train import main

    monkeypatch.chdir(tmp_path)
    calls = []
    orig = CavityData.rar_training_data

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(CavityData, "rar_training_data", spy)

    rar = "\n          rar_pool_mult: 2\n          rar_top_frac: 0.5"
    cfg = _resume_config(tmp_path, "sched_first", str(tmp_path / "rf"),
                         rar=rar)  # 3 stages -> 2 redraws
    assert main(_args(cfg)) == 0
    assert len(calls) == 1, "default 'first' must RAR-score only stage 1"

    calls.clear()
    cfg2 = _resume_config(tmp_path, "sched_every", str(tmp_path / "re"),
                          rar=rar + "\n          rar_schedule: every")
    assert main(_args(cfg2)) == 0
    assert len(calls) == 2, "'every' must RAR-score both redraws"


def test_bench_pause_protocol(tmp_path):
    """bench.py must never measure while a trainer holds the chip: it TERMs
    the PIDs registered under .run/ (run_with_watchdog.sh), leaves the pause
    flag up while measuring, and removes it on cleanup so the watchdog
    relaunches. Dead/garbage pidfiles are ignored (no flag, no-op cleanup).
    Drilled live against a real campaign 2026-08-20 (VALIDATION.md)."""
    import signal
    import subprocess
    import sys as _sys
    import time as _time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, repo)
    from bench import _pause_live_trainers

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    flag = run_dir / "pause"

    # no pidfiles -> no flag raised
    cleanup = _pause_live_trainers(timeout_s=1, run_dir=str(run_dir))
    assert not flag.exists()
    cleanup()

    # dead pid + garbage pidfile -> ignored, still no flag
    (run_dir / "stale.pid").write_text("999999999")
    (run_dir / "junk.pid").write_text("not-a-pid")
    cleanup = _pause_live_trainers(timeout_s=1, run_dir=str(run_dir))
    assert not flag.exists()
    cleanup()

    # a live registered process gets SIGTERM and is waited on; the flag
    # stays up for the measurement window and cleanup removes it
    proc = subprocess.Popen([_sys.executable, "-c",
                             "import time; time.sleep(300)"])
    (run_dir / "campaign.pid").write_text(str(proc.pid))
    t0 = _time.time()
    cleanup = _pause_live_trainers(timeout_s=30, run_dir=str(run_dir))
    assert flag.exists(), "flag must hold off watchdog relaunch during bench"
    assert proc.wait(timeout=10) == -signal.SIGTERM
    assert _time.time() - t0 < 25, "must return as soon as the trainer exits"
    cleanup()
    assert not flag.exists(), "cleanup must let the watchdog resume"
