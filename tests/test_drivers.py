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
