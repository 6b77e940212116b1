"""run_with_watchdog.sh behavior tests (no TPU: a PATH shim forces --cpu).

Covers the unattended-campaign contract the overnight runs depend on:
- cold-start args (e.g. --init-from) are passed only while no checkpoint
  exists in the config's checkpoint_dir,
- WATCHDOG_DEADLINE_TS stops the trainer and exits 0 at the deadline so a
  scheduled benchmark gets the chip back without losing checkpointed work.
"""

import os
import stat
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHDOG = os.path.join(REPO, "scripts", "run_with_watchdog.sh")


def _shim_env(tmp_path):
    """PATH shim: `python` appends --cpu so the watchdog's trainer never
    claims a real accelerator (argparse takes the flag anywhere)."""
    shim_dir = tmp_path / "bin"
    shim_dir.mkdir(exist_ok=True)
    shim = shim_dir / "python"
    shim.write_text(f"#!/bin/bash\nexec {sys.executable} \"$@\" --cpu\n")
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    env = dict(os.environ)
    env["PATH"] = f"{shim_dir}:{env['PATH']}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _config(tmp_path, epochs, name="wd"):
    p = tmp_path / f"{name}.yaml"
    p.write_text(textwrap.dedent(f"""
        experiment_name: wdtest
        model_variant: ev-nsfnet
        physics: {{Re: 100, alpha_evm: 0.03}}
        network: {{layers: 2, layers_1: 2, hidden_size: 8, hidden_size_1: 8}}
        training:
          N_f: 64
          log_interval: 200
          enable_tensorboard: false
          sort_training_points: false
          checkpoint_freq: 1000000
          checkpoint_dir: {tmp_path}/results_{name}
          training_stages:
            - {{alpha: 0.03, epochs: {epochs}, lr: 1.0e-3, name: S1}}
    """))
    return str(p)


def test_watchdog_completes_and_cold_args_reach_trainer(tmp_path):
    """A short run completes (exit 0, 'training completed'); an unknown
    cold-start arg aborts the trainer — proving cold args reach argv when
    no checkpoint exists yet."""
    env = _shim_env(tmp_path)
    cfg = _config(tmp_path, epochs=40)
    log = tmp_path / "run.log"
    r = subprocess.run(["bash", WATCHDOG, cfg, str(log), "600"],
                       env=env, cwd=str(tmp_path), capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, log.read_text()[-2000:]
    assert "training completed" in log.read_text()

    # cold args are forwarded verbatim on a cold start — note stale_secs is
    # OMITTED here (the parser must not eat the first cold arg as a stale
    # value) — and a deterministic config error (unknown flag -> argparse
    # exit 2) aborts the watchdog instead of crash-looping all night
    log2 = tmp_path / "run2.log"
    cfg2 = _config(tmp_path, epochs=40, name="wd2")  # fresh ckpt dir: cold start
    r = subprocess.run(
        ["bash", WATCHDOG, cfg2, str(log2), "--no-such-flag"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=180)
    text = log2.read_text()
    assert "--no-such-flag" in text, text[-1000:]      # reached trainer argv
    assert r.returncode == 1, text[-1000:]             # fail-fast, no loop
    assert "configuration error" in text, text[-1000:]


def test_watchdog_cold_init_override(tmp_path):
    """<results_dir>/cold_init_override redirects the --init-from path on a
    cold start — the mechanism for swapping in a better warm-start donor
    AFTER a queue was launched (bash can't re-read a script it is already
    executing). The original cold arg here points at a missing file, so
    the run can only complete if the override actually replaced it."""
    import glob

    env = _shim_env(tmp_path)
    # run A: produce a real donor checkpoint
    cfg_a = _config(tmp_path, epochs=40, name="wda")
    r = subprocess.run(["bash", WATCHDOG, cfg_a, str(tmp_path / "a.log"), "600"],
                       env=env, cwd=str(tmp_path), capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0
    donors = glob.glob(f"{tmp_path}/results_wda/**/*.ckpt", recursive=True)
    assert donors, "run A left no checkpoint"

    # run B: cold --init-from points at a MISSING path; the override file
    # in B's results dir redirects it to run A's real checkpoint
    cfg_b = _config(tmp_path, epochs=40, name="wdb")
    results_b = tmp_path / "results_wdb"
    results_b.mkdir()
    (results_b / "cold_init_override").write_text(donors[0] + "\n")
    log_b = tmp_path / "b.log"
    r = subprocess.run(
        ["bash", WATCHDOG, str(cfg_b), str(log_b), "600",
         "--init-from", f"{tmp_path}/no_such_donor.ckpt"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=300)
    text = log_b.read_text()
    assert r.returncode == 0, text[-2000:]
    assert f"cold-start override: --init-from {donors[0]}" in text
    assert "training completed" in text
    assert "warm-start" in text  # the trainer actually loaded the donor


def test_watchdog_recovers_from_crashed_bench_pause(tmp_path):
    """Failure injection (VERDICT r4 Weak #5): bench.py touches .run/pause,
    SIGTERMs the trainer, then CRASHES before its cleanup removes the flag.
    The watchdog must not stay paused forever — once the flag exceeds
    WATCHDOG_PAUSE_MAX it removes it and resumes the campaign."""
    import threading
    import time

    env = _shim_env(tmp_path)
    env["WATCHDOG_PAUSE_MAX"] = "10"  # stale after 10 s for the test
    cfg = _config(tmp_path, epochs=30_000)  # long enough to be interrupted
    log = tmp_path / "run.log"
    run_dir = tmp_path / ".run"
    run_dir.mkdir()
    # simulate the crashed bench: pause flag appears while the trainer is
    # up, the registered trainer is killed, and no one ever cleans up
    def crashed_bench():
        reg = run_dir / "wd.pid"
        for _ in range(120):
            if reg.exists() and log.exists() and "epoch" in log.read_text():
                break
            time.sleep(1)
        (run_dir / "pause").touch()
        try:
            os.kill(int(reg.read_text().strip()), 15)
        except (OSError, ValueError):
            pass
        # bench dies here: flag never removed

    t = threading.Thread(target=crashed_bench)
    t.start()
    import time as _t
    deadline = int(_t.time()) + 150
    env["WATCHDOG_DEADLINE_TS"] = str(deadline)  # bound the test
    r = subprocess.run(["bash", WATCHDOG, cfg, str(log), "600"],
                       env=env, cwd=str(tmp_path), capture_output=True,
                       text=True, timeout=220)
    t.join(timeout=10)
    text = log.read_text()
    assert "pause flag stale" in text, text[-2000:]
    # the watchdog relaunched the trainer after clearing the flag
    assert text.count("[watchdog] launching") >= 2, text[-2000:]
    assert not (run_dir / "pause").exists()


def test_watchdog_deadline_stops_cleanly(tmp_path):
    """WATCHDOG_DEADLINE_TS in the near future: the watchdog kills a
    long trainer at the deadline and exits 0 (not a stale-restart loop)."""
    import time

    env = _shim_env(tmp_path)
    env["WATCHDOG_DEADLINE_TS"] = str(int(time.time()) + 70)
    cfg = _config(tmp_path, epochs=10_000_000)  # would run ~forever
    log = tmp_path / "long.log"
    r = subprocess.run(["bash", WATCHDOG, cfg, str(log), "600"],
                       env=env, cwd=str(tmp_path), capture_output=True,
                       text=True, timeout=240)
    assert r.returncode == 0, log.read_text()[-2000:]
    assert "deadline reached" in log.read_text()
    # the trainer it launched is gone (a just-killed child may linger as a
    # zombie until init reaps it — a zombie counts as dead)
    pid = int((tmp_path / "long.log.pid").read_text().strip())
    for _ in range(15):
        try:
            with open(f"/proc/{pid}/stat") as f:
                state = f.read().rsplit(")", 1)[1].split()[0]
        except FileNotFoundError:
            state = "gone"
        if state in ("gone", "Z"):
            break
        time.sleep(1)
    assert state in ("gone", "Z"), \
        f"trainer pid {pid} survived the deadline (state {state})"
