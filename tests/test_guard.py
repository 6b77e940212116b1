"""ckpt_guard.sh rotation logic + escalation_check.py trigger tests.

The guard bounds what a VM reboot can erase; its CSV-rotation heuristic
decides whether a restart opened a NEW trajectory segment (step counter
reset) or the same segment continued. ADVICE r4: rotating purely on "the
last row's checkpoint path no longer exists" spuriously rotated live
trajectories when an old checkpoint was pruned mid-campaign.

escalation_check.py is the codified h224 escalation trigger (VERDICT r4
Weak #1): flatten iff 3 consecutive guard windows descend < 0.05 pts/25k.
"""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GUARD = os.path.join(REPO, "scripts", "ckpt_guard.sh")
ESC = os.path.join(REPO, "scripts", "escalation_check.py")


# --------------------------------------------------------------- rotation

def _run_guard(tmp_path, csv_rows, dir_ckpts):
    """Set up a sandbox copy of the guard (so its `cd script/..` lands in
    tmp, not the repo), a trajectory CSV, and a results dir; run the guard
    just long enough to execute the startup rotation check."""
    sandbox = tmp_path / "sandbox"
    (sandbox / "scripts").mkdir(parents=True)
    shutil.copy(GUARD, sandbox / "scripts" / "ckpt_guard.sh")
    results = sandbox / "results"
    results.mkdir()
    traj = sandbox / "traj.csv"
    traj.write_text("step,ckpt,u_pct,v_pct,p_pct,p_gauge_pct\n"
                    + "".join(csv_rows))
    for name, step in dir_ckpts:
        p = results / name
        p.write_bytes(b"ckptbytes")
        if step is not None:
            (results / (name + ".json")).write_text(
                json.dumps({"global_step": step}))
    subprocess.run(
        ["timeout", "3", "bash", "scripts/ckpt_guard.sh", "cfg.yaml",
         str(results), str(sandbox / "guard"), str(traj), "1"],
        cwd=str(sandbox), capture_output=True, text=True)
    return traj


def test_guard_rotates_on_genuine_restart(tmp_path):
    # reboot wiped the results dir; the CSV's last checkpoint is gone and
    # nothing newer exists -> the next campaign start resets the step
    # counter, so the CSV must rotate to a _seg1 sibling
    traj = _run_guard(
        tmp_path,
        csv_rows=["100000,results/model_cavity_loop100000.ckpt,8.8,8.8,360,13\n"],
        dir_ckpts=[])
    assert not traj.exists()
    seg1 = traj.parent / "traj_seg1.csv"
    assert seg1.exists() and "loop100000" in seg1.read_text()


def test_guard_keeps_csv_when_pruned_ckpt_but_step_advanced(tmp_path):
    # ADVICE r4 regression: a sigterm checkpoint recorded in the CSV was
    # pruned after resume, but the campaign continued (newest dir ckpt step
    # 120000 >= CSV step 110500) — same segment, must NOT rotate
    traj = _run_guard(
        tmp_path,
        csv_rows=[
            "110000,results/model_cavity_loop110000.ckpt,8.3,8.3,365,13\n",
            "110500,results/sigterm_step110500.ckpt,8.29,8.29,365,13\n",
        ],
        dir_ckpts=[("model_cavity_loop120000.ckpt", 120000)])
    assert traj.exists(), "live trajectory was spuriously rotated"
    assert not (traj.parent / "traj_seg1.csv").exists()


def test_guard_rotates_when_step_counter_reset(tmp_path):
    # restart into the same dir with a reset counter (warm start from a
    # donor): newest dir step 10000 < CSV step 110500 -> new segment
    traj = _run_guard(
        tmp_path,
        csv_rows=["110500,results/sigterm_step110500.ckpt,8.29,8.29,365,13\n"],
        dir_ckpts=[("model_cavity_loop10000.ckpt", 10000)])
    assert not traj.exists()
    assert (traj.parent / "traj_seg1.csv").exists()


def test_guard_step_falls_back_to_filename_without_sidecar(tmp_path):
    # sidecar missing -> step parsed from loop<N>.ckpt filename
    traj = _run_guard(
        tmp_path,
        csv_rows=["110500,results/sigterm_step110500.ckpt,8.29,8.29,365,13\n"],
        dir_ckpts=[("model_cavity_loop120000.ckpt", None)])
    assert traj.exists(), "filename-parsed step should prevent rotation"


# -------------------------------------------------- README headline sync

def test_readme_headline_rewritten_from_csv_tail(tmp_path):
    upd = os.path.join(REPO, "scripts", "update_readme_headline.py")
    readme = tmp_path / "README.md"
    readme.write_text(
        "# x\n- **Re=4000:**\n  <!-- RE4000_LIVE -->old text"
        "<!-- /RE4000_LIVE -->\n  and descending.\n")
    csv_f = tmp_path / "t.csv"
    csv_f.write_text("step,ckpt,u_pct,v_pct,p_pct,p_gauge_pct\n"
                     "110000,a.ckpt,8.288,8.284,365,13\n"
                     "120000,b.ckpt,8.25,8.246,365,13\n")
    r = subprocess.run([sys.executable, upd, "--csv", str(csv_f),
                        "--readme", str(readme)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    text = readme.read_text()
    assert "u 8.250% / v 8.246%" in text and "120,000" in text
    assert "old text" not in text
    assert "and descending." in text  # prose outside markers untouched
    # idempotent
    r2 = subprocess.run([sys.executable, upd, "--csv", str(csv_f),
                         "--readme", str(readme)],
                        capture_output=True, text=True)
    assert r2.returncode == 0 and readme.read_text() == text
    # missing markers -> skip (rc 2), file untouched
    plain = tmp_path / "plain.md"
    plain.write_text("no markers\n")
    r3 = subprocess.run([sys.executable, upd, "--csv", str(csv_f),
                         "--readme", str(plain)],
                        capture_output=True, text=True)
    assert r3.returncode == 2 and plain.read_text() == "no markers\n"


def test_repo_readme_has_live_markers():
    # the guard hook is a no-op if someone edits the markers away
    text = open(os.path.join(REPO, "README.md")).read()
    assert "<!-- RE4000_LIVE -->" in text and "<!-- /RE4000_LIVE -->" in text


# ------------------------------------------------------- escalation check

def _esc(tmp_path, rows, *args):
    csv = tmp_path / "t.csv"
    csv.write_text("step,ckpt,u_pct,v_pct,p_pct,p_gauge_pct\n"
                   + "".join(rows))
    r = subprocess.run([sys.executable, ESC, str(csv), *args],
                       capture_output=True, text=True)
    return r.returncode, json.loads(r.stdout)


def _row(step, u):
    return f"{step},c{step}.ckpt,{u},{u},360,13\n"


def test_escalation_still_descending(tmp_path):
    rows = [_row(s, 9.0 - i * 0.1) for i, s in
            enumerate(range(0, 50000, 10000))]  # 0.25 pts/25k
    rc, out = _esc(tmp_path, rows)
    assert rc == 0 and out["flat"] is False


def test_escalation_fires_after_three_flat_windows(tmp_path):
    rows = [_row(0, 9.0), _row(10000, 8.8),          # healthy window
            _row(20000, 8.79), _row(30000, 8.785),   # 3 flat windows
            _row(40000, 8.784)]                      # (< 0.05 pts/25k each)
    rc, out = _esc(tmp_path, rows)
    assert rc == 1 and out["flat"] is True
    assert all(r < 0.05 for r in out["rates"])


def test_escalation_one_healthy_window_resets(tmp_path):
    rows = [_row(0, 9.0), _row(10000, 8.99), _row(20000, 8.98),
            _row(30000, 8.8)]  # last window healthy (-0.45/25k)
    rc, out = _esc(tmp_path, rows)
    assert rc == 0 and out["flat"] is False


def test_escalation_too_short_never_escalates(tmp_path):
    rc, out = _esc(tmp_path, [_row(0, 9.0), _row(10000, 8.999)])
    assert rc == 2 and out["flat"] is False


def test_escalation_skips_segment_seam_duplicates(tmp_path):
    # a guard restart can append a duplicate step row; zero-step windows
    # must be skipped, not divide by zero
    rows = [_row(0, 9.0), _row(10000, 8.7), _row(10000, 8.7),
            _row(20000, 8.4), _row(30000, 8.1)]
    rc, out = _esc(tmp_path, rows)
    assert rc == 0 and out["flat"] is False
