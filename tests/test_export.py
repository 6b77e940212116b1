"""AOT serving export (utils/export.py): the predict head serialized via
jax.export must round-trip — deserialize with NO model code and reproduce
solver.predict() bit-for-bit at any batch size (the batch dim is
symbolic). The reference cannot do this at all: its deployment unit is
the torch checkpoint plus the full solver stack (ev-NSFnet/test.py:27-99).
"""

import json
import os

import jax
import numpy as np
import pytest

from nsfnet_tpu.data.cavity import CavityData
from nsfnet_tpu.training.solver import PINNSolver
from nsfnet_tpu.utils.export import (export_predict, export_residuals,
                                     load_predict)


def _solver(**kw):
    defaults = dict(Re=100, layers=3, layers_1=2, hidden_size=24,
                    hidden_size_1=12, N_f=256, alpha_evm=0.03, bc_weight=10,
                    eq_weight=1, log_interval=10_000_000,
                    checkpoint_freq=10_000_000, seed=7)
    defaults.update(kw)
    s = PINNSolver(**defaults)
    data = CavityData(N_f=256, sort_training_points=False, seed=0)
    s.set_boundary_data(X=data.boundary_data())
    s.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    return s


def _pts(n, seed=0):
    return np.random.default_rng(seed).uniform(0.05, 0.95, (n, 2)).astype(np.float32)


def test_export_roundtrip_bit_exact(tmp_path):
    solver = _solver()
    path = str(tmp_path / "predict.hlo")
    meta = export_predict(solver, path, platforms=("cpu",))

    served = load_predict(path)
    for n in (17, 256):  # symbolic batch: two sizes, one artifact
        pts = _pts(n)
        got = np.asarray(served(pts))
        u, v, p, e = solver.predict((pts[:, 0:1], pts[:, 1:2]))
        want = np.concatenate([np.asarray(a) for a in (u, v, p, e)], axis=1)
        np.testing.assert_array_equal(got, want)

    assert meta["outputs"] == ["u", "v", "p", "e"]
    assert meta["evm"] is True
    side = json.load(open(path + ".json"))
    assert side["formulation"] == "velocity"
    assert os.path.getsize(path) > 1000


def test_export_streamfunction_and_vanilla(tmp_path):
    # streamfunction predict goes through the tangent-sweep uv path;
    # vanilla (no EVM net) must emit e == 0
    sf = _solver(formulation="streamfunction")
    p1 = str(tmp_path / "sf.hlo")
    export_predict(sf, p1, platforms=("cpu",))
    pts = _pts(33, seed=1)
    got = np.asarray(load_predict(p1)(pts))
    u, v, p, e = sf.predict((pts[:, 0:1], pts[:, 1:2]))
    want = np.concatenate([np.asarray(a) for a in (u, v, p, e)], axis=1)
    np.testing.assert_array_equal(got, want)

    van = _solver(layers_1=None, hidden_size_1=None, evm=False)
    p2 = str(tmp_path / "vanilla.hlo")
    meta = export_predict(van, p2, platforms=("cpu",))
    assert meta["evm"] is False
    out = np.asarray(load_predict(p2)(_pts(9)))
    np.testing.assert_array_equal(out[:, 3], np.zeros(9, np.float32))


def test_export_residuals_matches_residuals_at(tmp_path):
    solver = _solver()
    path = str(tmp_path / "qc.hlo")
    meta = export_residuals(solver, path, platforms=("cpu",))
    assert meta["kind"] == "nsfnet_tpu.residuals"
    pts = _pts(50, seed=3)
    served = np.asarray(load_predict(path)(pts)).reshape(-1)
    want = solver.residuals_at(pts[:, 0], pts[:, 1])
    np.testing.assert_allclose(served, want, rtol=1e-5, atol=1e-7)


def test_export_cli_coord_transform_and_alpha_roundtrip(tmp_path):
    # The CLI must mirror train.py's wiring: a checkpoint trained with
    # coordinate_transform enabled exports with coord_scale=2.0 (not the
    # constructor default 1.0), and the residual head bakes the alpha_evm
    # the checkpoint actually trained at (stage-annealed), not the
    # config's stage-1 value.
    from nsfnet_tpu.config import ConfigManager
    from nsfnet_tpu.train import build_solver
    from nsfnet_tpu.utils import export as export_mod

    cfg_path = tmp_path / "ct.yaml"
    cfg_path.write_text(
        "experiment_name: ct_export\n"
        "model_variant: ev-nsfnet\n"
        "physics: {Re: 100, alpha_evm: 0.05, bc_weight: 10, eq_weight: 1}\n"
        "network: {layers: 3, layers_1: 2, hidden_size: 24, hidden_size_1: 12}\n"
        "training:\n"
        "  N_f: 256\n"
        "  coordinate_transform: true\n"
        f"  checkpoint_dir: {tmp_path / 'results'}\n"
    )
    cfg = ConfigManager.from_file(str(cfg_path)).config
    assert cfg.training.coordinate_transform is True

    donor = build_solver(cfg)
    data = CavityData(N_f=256, sort_training_points=False,
                      coord_transform=True, seed=0)
    donor.set_boundary_data(X=data.boundary_data())
    donor.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    donor.set_coordinate_transform(data.coord_scale)
    assert donor.coord_scale == 2.0
    donor.set_alpha_evm(0.007)  # a late-stage anneal value != config's 0.05
    ckpt = donor.save("ct_donor.ckpt", directory=str(tmp_path))

    out = str(tmp_path / "ct.hlo")
    rc = export_mod.main(["--config", str(cfg_path), "--ckpt", ckpt,
                          "--out", out, "--residuals", "--platforms", "cpu"])
    assert rc == 0

    side = json.load(open(out + ".json"))
    assert side["coord_scale"] == 2.0
    assert side["alpha_evm"] == pytest.approx(0.007)
    assert side["alpha_evm_source"] == "checkpoint"

    # the residual head is where both coord_scale (derivative chain rule)
    # and alpha_evm (vis_t cap) change the served numbers
    pts = _pts(40, seed=5)
    served = np.asarray(load_predict(out + ".residuals")(pts)).reshape(-1)
    want = donor.residuals_at(pts[:, 0], pts[:, 1])
    np.testing.assert_allclose(served, want, rtol=1e-5, atol=1e-7)

    # and a CLI --alpha-evm override wins over the checkpoint value
    out2 = str(tmp_path / "ct2.hlo")
    rc = export_mod.main(["--config", str(cfg_path), "--ckpt", ckpt,
                          "--out", out2, "--alpha-evm", "0.05",
                          "--platforms", "cpu"])
    assert rc == 0
    side2 = json.load(open(out2 + ".json"))
    assert side2["alpha_evm"] == pytest.approx(0.05)
    assert side2["alpha_evm_source"] == "cli"


def test_export_multiplatform_includes_tpu(tmp_path):
    # tpu lowering must succeed WITHOUT tpu hardware present (that is the
    # point: export on the training host, serve anywhere)
    solver = _solver()
    path = str(tmp_path / "multi.hlo")
    meta = export_predict(solver, path)  # default ("cpu", "tpu")
    assert meta["platforms"] == ["cpu", "tpu"]
    pts = _pts(21)
    got = np.asarray(load_predict(path)(pts))  # runs on the cpu branch
    u, v, p, e = solver.predict((pts[:, 0:1], pts[:, 1:2]))
    want = np.concatenate([np.asarray(a) for a in (u, v, p, e)], axis=1)
    np.testing.assert_array_equal(got, want)
