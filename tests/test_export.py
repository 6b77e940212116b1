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
