"""Reference ``.pth`` checkpoint import: torch FCNet state_dicts (the
format the reference publishes, ev-NSFnet/pinn_solver.py:755-759) must load
into MLP Params and reproduce the torch forward pass exactly."""

import collections

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nsfnet_tpu.training.solver import PINNSolver
from nsfnet_tpu.utils.torch_import import load_torch_params, state_dict_to_params


def _fcnet_state_dict(sizes, seed, prefix=""):
    """Bare FCNet state_dict: layers.layer_<i>.{weight,bias}, torch [out,in]."""
    g = torch.Generator().manual_seed(seed)
    sd = collections.OrderedDict()
    for i, (fi, fo) in enumerate(zip(sizes[:-1], sizes[1:])):
        sd[f"{prefix}layers.layer_{i}.weight"] = torch.randn(fo, fi, generator=g)
        sd[f"{prefix}layers.layer_{i}.bias"] = torch.randn(fo, generator=g)
    return sd


def _torch_forward(sd, x, prefix=""):
    h = torch.as_tensor(x, dtype=torch.float32)
    n = len(sd) // 2
    for i in range(n):
        w, b = sd[f"{prefix}layers.layer_{i}.weight"], sd[f"{prefix}layers.layer_{i}.bias"]
        h = torch.nn.functional.linear(h, w, b)
        if i < n - 1:
            h = torch.tanh(h)
    return h.numpy()


def test_state_dict_roundtrip_matches_torch_forward(tmp_path):
    sizes = [2, 16, 16, 3]
    sd = _fcnet_state_dict(sizes, seed=0)
    params = state_dict_to_params(sd)
    assert tuple(w.shape for w, _ in params) == ((2, 16), (16, 16), (16, 3))

    from nsfnet_tpu.models.mlp import mlp_apply

    x = np.random.default_rng(1).normal(size=(37, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mlp_apply(params, x)), _torch_forward(sd, x),
        rtol=1e-5, atol=1e-5)


def test_ddp_prefix_accepted():
    sd = _fcnet_state_dict([2, 8, 3], seed=2, prefix="module.")
    params = state_dict_to_params(sd)
    assert tuple(w.shape for w, _ in params) == ((2, 8), (8, 3))


def test_solver_constructor_pth_import(tmp_path):
    """PINNSolver(net_params='...pth') — constructor knob parity with the
    reference (ev-NSFnet/pinn_solver.py:108-120), incl. the '<f>_evm'
    sibling convention for the EVM net."""
    main_sd = _fcnet_state_dict([2, 12, 12, 3], seed=3)
    evm_sd = _fcnet_state_dict([2, 8, 8, 1], seed=4)
    p = str(tmp_path / "model_cavity_loop100.pth")
    torch.save(main_sd, p)
    torch.save(evm_sd, p + "_evm")

    solver = PINNSolver(Re=100, layers=2, layers_1=2, hidden_size=12,
                        hidden_size_1=8, N_f=64, net_params=p,
                        log_interval=10**9, checkpoint_freq=10**9, seed=0)
    x = np.random.default_rng(5).uniform(size=(21, 2)).astype(np.float32)
    u, v, p_out, e = solver.predict((x[:, :1], x[:, 1:]))
    ref = _torch_forward(main_sd, x)
    np.testing.assert_allclose(np.asarray(u)[:, 0], ref[:, 0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v)[:, 0], ref[:, 1], rtol=2e-5, atol=2e-5)
    ref_e = _torch_forward(evm_sd, x)
    np.testing.assert_allclose(np.asarray(e)[:, 0], ref_e[:, 0], rtol=2e-5, atol=2e-5)


def test_shape_mismatch_raises(tmp_path):
    p = str(tmp_path / "bad.pth")
    torch.save(_fcnet_state_dict([2, 10, 3], seed=6), p)
    with pytest.raises(ValueError, match="shapes"):
        PINNSolver(Re=100, layers=2, layers_1=2, hidden_size=12,
                   hidden_size_1=8, N_f=64, net_params=p, seed=0)


def test_bad_keys_raise():
    with pytest.raises(ValueError, match="unrecognized"):
        state_dict_to_params({"encoder.weight": torch.zeros(3, 3)})


def test_pth_export_roundtrip(tmp_path):
    """save_torch -> reference-format .pth (+_evm sibling) -> net_params
    reload reproduces the exporting solver bit-exactly, and the exported
    dict drives the reference's own FCNet forward."""
    src = PINNSolver(Re=100, layers=2, layers_1=2, hidden_size=12,
                     hidden_size_1=8, N_f=64, log_interval=10**9,
                     checkpoint_freq=10**9, seed=11)
    p = str(tmp_path / "export.pth")
    src.save_torch(p)

    sd = torch.load(p, map_location="cpu", weights_only=True)
    x = np.random.default_rng(7).uniform(size=(19, 2)).astype(np.float32)
    ref = _torch_forward(sd, x)

    clone = PINNSolver(Re=100, layers=2, layers_1=2, hidden_size=12,
                       hidden_size_1=8, N_f=64, net_params=p,
                       log_interval=10**9, checkpoint_freq=10**9, seed=0)
    u, v, _, e = clone.predict((x[:, :1], x[:, 1:]))
    np.testing.assert_allclose(np.asarray(u)[:, 0], ref[:, 0],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v)[:, 0], ref[:, 1],
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(src.state.params, clone.state.params):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    # non-FCNet heads cannot export
    sf = PINNSolver(Re=100, layers=2, layers_1=2, hidden_size=12,
                    hidden_size_1=8, N_f=64, formulation="streamfunction",
                    seed=1)
    with pytest.raises(ValueError, match="export"):
        sf.save_torch(str(tmp_path / "nope.pth"))
