"""Streamfunction-pressure formulation (psi, p) — third-order Taylor engine.

The net predicts (psi, p); u = s*psi_y, v = -s*psi_x, so continuity
u_x + v_y == 0 holds EXACTLY by construction — a hard constraint the
reference's velocity-pressure formulation can only penalize via the eq3
loss (NSFnet/pinn_solver.py:155-160). Correctness strategy mirrors
tests/test_derivatives.py: manufactured psi with closed-form derivatives
at fp64, then a cross-check of the directional third-order sweeps against
nested jacfwd ground truth on a real tanh MLP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsfnet_tpu.data.cavity import CavityData
from nsfnet_tpu.models.mlp import init_mlp, mlp_apply
from nsfnet_tpu.ops.derivatives import psi_p_derivatives_2d, psi_p_uv
from nsfnet_tpu.training.solver import PINNSolver


def _psi_p_fn(x):
    """[N,2] -> [N,2] = (psi, p) with asymmetric closed-form derivatives."""
    a, b = x[:, 0:1], x[:, 1:2]
    psi = jnp.sin(a) * jnp.cos(2.0 * b) + a**3 * b**2
    p = a * b
    return jnp.concatenate([psi, p], axis=1)


def test_psi_engine_analytic(x64):
    pts = np.random.default_rng(0).uniform(0.1, 0.9, (64, 2))
    x = jnp.asarray(pts)
    a, b = pts[:, 0:1], pts[:, 1:2]
    s = 2.5

    sa, ca = np.sin(a), np.cos(a)
    s2b, c2b = np.sin(2 * b), np.cos(2 * b)
    psi_x = ca * c2b + 3 * a**2 * b**2
    psi_y = -2 * sa * s2b + 2 * a**3 * b
    psi_xx = -sa * c2b + 6 * a * b**2
    psi_yy = -4 * sa * c2b + 2 * a**3
    psi_xy = -2 * ca * s2b + 6 * a**2 * b
    psi_xxx = -ca * c2b + 6 * b**2
    psi_xxy = 2 * sa * s2b + 12 * a * b
    psi_xyy = -4 * ca * c2b + 6 * a**2
    psi_yyy = 8 * sa * s2b

    out, dx, dy, dxx, dyy = psi_p_derivatives_2d(_psi_p_fn, x, uv_scale=s)
    tol = dict(rtol=1e-10, atol=1e-11)
    # values (u, v, p)
    np.testing.assert_allclose(out[:, 0:1], s * psi_y, **tol)
    np.testing.assert_allclose(out[:, 1:2], -s * psi_x, **tol)
    np.testing.assert_allclose(out[:, 2:3], a * b, **tol)
    # first derivatives (net frame; p is a direct output)
    np.testing.assert_allclose(dx[:, 0:1], s * psi_xy, **tol)
    np.testing.assert_allclose(dx[:, 1:2], -s * psi_xx, **tol)
    np.testing.assert_allclose(dx[:, 2:3], b, **tol)
    np.testing.assert_allclose(dy[:, 0:1], s * psi_yy, **tol)
    np.testing.assert_allclose(dy[:, 1:2], -s * psi_xy, **tol)
    np.testing.assert_allclose(dy[:, 2:3], a, **tol)
    # diagonal second derivatives (third derivatives of psi)
    np.testing.assert_allclose(dxx[:, 0:1], s * psi_xxy, **tol)
    np.testing.assert_allclose(dxx[:, 1:2], -s * psi_xxx, **tol)
    np.testing.assert_allclose(dyy[:, 0:1], s * psi_yyy, **tol)
    np.testing.assert_allclose(dyy[:, 1:2], -s * psi_xyy, **tol)

    uvp = psi_p_uv(_psi_p_fn, x, uv_scale=s)
    np.testing.assert_allclose(np.asarray(uvp), np.asarray(out), **tol)


def test_psi_engine_vs_nested_jacfwd_on_mlp(x64):
    """Directional third-order sweeps == nested jacfwd ground truth."""
    params = init_mlp(jax.random.PRNGKey(3), (2, 24, 24, 2),
                      dtype=jnp.float64)
    fn = lambda z: mlp_apply(params, z)
    x = jax.random.uniform(jax.random.PRNGKey(4), (16, 2), jnp.float64)

    single = lambda z: fn(z[None, :])[0]  # [2] -> [2] for jacfwd stacking
    J = jax.vmap(jax.jacfwd(single))(x)                      # [N,2,2]
    H = jax.vmap(jax.jacfwd(jax.jacfwd(single)))(x)          # [N,2,2,2]
    T = jax.vmap(jax.jacfwd(jax.jacfwd(jax.jacfwd(single))))(x)

    out, dx, dy, dxx, dyy = psi_p_derivatives_2d(fn, x)
    tol = dict(rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(out[:, 0], J[:, 0, 1], **tol)          # u=psi_y
    np.testing.assert_allclose(out[:, 1], -J[:, 0, 0], **tol)         # v=-psi_x
    np.testing.assert_allclose(dx[:, 0], H[:, 0, 0, 1], **tol)        # psi_xy
    np.testing.assert_allclose(dy[:, 0], H[:, 0, 1, 1], **tol)        # psi_yy
    np.testing.assert_allclose(dxx[:, 0], T[:, 0, 0, 0, 1], **tol)    # psi_xxy
    np.testing.assert_allclose(dxx[:, 1], -T[:, 0, 0, 0, 0], **tol)   # -psi_xxx
    np.testing.assert_allclose(dyy[:, 0], T[:, 0, 1, 1, 1], **tol)    # psi_yyy
    np.testing.assert_allclose(dyy[:, 1], -T[:, 0, 0, 1, 1], **tol)   # -psi_xyy
    np.testing.assert_allclose(dx[:, 2], J[:, 1, 0], **tol)           # p_x
    np.testing.assert_allclose(dy[:, 2], J[:, 1, 1], **tol)           # p_y


def test_psi_closed_form_matches_generic(x64):
    """mlp_psi_derivatives_2d (shared-primal, stacked directions) ==
    the generic nested-jvp sweeps to fp64 precision."""
    from nsfnet_tpu.ops.derivatives import mlp_psi_derivatives_2d

    params = init_mlp(jax.random.PRNGKey(8), (2, 40, 40, 40, 2),
                      dtype=jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(9), (128, 2), jnp.float64)
    generic = psi_p_derivatives_2d(lambda z: mlp_apply(params, z), x,
                                   uv_scale=1.7)
    closed = mlp_psi_derivatives_2d(params, x, uv_scale=1.7)
    for g, c in zip(generic, closed):
        np.testing.assert_allclose(np.asarray(c), np.asarray(g),
                                   rtol=1e-9, atol=1e-12)


def test_continuity_identically_zero():
    """u_x + v_y is the SAME array negated — zero to the last bit."""
    params = init_mlp(jax.random.PRNGKey(5), (2, 32, 32, 2))
    _, dx, dy, _, _ = psi_p_derivatives_2d(
        lambda z: mlp_apply(params, z),
        jax.random.uniform(jax.random.PRNGKey(6), (128, 2)), uv_scale=1.7)
    div = np.asarray(dx[:, 0] + dy[:, 1])
    assert np.all(div == 0.0), np.abs(div).max()


def _make_sf_solver(**kw):
    defaults = dict(Re=100, layers=3, layers_1=2, hidden_size=24,
                    hidden_size_1=12, N_f=512, alpha_evm=0.03, bc_weight=10,
                    eq_weight=1, log_interval=10_000_000,
                    checkpoint_freq=10_000_000, seed=7,
                    formulation="streamfunction")
    defaults.update(kw)
    return PINNSolver(**defaults)


def _attach(solver, n_f=512):
    data = CavityData(N_f=n_f, sort_training_points=False, seed=0)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(),
                                weights=data.sdf_weights)
    return data


def test_streamfunction_solver_trains():
    solver = _make_sf_solver()
    assert solver.engine == "xla"  # no fused third-order kernel
    _attach(solver)
    solver._ensure_ready()
    before, _ = solver._loss_fn(
        (solver.state.params, solver.state.params_evm), solver._batch,
        solver.state.vis_t_minus, solver._stage_scalars(0.0))
    solver.train(num_epoch=200, lr=1e-3)
    after, _ = solver._loss_fn(
        (solver.state.params, solver.state.params_evm), solver._batch,
        solver.state.vis_t_minus, solver._stage_scalars(0.0))
    assert float(after) < 0.5 * float(before), (float(before), float(after))
    # the divergence-free property survives training (exact by construction)
    g = np.linspace(0.05, 0.95, 9)
    xs, ys = np.meshgrid(g, g)
    div = solver.divergence(xs.reshape(-1, 1), ys.reshape(-1, 1))
    assert np.abs(np.asarray(div)).max() < 1e-5  # fp32 eval roundoff only


def test_streamfunction_pallas_engine_matches_xla():
    """Fused third-order kernel (explicit engine='pallas', interpret mode)
    == XLA closed form inside the full sharded training step."""
    from nsfnet_tpu.parallel.mesh import create_mesh

    results = {}
    for engine in ("xla", "pallas"):
        solver = _make_sf_solver(hidden_size=16, layers=2, engine=engine,
                                 mesh=create_mesh(8))
        assert solver.engine == engine  # explicit pallas is honored
        data = CavityData(N_f=128, sort_training_points=False, seed=0)
        solver.set_boundary_data(X=data.boundary_data())
        solver.set_eq_training_data(X=data.training_data(),
                                    weights=data.sdf_weights)
        solver.train(num_epoch=3, lr=1e-3)
        leaves = jax.tree.leaves(solver.state.params)
        results[engine] = np.concatenate(
            [np.asarray(l).ravel() for l in leaves])
    np.testing.assert_allclose(results["pallas"], results["xla"],
                               rtol=1e-4, atol=1e-6)


def test_streamfunction_fourier_combo_trains():
    """Fourier embedding + streamfunction rides the generic nested-jvp
    third-order path (sin/cos differentiate through cleanly)."""
    solver = _make_sf_solver(fourier_features=8, fourier_sigma=2.0,
                             hidden_size=16, layers=2)
    assert solver.engine == "xla" and solver._generic_engine
    _attach(solver, n_f=256)
    solver._ensure_ready()
    before, _ = solver._loss_fn(
        (solver.state.params, solver.state.params_evm), solver._batch,
        solver.state.vis_t_minus, solver._stage_scalars(0.0))
    solver.train(num_epoch=60, lr=1e-3)
    after, _ = solver._loss_fn(
        (solver.state.params, solver.state.params_evm), solver._batch,
        solver.state.vis_t_minus, solver._stage_scalars(0.0))
    assert float(after) < float(before)
    # continuity stays exact through the embedding
    g = np.linspace(0.1, 0.9, 5)
    div = solver.divergence(g.reshape(-1, 1), g.reshape(-1, 1))
    assert np.abs(np.asarray(div)).max() < 1e-6


def test_streamfunction_auto_engine_stays_xla():
    """auto never picks the third-order kernel (unmeasured on Mosaic)."""
    solver = _make_sf_solver(engine="auto")
    assert solver.engine == "xla"


def test_streamfunction_checkpoint_roundtrip(tmp_path):
    solver = _make_sf_solver(checkpoint_path=str(tmp_path))
    _attach(solver)
    solver.train(num_epoch=20, lr=1e-3)
    path = solver.save("sf.ckpt", directory=str(tmp_path))

    clone = _make_sf_solver(seed=99, checkpoint_path=str(tmp_path))
    _attach(clone)
    clone.load(path)
    x = np.linspace(0.1, 0.9, 32).reshape(-1, 1)
    for a, b in zip(solver.predict((x, x)), clone.predict((x, x))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streamfunction_rejects_bad_combos():
    with pytest.raises(ValueError):
        _make_sf_solver(backbone="kan")
    with pytest.raises(ValueError):
        PINNSolver(Re=100, layers=3, layers_1=2, hidden_size=24,
                   hidden_size_1=12, N_f=64, formulation="nonsense")


def test_cross_formulation_checkpoint_rejected(tmp_path):
    """A velocity checkpoint must not silently restore into a
    streamfunction solver (flax.from_bytes does no semantic validation —
    the heads predict different quantities)."""
    from nsfnet_tpu.training.solver import PINNSolver as S

    vel = S(Re=100, layers=3, layers_1=2, hidden_size=24, hidden_size_1=12,
            N_f=64, log_interval=10**9, checkpoint_freq=10**9, seed=1,
            checkpoint_path=str(tmp_path))
    path = vel.save("vel.ckpt", directory=str(tmp_path))
    sf = _make_sf_solver(checkpoint_path=str(tmp_path))
    with pytest.raises(ValueError, match="formulation"):
        sf.load(path)


def test_constructor_loads_streamfunction_ckpt(tmp_path):
    """net_params accepts a full-state .ckpt written by the SAME
    formulation (only .pth torch imports are velocity-only)."""
    solver = _make_sf_solver(checkpoint_path=str(tmp_path))
    _attach(solver)
    solver.train(num_epoch=5, lr=1e-3)
    path = solver.save("sf_full.ckpt", directory=str(tmp_path))
    clone = _make_sf_solver(seed=3, checkpoint_path=str(tmp_path),
                            net_params=path)
    a = jax.tree.leaves(solver.state.params)
    b = jax.tree.leaves(clone.state.params)
    for x_, y_ in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_))
    with pytest.raises(ValueError, match="velocity-formulation"):
        _make_sf_solver(net_params="donor.pth")


def test_streamfunction_evaluate_and_test_driver(tmp_path):
    """evaluate()/test() run through _uvp_apply for the streamfunction
    head (fp32 eval precision, NaN-masked p) — same contract as velocity."""
    solver = _make_sf_solver()
    rng = np.random.default_rng(0)
    n = 64
    x, y = rng.uniform(0, 1, (n, 1)), rng.uniform(0, 1, (n, 1))
    u, v = rng.normal(size=(n, 1)), rng.normal(size=(n, 1))
    p = rng.normal(size=(n, 1))
    p[::7] = np.nan  # reference eval fields carry NaN pressure rows
    errs = solver.evaluate(x, y, u, v, p)
    for k in ("u", "v", "p", "p_gauge"):
        assert np.isfinite(errs[k]), (k, errs)
    solver.test(x, y, u, v, p, loop=1, save_dir=str(tmp_path))
    import glob

    import scipy.io

    mats = glob.glob(str(tmp_path) + "/*.mat")
    assert mats
    dump = scipy.io.loadmat(mats[0])
    assert "PSI_pred" in dump  # streamfunction dumps the raw psi field


def test_psi_contours_artifact(tmp_path):
    import os

    from nsfnet_tpu.utils.visualization import psi_contours

    solver = _make_sf_solver()
    path = psi_contours(solver, n=21, out_path=str(tmp_path / "psi.png"))
    assert os.path.getsize(path) > 0
    vel = PINNSolver(Re=100, layers=2, layers_1=2, hidden_size=12,
                     hidden_size_1=8, N_f=64)
    with pytest.raises(ValueError):
        psi_contours(vel)


def test_config_rejects_kan_variant_streamfunction():
    from nsfnet_tpu.config import ConfigManager

    cm = ConfigManager()
    cm.config.model_variant = "kan"
    cm.config.network.formulation = "streamfunction"
    assert any("streamfunction" in w for w in cm.validate())
