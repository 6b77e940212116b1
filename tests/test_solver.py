"""End-to-end solver tests on the 8-device CPU mesh (SURVEY §4 strategy):
smoke convergence, mesh-size invariance, EVM freeze schedule, checkpoint
resume exactness, evaluate/test drivers.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsfnet_tpu.data.cavity import CavityData
from nsfnet_tpu.parallel.mesh import create_mesh
from nsfnet_tpu.training.solver import PINNSolver, PysicsInformedNeuralNetwork


def _make_solver(**kw):
    defaults = dict(Re=100, layers=3, layers_1=2, hidden_size=24, hidden_size_1=12,
                    N_f=512, alpha_evm=0.03, bc_weight=10, eq_weight=1,
                    log_interval=10_000_000, checkpoint_freq=10_000_000, seed=7)
    defaults.update(kw)
    return PINNSolver(**defaults)


def _attach_data(solver, n_f=512, seed=0, **data_kw):
    data = CavityData(N_f=n_f, sort_training_points=False, seed=seed, **data_kw)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data(),
                                weights=data.sdf_weights)
    return data


def _loss_of(solver):
    solver._ensure_ready()
    total, _ = solver._loss_fn(
        (solver.state.params, solver.state.params_evm),
        solver._batch, solver.state.vis_t_minus, solver._stage_scalars(0.0))
    return float(total)


def test_smoke_training_loss_decreases():
    solver = _make_solver()
    _attach_data(solver)
    before = _loss_of(solver)
    solver.train(num_epoch=200, lr=1e-3)
    after = _loss_of(solver)
    assert after < 0.5 * before, (before, after)


def test_vanilla_variant_trains():
    solver = _make_solver(evm=False, layers_1=None)
    _attach_data(solver)
    assert solver.state.params_evm is None
    before = _loss_of(solver)
    solver.train(num_epoch=100, lr=1e-3)
    assert _loss_of(solver) < before


def test_mesh_size_invariance():
    """1-device and 8-device meshes must produce the same training result
    (global-mean loss semantics, replicated params)."""
    results = []
    for n in (1, 8):
        solver = _make_solver(mesh=create_mesh(n))
        _attach_data(solver)
        solver.train(num_epoch=20, lr=1e-3)
        leaves = jax.tree.leaves(solver.state.params)
        results.append(np.concatenate([np.asarray(l).ravel() for l in leaves]))
    np.testing.assert_allclose(results[0], results[1], rtol=2e-4, atol=1e-6)


def test_evm_freeze_schedule():
    """EVM params update only on stage-epochs k*evm_update_freq, k>=1
    (parity with ev-NSFnet/pinn_solver.py:456-462)."""
    solver = _make_solver(evm_update_freq=5)
    _attach_data(solver)

    def evm_flat(s):
        return np.concatenate([np.asarray(l).ravel()
                               for l in jax.tree.leaves(s.state.params_evm)])

    init = evm_flat(solver)
    solver.train(num_epoch=5, lr=1e-3)  # epochs 0..4: no EVM step
    np.testing.assert_array_equal(evm_flat(solver), init)

    solver2 = _make_solver(evm_update_freq=5)
    _attach_data(solver2)
    init2 = evm_flat(solver2)
    solver2.train(num_epoch=6, lr=1e-3)  # epoch 5 triggers one EVM step
    assert np.any(evm_flat(solver2) != init2)


def test_main_net_params_always_update():
    solver = _make_solver()
    _attach_data(solver)
    before = np.asarray(jax.tree.leaves(solver.state.params)[0]).copy()
    solver.train(num_epoch=2, lr=1e-3)
    after = np.asarray(jax.tree.leaves(solver.state.params)[0])
    assert np.any(before != after)


def test_checkpoint_resume_exact(tmp_path):
    """Full-state checkpoint: resumed training is bit-identical to
    uninterrupted training (params, Adam moments, vis_t carry, counters)."""
    ckpt = str(tmp_path / "state.ckpt")

    solver_a = _make_solver()
    _attach_data(solver_a)
    solver_a.train(num_epoch=3, lr=1e-3)
    solver_a.save("state.ckpt", directory=str(tmp_path))
    solver_a.train(num_epoch=4, lr=1e-3)
    ref = np.asarray(jax.tree.leaves(solver_a.state.params)[0])

    solver_b = _make_solver()
    _attach_data(solver_b)
    solver_b.load(ckpt)
    assert int(solver_b.state.step) == 3
    solver_b.train(num_epoch=4, lr=1e-3)
    got = np.asarray(jax.tree.leaves(solver_b.state.params)[0])
    np.testing.assert_array_equal(ref, got)


def test_evaluate_and_test_mat_roundtrip(tmp_path):
    import scipy.io

    solver = _make_solver()
    _attach_data(solver)
    n = 16
    g = np.linspace(0, 1, n)
    X, Y = np.meshgrid(g, g)
    u_pred, v_pred, p_pred, _ = solver.neural_net_u(X.ravel(), Y.ravel())
    errs = solver.evaluate(X.ravel(), Y.ravel(),
                           np.asarray(u_pred), np.asarray(v_pred), np.asarray(p_pred))
    assert errs["u"] < 1e-4 and errs["v"] < 1e-4 and errs["p"] < 1e-4

    errs2 = solver.test(X.ravel(), Y.ravel(),
                        np.asarray(u_pred) + 0.1, np.asarray(v_pred),
                        np.asarray(p_pred), loop=0, save_dir=str(tmp_path))
    assert errs2["u"] > 1.0
    mat = scipy.io.loadmat(os.path.join(str(tmp_path), "cavity_result_loop_0.mat"))
    assert mat["U_pred"].shape == (n, n)
    assert "E_pred" in mat and "error_u" in mat


def test_supervised_data_path():
    solver = _make_solver()
    data = _attach_data(solver)
    rng = np.random.default_rng(0)
    xs = rng.uniform(0, 1, (32, 1)).astype(np.float32)
    ys = rng.uniform(0, 1, (32, 1)).astype(np.float32)
    us = rng.normal(size=(32, 1)).astype(np.float32)
    vs = rng.normal(size=(32, 1)).astype(np.float32)
    ps = rng.normal(size=(32, 1)).astype(np.float32)
    ps[::3] = np.nan  # reference masks NaN pressure targets
    solver.set_supervised_data((xs, ys, us, vs, ps))
    solver.set_supervised_loss_weight(1.0)
    before = _loss_of(solver)
    solver.train(num_epoch=50, lr=1e-3)
    after = _loss_of(solver)
    assert np.isfinite(after) and after < before


def test_sdf_weighted_training():
    solver = _make_solver()
    _attach_data(solver, sdf_enabled=True)
    solver.train(num_epoch=5, lr=1e-3)
    assert np.isfinite(_loss_of(solver))


def test_coordinate_transform_training():
    solver = _make_solver()
    data = CavityData(N_f=512, sort_training_points=False, seed=0, coord_transform=True)
    solver.set_boundary_data(X=data.boundary_data())
    solver.set_eq_training_data(X=data.training_data())
    solver.set_coordinate_transform(data.coord_scale)
    solver.train(num_epoch=5, lr=1e-3)
    assert np.isfinite(_loss_of(solver))


def test_reference_class_alias():
    assert PysicsInformedNeuralNetwork is PINNSolver


def test_lbfgs_polish_reduces_loss():
    solver = _make_solver()
    _attach_data(solver)
    solver.train(num_epoch=50, lr=1e-3)
    before = _loss_of(solver)
    solver.train(num_epoch=15, optimizer="lbfgs")
    after = _loss_of(solver)
    assert after < before


def test_residual_fn_matches_loss():
    """sum(r^2) of the LM residual vector must equal the MSE loss total
    exactly (same masks/counts/weights), with supervision active."""
    from nsfnet_tpu.training.step import make_residual_fn

    solver = _make_solver()
    _attach_data(solver)
    # supervised points incl. a NaN p row (reference's isfinite masking)
    xs = np.array([[0.3], [0.6], [0.8]], np.float32)
    ys = np.array([[0.4], [0.5], [0.2]], np.float32)
    us = np.array([[0.1], [0.2], [0.3]], np.float32)
    vs = np.array([[0.0], [0.1], [0.2]], np.float32)
    ps = np.array([[0.5], [np.nan], [0.7]], np.float32)
    solver.set_supervised_data((xs, ys, us, vs, ps))
    solver.set_supervised_loss_weight(2.0)
    solver.train(num_epoch=3, lr=1e-3)  # move off init
    solver._ensure_ready()

    residual = make_residual_fn(
        engine=solver._engine("xla"), apply_main=solver.net.apply,
        apply_evm=solver.net_1.apply, coord_scale=solver.coord_scale,
        alpha_e=solver.alpha_e, alpha_s=solver.alpha_s,
        entropy_weight=solver.entropy_residual_weight, evm=True)
    params_all = (solver.state.params, solver.state.params_evm)
    sc = solver._stage_scalars(0.0)
    r = residual(params_all, solver._batch, solver.state.vis_t_minus, sc)
    total, _ = solver._loss_fn(params_all, solver._batch,
                               solver.state.vis_t_minus, sc)
    np.testing.assert_allclose(float(jnp.sum(r * r)), float(total),
                               rtol=1e-5)


def test_lm_polish_reduces_loss():
    solver = _make_solver()
    _attach_data(solver)
    solver.train(num_epoch=50, lr=1e-3)
    before = _loss_of(solver)
    solver.train(num_epoch=8, optimizer="lm")
    after = _loss_of(solver)
    assert after < before


def test_widen_mlp_preserves_function():
    """Net2Net widening keeps the function: new units' outgoing weights
    are zero, so outputs match up to matmul reduction-order rounding."""
    from nsfnet_tpu.models.mlp import MLP, widen_mlp_params, mlp_apply

    net = MLP(num_layers=3, hidden_size=16)
    p = net.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (37, 2))
    wide = widen_mlp_params(p, 24, jax.random.PRNGKey(5))
    assert wide[1][0].shape == (24, 24)
    assert float(jnp.abs(wide[-1][0][16:, :]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(mlp_apply(p, x)),
                               np.asarray(mlp_apply(wide, x)), atol=1e-6)


def test_lbfgs_chunking_invariant():
    """Splitting the L-BFGS scan into bounded device dispatches (TPU
    watchdog limit) must not change the optimizer trajectory: the chunk
    boundary only moves (params, opt_state) host-side between dispatches."""
    import jax.numpy as jnp

    from nsfnet_tpu.training.lbfgs import run_lbfgs

    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum(jnp.sin(p["w"]) ** 2)

    p0 = {"w": jnp.arange(6, dtype=jnp.float32) / 7.0}
    p_one, h_one = run_lbfgs(loss, p0, n_steps=12, max_chunk=12)
    p_chk, h_chk = run_lbfgs(loss, p0, n_steps=12, max_chunk=4)
    np.testing.assert_allclose(np.asarray(h_one), np.asarray(h_chk), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_one["w"]), np.asarray(p_chk["w"]),
                               rtol=1e-6)


def test_kan_backbone_trains():
    solver = _make_solver(backbone="kan", kan_width=(2, 8, 8), evm=False,
                          layers_1=None)
    _attach_data(solver, n_f=256)
    before = _loss_of(solver)
    solver.train(num_epoch=50, lr=1e-2)
    assert _loss_of(solver) < before


def test_staged_re_and_bc_weight_override():
    """Per-stage Re / bc_weight (staged-Re curriculum, boundary-weight
    annealing) are runtime scalars — no recompilation between stages."""
    solver = _make_solver()
    _attach_data(solver)
    solver.train(num_epoch=5, lr=1e-3, Re=50.0, bc_weight=5.0)
    assert solver.current_re == 50.0 and solver.current_alpha_b == 5.0
    solver.train(num_epoch=5, lr=1e-3, Re=200.0, bc_weight=20.0)
    assert np.isfinite(_loss_of(solver))


def test_pallas_engine_sharded_matches_xla():
    """Pallas engine under shard_map (8 devices) == XLA engine under jit:
    same data, same seed, same result after a few steps."""
    results = {}
    for engine in ("xla", "pallas"):
        solver = _make_solver(engine=engine, hidden_size=16, layers=2,
                              mesh=create_mesh(8))
        _attach_data(solver, n_f=128)
        solver.train(num_epoch=3, lr=1e-3)
        leaves = jax.tree.leaves(solver.state.params)
        results[engine] = np.concatenate([np.asarray(l).ravel() for l in leaves])
    np.testing.assert_allclose(results["pallas"], results["xla"],
                               rtol=1e-4, atol=1e-6)


def test_pallas_engine_single_device():
    solver = _make_solver(engine="pallas", hidden_size=16, layers=2,
                          mesh=create_mesh(1))
    _attach_data(solver, n_f=128)
    before = _loss_of(solver)
    solver.train(num_epoch=10, lr=1e-3)
    assert _loss_of(solver) < before


def test_divergence_fn():
    """Working divergence() (the reference's is broken dead code,
    NSFnet/pinn_solver.py:382-389)."""
    solver = _make_solver()
    _attach_data(solver)
    pts = np.random.default_rng(0).uniform(0.1, 0.9, (64, 1))
    div = solver.divergence(pts, pts[::-1])
    assert div.shape == (64, 1)
    assert np.all(np.isfinite(np.asarray(div)))


def test_visualization_outputs(tmp_path):
    from nsfnet_tpu.utils.visualization import field_heatmaps, streamplot_cavity

    solver = _make_solver()
    _attach_data(solver)
    p1 = streamplot_cavity(solver, n=20, out_path=str(tmp_path / "cavity.png"))
    p2 = field_heatmaps(solver, n=20, out_path=str(tmp_path / "fields.png"))
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0

    # centerline profiles, with and without a DNS overlay
    from nsfnet_tpu.utils.visualization import centerline_profiles

    g = np.linspace(0, 1, 9).astype(np.float32)
    X, Y = np.meshgrid(g, g)
    col = lambda a: a.reshape(-1, 1)
    fields = (col(X), col(Y), col(np.sin(X)), col(np.cos(Y)),
              col(np.zeros_like(X)))
    p3 = centerline_profiles(solver, fields,
                             out_path=str(tmp_path / "profiles.png"))
    p4 = centerline_profiles(solver, None,
                             out_path=str(tmp_path / "profiles_bare.png"))
    assert os.path.getsize(p3) > 0 and os.path.getsize(p4) > 0


def test_microbatched_step_matches_full_batch():
    """Gradient accumulation over microbatches is mathematically identical
    to the full-batch step (loss sums are partial-sum/global-count)."""
    results = {}
    for n_micro in (1, 4):
        solver = _make_solver(microbatches=n_micro, hidden_size=16, layers=2)
        _attach_data(solver, n_f=256)
        solver.train(num_epoch=5, lr=1e-3)
        leaves = jax.tree.leaves(solver.state.params)
        results[n_micro] = np.concatenate([np.asarray(l).ravel() for l in leaves])
    np.testing.assert_allclose(results[4], results[1], rtol=1e-5, atol=1e-7)


def test_microbatched_with_pallas_and_mesh():
    solver = _make_solver(microbatches=2, engine="pallas", hidden_size=16,
                          layers=2, mesh=create_mesh(2))
    _attach_data(solver, n_f=128)
    before = _loss_of(solver)
    solver.train(num_epoch=5, lr=1e-3)
    assert _loss_of(solver) < before


def test_crash_auto_resume(tmp_path):
    """Device-runtime crash mid-stage rolls back to the last full-state
    checkpoint and continues (failure recovery; the reference has none)."""
    solver = _make_solver(checkpoint_freq=2, checkpoint_path=str(tmp_path))
    _attach_data(solver)
    solver._ensure_ready()
    real_runner = solver._runner
    calls = {"n": 0}

    def flaky(state, batch, sc, n_steps):
        calls["n"] += 1
        if calls["n"] == 4:
            raise jax.errors.JaxRuntimeError("simulated TPU worker crash")
        return real_runner(state, batch, sc, n_steps=n_steps)

    solver._runner = flaky
    solver.train(num_epoch=6, lr=1e-3)
    assert int(solver.state.epoch_in_stage) == 6
    assert calls["n"] == 4  # rebuilt runner replaced the flaky wrapper


def test_l2_loss_mode():
    """Reference v1's 'L2' loss mode: un-normalized L2 norms
    (NSFnet/pinn_solver.py:201-218)."""
    solver = _make_solver(loss_mode="L2", evm=False, layers_1=None)
    _attach_data(solver)
    before = _loss_of(solver)
    solver.train(num_epoch=30, lr=1e-3)
    after = _loss_of(solver)
    assert np.isfinite(after) and after < before

    # L2 value == sum of norms computed by hand on the same batch
    import jax.numpy as jnp
    from nsfnet_tpu.ops.losses import masked_l2_norm
    b = solver._batch
    uvp = solver.net.apply(solver.state.params, jnp.concatenate([b.x_b, b.y_b], 1))
    expect_b = (float(masked_l2_norm(uvp[:, 0:1] - b.u_b, b.b_mask))
                + float(masked_l2_norm(uvp[:, 1:2] - b.v_b, b.b_mask)))
    total, (metrics, _) = solver._loss_fn(
        (solver.state.params, solver.state.params_evm), b,
        solver.state.vis_t_minus, solver._stage_scalars(0.0))
    np.testing.assert_allclose(float(metrics.boundary), expect_b, rtol=1e-6)


def test_l2_mode_rejects_microbatching():
    with pytest.raises(ValueError):
        _make_solver(loss_mode="L2", microbatches=2)


def test_kan_plot(tmp_path):
    from nsfnet_tpu.models.kan import KAN
    from nsfnet_tpu.utils.visualization import kan_plot

    kan = KAN(width=(2, 4, 3))
    params = kan.init(jax.random.PRNGKey(0))
    p = kan_plot(kan, params, out_path=str(tmp_path / "kan.png"))
    assert os.path.getsize(p) > 0


def test_pallas_sharded_with_supervision_and_sdf():
    """Sharded pallas runner with every batch feature active."""
    solver = _make_solver(engine="pallas", hidden_size=16, layers=2,
                          mesh=create_mesh(4))
    _attach_data(solver, n_f=128, sdf_enabled=True)
    rng = np.random.default_rng(1)
    sup = (rng.uniform(0, 1, (16, 1)).astype(np.float32),
           rng.uniform(0, 1, (16, 1)).astype(np.float32),
           rng.normal(size=(16, 1)).astype(np.float32),
           rng.normal(size=(16, 1)).astype(np.float32),
           rng.normal(size=(16, 1)).astype(np.float32))
    solver.set_supervised_data(sup)
    solver.set_supervised_loss_weight(0.7)
    solver.train(num_epoch=3, lr=1e-3)
    assert np.isfinite(_loss_of(solver))


def test_resample_reinstalls_vis_t():
    """Per-stage resampling must re-initialize the EVM viscosity carry from
    the NEW points (init_vis_t semantics, ev-NSFnet/pinn_solver.py:138-140)
    — the old shape-equality guard silently kept the stale carry."""
    solver = _make_solver()
    data = _attach_data(solver)
    solver.train(num_epoch=5, lr=1e-3)
    carried = np.asarray(solver.state.vis_t_minus)
    solver.set_eq_training_data(X=data.training_data(), weights=data.sdf_weights)
    solver._ensure_ready()
    reinit = np.asarray(solver.state.vis_t_minus)
    assert reinit.shape == carried.shape
    assert not np.allclose(reinit, carried)  # new points -> new field
    n_f = solver._vis_t_init.shape[0]
    np.testing.assert_allclose(reinit[:n_f], solver._vis_t_init, rtol=1e-6)


def test_save_returns_path_on_all_ranks(tmp_path):
    """Crash auto-resume needs every rank to agree on last_ckpt: save()
    returns the (deterministic) path everywhere, writes on rank 0 only."""
    solver = _make_solver(checkpoint_path=str(tmp_path))
    _attach_data(solver)
    solver._ensure_ready()
    solver.rank = 1
    p1 = solver.save("x.ckpt")
    assert p1 is not None and not os.path.exists(p1)
    solver.rank = 0
    p0 = solver.save("x.ckpt")
    assert p0 == p1 and os.path.exists(p0)


def test_crash_auto_resume_on_nonzero_rank(tmp_path):
    """Multi-process-shaped rollback: a NON-writing rank must also track
    last_ckpt (save() returns the shared path everywhere) and resume from
    the rank-0-written checkpoint instead of re-raising."""
    solver = _make_solver(checkpoint_freq=2, checkpoint_path=str(tmp_path))
    _attach_data(solver)
    solver._ensure_ready()
    # rank 0 writes the checkpoint this "rank 1" will roll back to
    solver.train(num_epoch=2, lr=1e-3)
    solver.rank = 1  # from here on this process behaves as a non-zero rank
    real_runner = solver._runner
    calls = {"n": 0}

    def flaky(state, batch, sc, n_steps):
        calls["n"] += 1
        if calls["n"] == 2:
            raise jax.errors.JaxRuntimeError("simulated worker crash")
        return real_runner(state, batch, sc, n_steps=n_steps)

    solver._runner = flaky
    solver.train(num_epoch=4, lr=1e-3)  # ckpt at stage-epoch 2, crash after
    assert int(solver.state.epoch_in_stage) == 4
    assert calls["n"] >= 2  # crashed once, then resumed via rollback


def test_load_repads_foreign_vis_t(tmp_path):
    """A checkpoint written under a different engine's batch padding (e.g.
    Pallas TILE-padded) must restore its REAL vis_t rows re-padded to this
    engine's layout — not trip the shape guard and lose the carry."""
    import jax.numpy as jnp

    from nsfnet_tpu.training import checkpoint as C

    solver = _make_solver()
    _attach_data(solver)
    solver.train(num_epoch=3, lr=1e-3)
    rows = np.asarray(solver.state.vis_t_minus)
    n_pad = rows.shape[0]
    foreign = np.concatenate(
        [rows, np.full((320, 1), solver.vis_t0, np.float32)])
    C.save_state(str(tmp_path / "f.ckpt"),
                 solver.state._replace(vis_t_minus=jnp.asarray(foreign)),
                 metadata={"global_step": 3})

    s2 = _make_solver()
    _attach_data(s2)
    s2.load(str(tmp_path / "f.ckpt"))
    assert s2.state.vis_t_minus.shape[0] == n_pad
    np.testing.assert_allclose(np.asarray(s2.state.vis_t_minus), rows)
    s2._ensure_ready()  # must KEEP the restored carry
    np.testing.assert_allclose(np.asarray(s2.state.vis_t_minus), rows)


def test_load_rejects_cross_architecture_checkpoint(tmp_path):
    """flax.from_bytes restores serialized leaves into a structurally
    matching template even when SHAPES differ — an h24 checkpoint loaded
    into an h32 solver would silently run as an h24 net while every stamp
    claims h32. load() must reject; cross-width transfer goes through
    train.py --init-from (Net2Net widen)."""
    solver = _make_solver()
    _attach_data(solver)
    solver.train(num_epoch=2, lr=1e-3)
    solver.save("arch.ckpt", directory=str(tmp_path))

    wide = _make_solver(hidden_size=32)
    _attach_data(wide)
    with pytest.raises(ValueError, match="architecture"):
        wide.load(str(tmp_path / "arch.ckpt"))

    # exact-match load still works
    twin = _make_solver()
    _attach_data(twin)
    twin.load(str(tmp_path / "arch.ckpt"))
    assert twin.global_step == solver.global_step


def test_residuals_at_matches_engine_and_chunking():
    """residuals_at == direct engine residual magnitude (EVM effective
    viscosity included), and is invariant to the dispatch chunk size
    (padding must not leak into real outputs)."""
    from nsfnet_tpu.ops.residuals import ev_ns_residuals

    solver = _make_solver()
    _attach_data(solver)
    pts = np.random.RandomState(11).uniform(0.05, 0.95, (301, 2)).astype(np.float32)
    got = solver.residuals_at(pts[:, 0], pts[:, 1], chunk=128)
    got_big = solver.residuals_at(pts[:, 0], pts[:, 1], chunk=4096)
    np.testing.assert_allclose(got, got_big, rtol=1e-6)

    engine = solver._engine("xla")
    xj = jnp.asarray(pts)
    derivs = engine(solver.state.params, xj)
    e = solver.net_1.apply(solver.state.params_evm, xj)[:, 0:1]
    vis_t = jnp.minimum(20.0 / solver.current_re,
                        solver.alpha_evm * jnp.abs(e))
    r = ev_ns_residuals(derivs, e, vis_t, solver.current_re, solver.coord_scale)
    want = np.asarray(jnp.sqrt(r.eq1**2 + r.eq2**2 + r.eq3**2)[:, 0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_lm_microbatched_matches_full():
    """run_lm_micro realizes the same Gauss-Newton math as run_lm: from
    identical states, the loss after a few LM steps agrees to float
    tolerance (reduction order differs across slices)."""
    s1 = _make_solver()
    _attach_data(s1)
    s2 = _make_solver()
    _attach_data(s2)
    s1.train_lm(5, cg_iters=10)
    s2.train_lm(5, cg_iters=10, microbatches=4)
    l1, l2 = _loss_of(s1), _loss_of(s2)
    assert abs(l1 - l2) / max(l1, 1e-30) < 5e-3, (l1, l2)
    d1 = jnp.concatenate([w.reshape(-1) for w, _ in s1.state.params])
    d2 = jnp.concatenate([w.reshape(-1) for w, _ in s2.state.params])
    assert float(jnp.linalg.norm(d1 - d2) / jnp.linalg.norm(d1)) < 5e-3


def test_lm_microbatched_vanilla():
    """micro-LM must work without an EVM carry (vanilla solver)."""
    solver = _make_solver(evm=False, layers_1=None)
    _attach_data(solver)
    before = _loss_of(solver)
    solver.train_lm(2, cg_iters=5, microbatches=4)
    assert _loss_of(solver) < before


def test_load_short_vis_t_reinitializes(tmp_path):
    """Loading a checkpoint whose vis_t carry has FEWER rows than the
    current collocation set must recompute the carry from the restored
    EVM net, not pad the missing rows with the vis_t0 cap."""
    small = _make_solver(N_f=128)
    _attach_data(small, n_f=128)
    small.train(num_epoch=3, lr=1e-3)
    path = small.save("short.ckpt", directory=str(tmp_path))

    big = _make_solver(N_f=1024)
    _attach_data(big, n_f=1024)
    big.load(path)
    vtm = np.asarray(big.state.vis_t_minus)
    n_f = big._eq[0].shape[0]
    # real rows must NOT be saturated at the cap the padding would fabricate
    assert float(np.max(vtm[:n_f])) < big.vis_t0 - 1e-9
    # and must equal alpha_evm * |e| from the restored EVM net
    x = np.concatenate(big._eq, axis=1)
    e = np.asarray(big.net_1.apply(big.state.params_evm, jnp.asarray(x)))[:, 0:1]
    np.testing.assert_allclose(vtm[:n_f], big.alpha_evm * np.abs(e), rtol=1e-5)


def test_stall_advance_ends_stage_early(tmp_path):
    """advance_on_stall: a stage whose equation loss stops improving (lr=0
    makes it exactly flat) ends after stall_window+1 log intervals, writes
    a break checkpoint, and fast-forwards global_step to the stage end so
    the driver/watchdog stage mapping stays consistent."""
    import glob as _glob

    solver = _make_solver(log_interval=10, checkpoint_path=str(tmp_path))
    _attach_data(solver)
    solver.train(num_epoch=1000, lr=0.0, advance_on_stall=True,
                 stall_threshold=0.01, stall_window=2, stall_min_epochs=0)
    assert solver.global_step == 1000  # fast-forwarded to stage end
    assert int(solver.state.epoch_in_stage) < 100  # actually stopped early
    ckpts = _glob.glob(str(tmp_path) + "/**/model_cavity_loop1000.ckpt",
                       recursive=True)
    assert ckpts, "break checkpoint should be written"

    # a stage that IS improving does not advance early
    solver2 = _make_solver(log_interval=10, checkpoint_path=str(tmp_path))
    _attach_data(solver2)
    solver2.train(num_epoch=60, lr=1e-3, advance_on_stall=True,
                  stall_threshold=0.01, stall_window=2)
    assert int(solver2.state.epoch_in_stage) == 60


def test_stall_eval_error_metric(tmp_path):
    """stall_metric='eval_error' tracks the DNS field error, not the eq
    loss. Regression for the ext2 X2 false-fire (VALIDATION.md round 4): at
    lr=0 the eq-loss track is exactly flat — the eq_loss metric would
    advance — but a descending scripted eval-error track must keep the
    stage running; a flat eval-error track must advance."""

    def scripted(values):
        it = iter(values)

        def fake_evaluate(x, y, u, v, p, log=True):
            e = next(it)
            return {"u": e, "v": e, "p": e, "p_gauge": e, "p_shift": 0.0}

        return fake_evaluate

    dummy_fields = tuple(np.zeros((4, 1), np.float32) for _ in range(5))

    # descending error (-5%/interval): never stalls even though eq loss is
    # exactly flat at lr=0 (the regression case)
    solver = _make_solver(log_interval=10, checkpoint_path=str(tmp_path))
    _attach_data(solver)
    solver.attach_eval_data(dummy_fields)
    solver.evaluate = scripted([10.0 * 0.95 ** k for k in range(50)])
    solver.train(num_epoch=100, lr=0.0, advance_on_stall=True,
                 stall_threshold=0.01, stall_window=2, stall_min_epochs=0,
                 stall_metric="eval_error")
    assert int(solver.state.epoch_in_stage) == 100

    # flat error: advances early
    solver = _make_solver(log_interval=10, checkpoint_path=str(tmp_path))
    _attach_data(solver)
    solver.attach_eval_data(dummy_fields)
    solver.evaluate = scripted([10.0] * 200)
    solver.train(num_epoch=1000, lr=0.0, advance_on_stall=True,
                 stall_threshold=0.01, stall_window=2, stall_min_epochs=0,
                 stall_metric="eval_error")
    assert int(solver.state.epoch_in_stage) < 100
    assert solver.global_step == 1000  # fast-forwarded to stage end

    # eval_error without attached fields falls back to the eq-loss track
    # (flat at lr=0 -> advances) instead of crashing
    solver = _make_solver(log_interval=10, checkpoint_path=str(tmp_path))
    _attach_data(solver)
    solver.train(num_epoch=1000, lr=0.0, advance_on_stall=True,
                 stall_threshold=0.01, stall_window=2, stall_min_epochs=0,
                 stall_metric="eval_error")
    assert int(solver.state.epoch_in_stage) < 100


def test_adaptive_bc_weight_balances_and_checkpoints(tmp_path):
    """Gradient-pathology loss balancing: with adaptive_bc_weight on, the
    boundary weight moves from its static value toward the measured
    ||grad L_eq||/||grad L_bc|| ratio at log boundaries, the adapted value
    rides checkpoint metadata across save/load, and the default-off path
    leaves the weight untouched."""
    solver = _make_solver(adaptive_bc_weight=True, log_interval=10,
                          bc_weight=10.0)
    _attach_data(solver)

    # probe sanity: finite positive scalar
    solver._ensure_ready()
    r = solver._grad_norm_ratio(solver._stage_scalars(1e-3))
    assert np.isfinite(r) and r > 0

    solver.train(num_epoch=30, lr=1e-3)  # 3 log boundaries -> >=2 updates
    adapted = solver.current_alpha_b
    assert adapted != 10.0
    assert np.isfinite(adapted) and adapted >= 1.0
    # EMA moved toward the clipped ratio, not to an arbitrary value
    target = float(np.clip(r, 1.0, solver.adaptive_bc_max))
    lo, hi = sorted((10.0, target))
    assert lo * 0.3 <= adapted <= hi * 3.0

    # the adapted weight rides checkpoint metadata
    path = solver.save("adaptive.ckpt", directory=str(tmp_path))
    fresh = _make_solver(adaptive_bc_weight=True)
    _attach_data(fresh)
    fresh.load(path)
    assert fresh.current_alpha_b == pytest.approx(adapted)

    # default-off: the weight never moves
    off = _make_solver(log_interval=10)
    _attach_data(off)
    off.train(num_epoch=30, lr=1e-3)
    assert off.current_alpha_b == 10.0

    # REGRESSION: train() must not clobber an adapted/restored weight at
    # stage entry — adaptive mode carries it across stage boundaries and
    # watchdog resumes (static mode resets; explicit bc_weight overrides)
    fresh.current_alpha_b = 77.0
    fresh.train(num_epoch=0, lr=1e-3)
    assert fresh.current_alpha_b == 77.0
    fresh.train(num_epoch=0, lr=1e-3, bc_weight=5.0)
    assert fresh.current_alpha_b == 5.0
    off.current_alpha_b = 77.0
    off.train(num_epoch=0, lr=1e-3)
    assert off.current_alpha_b == 10.0


def test_stall_gain_criterion():
    """Min-based stall gain: flat -> ~0 (stall), oscillating-but-improving
    -> positive (no stall), oscillating around a floor -> ~0 even when the
    endpoint delta is large (the Re=5000 false-fire mode)."""
    from nsfnet_tpu.training.solver import stall_gain

    flat = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    assert abs(stall_gain(flat, 3)) < 1e-12

    improving_noisy = [1.0, 0.8, 0.9, 0.6, 0.75, 0.5]
    assert stall_gain(improving_noisy, 3) > 0.1

    # converged + noise: last value jumps UP 50% vs 3-intervals-ago —
    # endpoint gain would be -50% (fires); min-based reads ~0 improvement
    # but NOT a huge negative
    osc_floor = [1.0, 0.5, 0.48, 0.52, 0.49, 0.72]
    g = stall_gain(osc_floor, 3)
    assert -0.05 < g < 0.05


def test_stall_floor_blocks_early_advance():
    """The stall detector must NEVER advance a stage before stall_min_epochs,
    even when the eq-loss track reads as fully stalled from the first log
    boundary (threshold so large every gain qualifies). Regression for the
    Re=5000 gentle campaign's S1/S2 early-advance lock-in (VALIDATION.md):
    floor 37 with log_interval 10 -> earliest legal advance is epoch 40."""
    solver = _make_solver(log_interval=10)
    _attach_data(solver, n_f=128)
    solver.train(num_epoch=200, lr=1e-3, advance_on_stall=True,
                 stall_threshold=1e9, stall_window=1, stall_min_epochs=37)
    advanced_at = int(solver.state.epoch_in_stage)
    assert advanced_at == 40, advanced_at   # not 20 or 30 (pre-floor)
    # fast-forward contract: the stage still accounts its full budget
    assert solver.global_step == 200
