"""Backbone networks: shapes, parameter counts, init statistics, KAN basis."""

import jax
import jax.numpy as jnp
import numpy as np

from nsfnet_tpu.models.kan import KAN, bspline_basis
from nsfnet_tpu.models.mlp import MLP, init_mlp, layer_sizes, mlp_apply, param_count


def test_reference_param_counts():
    """Main net 6x80 = 32,883 params; EVM 4x40 = 5,081; v1 4x120 = 44,283
    (BASELINE.md model sizes row)."""
    main = MLP(num_ins=2, num_outs=3, num_layers=6, hidden_size=80)
    evm = MLP(num_ins=2, num_outs=1, num_layers=4, hidden_size=40)
    v1 = MLP(num_ins=2, num_outs=3, num_layers=4, hidden_size=120)
    key = jax.random.PRNGKey(0)
    assert param_count(main.init(key)) == 32883
    assert param_count(evm.init(key)) == 5081
    assert param_count(v1.init(key)) == 44283


def test_mlp_forward_shape_and_dtype():
    net = MLP(num_ins=2, num_outs=3, num_layers=4, hidden_size=32)
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.zeros((17, 2))
    out = net.apply(params, x)
    assert out.shape == (17, 3)
    assert out.dtype == jnp.float32


def test_torch_like_init_bounds():
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) like torch.nn.Linear defaults."""
    params = init_mlp(jax.random.PRNGKey(0), (2, 80, 3))
    (w0, b0), (w1, b1) = params
    assert np.abs(w0).max() <= 1 / np.sqrt(2) + 1e-6
    assert np.abs(w1).max() <= 1 / np.sqrt(80) + 1e-6
    assert np.abs(b1).max() <= 1 / np.sqrt(80) + 1e-6


def test_layer_sizes_recipe():
    assert layer_sizes(2, 3, 6, 80) == (2, 80, 80, 80, 80, 80, 80, 3)


def test_bspline_partition_of_unity(x64):
    """Degree-k B-spline basis sums to 1 on the interior of the grid."""
    x = jnp.linspace(-0.99, 0.99, 101, dtype=jnp.float64)
    basis = bspline_basis(x, grid=5, k=3)
    assert basis.shape == (101, 8)
    np.testing.assert_allclose(np.asarray(basis.sum(-1)), 1.0, rtol=1e-10)


def test_kan_forward_and_smoothness():
    net = KAN(width=(2, 16, 16, 8))
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 2))
    out = net.apply(params, x)
    assert out.shape == (33, 8)
    # differentiable through jvp-of-jvp (the residual engine path)
    from nsfnet_tpu.ops.derivatives import derivatives_2d

    derivs = derivatives_2d(lambda z: net.apply(params, z), x)
    for d in derivs:
        assert np.all(np.isfinite(np.asarray(d)))


def test_kan_derivatives_vs_finite_difference():
    jax.config.update("jax_enable_x64", True)
    try:
        net = KAN(width=(2, 8, 4))
        params = net.init(jax.random.PRNGKey(2), dtype=jnp.float64)
        x = jnp.asarray(np.random.default_rng(3).uniform(0.2, 0.8, (16, 2)))
        from nsfnet_tpu.ops.derivatives import derivatives_2d

        _, fx, fy, fxx, fyy = derivatives_2d(lambda z: net.apply(params, z), x)
        eps = 1e-5
        ex = jnp.asarray([eps, 0.0])
        f = lambda z: np.asarray(net.apply(params, z))
        fd_x = (f(x + ex) - f(x - ex)) / (2 * eps)
        fd_xx = (f(x + ex) - 2 * f(x) + f(x - ex)) / eps**2
        np.testing.assert_allclose(np.asarray(fx), fd_x, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fxx), fd_xx, rtol=1e-3, atol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_fourier_mlp_derivatives_match_autodiff(x64):
    """Fourier-embedded MLP under the generic jvp-of-jvp engine must match
    jax.jacfwd / jax.hessian at float64."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nsfnet_tpu.models.mlp import MLP
    from nsfnet_tpu.ops.derivatives import derivatives_2d

    net = MLP(num_layers=2, hidden_size=12, fourier_features=6,
              fourier_sigma=1.5)
    p = net.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (7, 2), jnp.float64)
    f = lambda z: net.apply(p, z)
    out, dx, dy, dxx, dyy = derivatives_2d(f, x)

    jac = jax.vmap(jax.jacfwd(lambda z: f(z[None, :])[0]))(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(jac[..., 0]),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(jac[..., 1]),
                               rtol=1e-9, atol=1e-12)
    hes = jax.vmap(jax.hessian(lambda z: f(z[None, :])[0]))(x)
    np.testing.assert_allclose(np.asarray(dxx), np.asarray(hes[..., 0, 0]),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dyy), np.asarray(hes[..., 1, 1]),
                               rtol=1e-8, atol=1e-12)


def test_fourier_mlp_trains_in_solver():
    """The solver routes Fourier nets through the generic engine and the
    loss decreases."""
    import numpy as np

    from nsfnet_tpu.data.cavity import CavityData
    from nsfnet_tpu.training.solver import PINNSolver

    s = PINNSolver(Re=100, layers=3, layers_1=2, hidden_size=24,
                   hidden_size_1=12, N_f=512, alpha_evm=0.03, bc_weight=10,
                   eq_weight=1, log_interval=10**9, checkpoint_freq=10**9,
                   seed=7, fourier_features=8)
    assert s._generic_engine and s.engine != "pallas"
    data = CavityData(N_f=512, sort_training_points=False, seed=0)
    s.set_boundary_data(X=data.boundary_data())
    s.set_eq_training_data(X=data.training_data())
    s._ensure_ready()
    loss0, _ = s._loss_fn((s.state.params, s.state.params_evm), s._batch,
                          s.state.vis_t_minus, s._stage_scalars(0.0))
    s.train(num_epoch=100, lr=1e-3)
    loss1, _ = s._loss_fn((s.state.params, s.state.params_evm), s._batch,
                          s.state.vis_t_minus, s._stage_scalars(0.0))
    assert float(loss1) < float(loss0)
