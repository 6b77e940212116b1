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
