"""Forward-mode derivative engine correctness.

Strategy per SURVEY §4/§7: manufactured functions with closed-form
derivatives, checked in float64 to tight tolerances, plus cross-checks of
the generic jvp-of-jvp path against the hand-rolled tanh-MLP propagation
and against jax.jacfwd/jax.hessian ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsfnet_tpu.models.mlp import init_mlp, mlp_apply
from nsfnet_tpu.ops.derivatives import (
    derivatives_2d,
    first_derivatives_2d,
    mlp_derivatives_2d,
)


def _analytic_fn(x):
    """f: [N,2] -> [N,3] with closed-form derivatives."""
    a, b = x[:, 0:1], x[:, 1:2]
    return jnp.concatenate(
        [jnp.sin(a) * jnp.cos(b), a * a * b, jnp.exp(0.3 * a + 0.2 * b)], axis=1)


def test_analytic_first_and_second_derivatives(x64):
    pts = np.random.default_rng(0).uniform(0.1, 0.9, (64, 2))
    x = jnp.asarray(pts)
    out, fx, fy, fxx, fyy = derivatives_2d(_analytic_fn, x)
    a, b = pts[:, 0:1], pts[:, 1:2]

    np.testing.assert_allclose(fx[:, 0:1], np.cos(a) * np.cos(b), rtol=1e-12)
    np.testing.assert_allclose(fy[:, 0:1], -np.sin(a) * np.sin(b), rtol=1e-12)
    np.testing.assert_allclose(fxx[:, 0:1], -np.sin(a) * np.cos(b), rtol=1e-12)
    np.testing.assert_allclose(fyy[:, 0:1], -np.sin(a) * np.cos(b), rtol=1e-12)

    np.testing.assert_allclose(fx[:, 1:2], 2 * a * b, rtol=1e-12)
    np.testing.assert_allclose(fy[:, 1:2], a * a, rtol=1e-12)
    np.testing.assert_allclose(fxx[:, 1:2], 2 * b, rtol=1e-12)
    np.testing.assert_allclose(fyy[:, 1:2], np.zeros_like(a), atol=1e-12)

    ex = np.exp(0.3 * a + 0.2 * b)
    np.testing.assert_allclose(fx[:, 2:3], 0.3 * ex, rtol=1e-12)
    np.testing.assert_allclose(fyy[:, 2:3], 0.04 * ex, rtol=1e-12)


def test_mlp_engines_agree(x64):
    """Generic jvp-of-jvp == hand-rolled tanh propagation to fp64 precision."""
    key = jax.random.PRNGKey(1)
    params = init_mlp(key, (2, 40, 40, 40, 3), dtype=jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(2), (128, 2), jnp.float64)

    generic = derivatives_2d(lambda z: mlp_apply(params, z), x)
    fused = mlp_derivatives_2d(params, x)
    for g, f in zip(generic, fused):
        np.testing.assert_allclose(np.asarray(g), np.asarray(f), rtol=1e-10, atol=1e-12)


def test_mlp_engine_vs_jacfwd_hessian(x64):
    """Cross-check against jax.jacfwd / jax.hessian on single points."""
    key = jax.random.PRNGKey(3)
    params = init_mlp(key, (2, 20, 20, 3), dtype=jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(4), (8, 2), jnp.float64)

    _, fx, fy, fxx, fyy = mlp_derivatives_2d(params, x)

    def point_fn(pt):
        return mlp_apply(params, pt[None, :])[0]

    jac = jax.vmap(jax.jacfwd(point_fn))(x)        # [N, 3, 2]
    hess = jax.vmap(jax.hessian(point_fn))(x)      # [N, 3, 2, 2]
    np.testing.assert_allclose(np.asarray(fx), np.asarray(jac[:, :, 0]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(jac[:, :, 1]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fxx), np.asarray(hess[:, :, 0, 0]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(fyy), np.asarray(hess[:, :, 1, 1]), rtol=1e-9)


def test_first_derivatives_only(x64):
    pts = np.random.default_rng(5).uniform(0.1, 0.9, (32, 2))
    x = jnp.asarray(pts)
    out, fx, fy = first_derivatives_2d(_analytic_fn, x)
    a, b = pts[:, 0:1], pts[:, 1:2]
    np.testing.assert_allclose(fx[:, 0:1], np.cos(a) * np.cos(b), rtol=1e-12)
    np.testing.assert_allclose(fy[:, 1:2], a * a, rtol=1e-12)


def test_engines_jit_and_grad_compatible(x64):
    """The engine must sit inside value_and_grad of a scalar loss."""
    params = init_mlp(jax.random.PRNGKey(6), (2, 16, 16, 3), dtype=jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(7), (64, 2), jnp.float64)

    @jax.jit
    def loss(p):
        _, fx, fy, fxx, fyy = mlp_derivatives_2d(p, x)
        return jnp.mean(fxx**2 + fyy**2 + fx**2 + fy**2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(w))) for w, _ in g)


def test_kan_closed_form_matches_generic_engine(x64):
    """Closed-form KAN tangent propagation (make_kan_derivatives_2d) must
    agree with the generic jvp-of-jvp engine to machine precision at
    float64 (points drawn inside knot cells; both engines treat knot
    boundaries by the same a.e. convention)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nsfnet_tpu.models.kan import KAN
    from nsfnet_tpu.ops.derivatives import (derivatives_2d,
                                            make_kan_derivatives_2d)

    kan = KAN(width=(2, 9, 7, 3), grid=5, k=3)
    params = kan.init(jax.random.PRNGKey(1), dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.93, 0.93, (64, 2)))

    closed = make_kan_derivatives_2d(kan)(params, x)
    generic = derivatives_2d(lambda z: kan.apply(params, z), x)
    for c, g, name in zip(closed, generic, ("f", "fx", "fy", "fxx", "fyy")):
        np.testing.assert_allclose(np.asarray(c), np.asarray(g),
                                   rtol=1e-9, atol=1e-11, err_msg=name)


def test_kan_closed_form_second_derivative_vs_finite_difference(x64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nsfnet_tpu.models.kan import KAN
    from nsfnet_tpu.ops.derivatives import make_kan_derivatives_2d

    kan = KAN(width=(2, 8, 1), grid=5, k=3)
    params = kan.init(jax.random.PRNGKey(3), dtype=jnp.float64)
    eng = make_kan_derivatives_2d(kan)
    x0 = jnp.asarray([[0.137, -0.295]])
    eps = 1e-5

    def f(px, py):
        return float(kan.apply(params, jnp.asarray([[px, py]]))[0, 0])

    _, fx, fy, fxx, fyy = (np.asarray(a)[0, 0] for a in eng(params, x0))
    px, py = 0.137, -0.295
    assert abs(fx - (f(px + eps, py) - f(px - eps, py)) / (2 * eps)) < 1e-7
    assert abs(fy - (f(px, py + eps) - f(px, py - eps)) / (2 * eps)) < 1e-7
    assert abs(fxx - (f(px + eps, py) - 2 * f(px, py) + f(px - eps, py)) / eps**2) < 1e-5
    assert abs(fyy - (f(px, py + eps) - 2 * f(px, py) + f(px, py - eps)) / eps**2) < 1e-5
