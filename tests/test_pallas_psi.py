"""Fused third-order Pallas kernel vs the closed-form XLA streamfunction
engine (interpret mode on CPU): bundle values AND parameter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsfnet_tpu.models.mlp import init_mlp
from nsfnet_tpu.ops.derivatives import mlp_psi_derivatives_2d
from nsfnet_tpu.ops.pallas_mlp import TILE
from nsfnet_tpu.ops.pallas_psi import bwd_tile_for_psi, make_fused_psi_derivatives

fused_psi = make_fused_psi_derivatives("highest")


def _setup(n=TILE, sizes=(2, 80, 80, 80, 80, 80, 80, 2), seed=0):
    params = init_mlp(jax.random.PRNGKey(seed), sizes)
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 2), jnp.float32)
    return params, x


def test_forward_matches_closed_form():
    params, x = _setup()
    ref = mlp_psi_derivatives_2d(params, x, uv_scale=1.7)
    got = fused_psi(params, x, 1.7)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-6)


def test_forward_multi_tile():
    params, x = _setup(n=2 * TILE, sizes=(2, 40, 40, 40, 2))
    ref = mlp_psi_derivatives_2d(params, x)
    got = fused_psi(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-6)


def test_gradients_match_autodiff():
    """Hand-derived third-order adjoint == jax.grad through the closed
    form, on a momentum-residual-shaped loss touching every bundle slot."""
    params, x = _setup(n=TILE, sizes=(2, 32, 32, 32, 2))

    def loss(engine):
        def f(p):
            o, ox, oy, oxx, oyy = engine(p, x, 2.0)
            u, v = o[:, 0:1], o[:, 1:2]
            eq1 = u * ox[:, 0:1] + v * oy[:, 0:1] + ox[:, 2:3] \
                - 0.01 * (oxx[:, 0:1] + oyy[:, 0:1])
            eq2 = u * ox[:, 1:2] + v * oy[:, 1:2] + oy[:, 2:3] \
                - 0.01 * (oxx[:, 1:2] + oyy[:, 1:2])
            return jnp.mean(eq1**2 + eq2**2) + jnp.mean(o**2)
        return f

    g_ref = jax.grad(loss(mlp_psi_derivatives_2d))(params)
    g_got = jax.grad(loss(fused_psi))(params)
    for (wr, br), (wg, bg) in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(wg), np.asarray(wr),
                                   rtol=5e-4, atol=5e-6)
        np.testing.assert_allclose(np.asarray(bg), np.asarray(br),
                                   rtol=5e-4, atol=5e-6)


def test_gradients_multi_tile_accumulation():
    params, x = _setup(n=3 * TILE, sizes=(2, 16, 16, 2))

    def f(engine):
        return lambda p: sum(jnp.mean(t**2) for t in engine(p, x))

    g_ref = jax.grad(f(mlp_psi_derivatives_2d))(params)
    g_got = jax.grad(f(fused_psi))(params)
    for (wr, br), (wg, bg) in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(wg), np.asarray(wr),
                                   rtol=5e-4, atol=5e-6)


def test_x_receives_zero_cotangent():
    params, x = _setup(n=TILE, sizes=(2, 16, 2))
    g = jax.grad(lambda xx: jnp.sum(fused_psi(params, xx)[0]))(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_bwd_tile_budget():
    assert bwd_tile_for_psi(6, 80) >= 64
    # every auto-picked tile must divide TILE (the forward pad granule)
    for args in ((6, 80), (8, 512), (6, 160), (2, 16)):
        t = bwd_tile_for_psi(*args)
        assert TILE % t == 0 and t >= 8, (args, t)
    # wide-deep nets fall to small tiles to stay within the VMEM budget
    assert bwd_tile_for_psi(8, 512) <= 32
