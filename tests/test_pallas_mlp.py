"""Fused Pallas kernel vs the XLA tangent-propagation engine.

Runs in Pallas interpret mode on CPU (the kernels detect the platform);
values AND parameter gradients must match the reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsfnet_tpu.models.mlp import init_mlp
from nsfnet_tpu.ops.derivatives import mlp_derivatives_2d
from nsfnet_tpu.ops.pallas_mlp import TILE, fused_mlp_derivatives, pad_for_pallas


def _setup(n=TILE, sizes=(2, 80, 80, 80, 80, 80, 80, 3), seed=0):
    params = init_mlp(jax.random.PRNGKey(seed), sizes)
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 2), jnp.float32)
    return params, x


def test_forward_matches_xla_engine():
    params, x = _setup()
    ref = mlp_derivatives_2d(params, x)
    got = fused_mlp_derivatives(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-5, atol=1e-6)


def test_forward_multi_tile():
    params, x = _setup(n=2 * TILE, sizes=(2, 40, 40, 40, 3))
    ref = mlp_derivatives_2d(params, x)
    got = fused_mlp_derivatives(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-5, atol=1e-6)


def test_gradients_match_autodiff():
    """Hand-written backward kernel == jax.grad through the XLA engine,
    on a PINN-shaped loss touching all five output streams."""
    params, x = _setup(n=TILE, sizes=(2, 32, 32, 32, 3))

    def loss(engine):
        def f(p):
            o, ox, oy, oxx, oyy = engine(p, x)
            u, v = o[:, 0:1], o[:, 1:2]
            eq1 = u * ox[:, 0:1] + v * oy[:, 0:1] + ox[:, 2:3] \
                - 0.01 * (oxx[:, 0:1] + oyy[:, 0:1])
            eq2 = u * ox[:, 1:2] + v * oy[:, 1:2] + oy[:, 2:3] \
                - 0.01 * (oxx[:, 1:2] + oyy[:, 1:2])
            eq3 = ox[:, 0:1] + oy[:, 1:2]
            return jnp.mean(eq1**2 + eq2**2 + eq3**2) + jnp.mean(o**2)
        return f

    g_ref = jax.grad(loss(mlp_derivatives_2d))(params)
    g_got = jax.grad(loss(fused_mlp_derivatives))(params)
    for (wr, br), (wg, bg) in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(wg), np.asarray(wr), rtol=5e-4, atol=2e-6)
        np.testing.assert_allclose(np.asarray(bg), np.asarray(br), rtol=5e-4, atol=2e-6)


def test_gradients_multi_tile_accumulation():
    """dW accumulation across grid tiles (revisited output blocks)."""
    params, x = _setup(n=3 * TILE, sizes=(2, 16, 16, 3))

    def f(engine):
        return lambda p: sum(jnp.mean(t**2) for t in engine(p, x))

    g_ref = jax.grad(f(mlp_derivatives_2d))(params)
    g_got = jax.grad(f(fused_mlp_derivatives))(params)
    for (wr, br), (wg, bg) in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(wg), np.asarray(wr), rtol=5e-4, atol=2e-6)


def test_x_receives_zero_cotangent():
    params, x = _setup(n=TILE, sizes=(2, 16, 3))
    g = jax.grad(lambda xx: jnp.sum(fused_mlp_derivatives(params, xx)[0]))(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_pad_helper():
    assert pad_for_pallas(1) == TILE
    assert pad_for_pallas(TILE) == TILE
    assert pad_for_pallas(TILE + 1) == 2 * TILE


def test_lane_padded_engine_exact():
    """lane_pad=128 (MXU occupancy experiment) is numerically EXACT:
    padded units carry structural zeros; values and gradients match the
    unpadded engine."""
    from nsfnet_tpu.ops.pallas_mlp import make_fused_mlp_derivatives

    params, x = _setup(n=TILE, sizes=(2, 80, 80, 80, 3), seed=4)
    plain = make_fused_mlp_derivatives("highest", 0)
    padded = make_fused_mlp_derivatives("highest", 128)

    for r, g in zip(plain(params, x), padded(params, x)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-7)

    def f(engine):
        return lambda p: sum(jnp.mean(t**2) for t in engine(p, x))

    g_ref = jax.grad(f(plain))(params)
    g_got = jax.grad(f(padded))(params)
    for (wr, br), (wg, bg) in zip(g_ref, g_got):
        assert wg.shape == wr.shape and bg.shape == br.shape
        np.testing.assert_allclose(np.asarray(wg), np.asarray(wr),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(bg), np.asarray(br),
                                   rtol=1e-5, atol=1e-7)

    import pytest

    with pytest.raises(ValueError):
        make_fused_mlp_derivatives("highest", 100)


def test_wide_network_grads():
    """Dynamic backward tiling keeps wide nets within the VMEM budget."""
    from nsfnet_tpu.ops.pallas_mlp import bwd_tile_for

    assert bwd_tile_for(6, 80) == 256
    assert bwd_tile_for(6, 256) <= 128
    assert bwd_tile_for(8, 512) <= 64
    params, x = _setup(n=TILE, sizes=(2, 256, 256, 3), seed=2)

    def f(engine):
        return lambda p: sum(jnp.mean(t**2) for t in engine(p, x))

    g_ref = jax.grad(f(mlp_derivatives_2d))(params)
    g_got = jax.grad(f(fused_mlp_derivatives))(params)
    for (wr, _), (wg, _) in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(wg), np.asarray(wr), rtol=1e-3, atol=5e-6)
