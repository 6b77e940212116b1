"""Fused residual-loss Pallas kernel vs the stream-engine composition.

The fused kernel (ops/pallas_residual.py) must reproduce — values AND
gradients — the reference chain
    engine -> ops/residuals -> ops/losses masked sums
exactly as make_loss_fn composes it (ev-NSFnet/pinn_solver.py:326-397
semantics). Runs in Pallas interpret mode on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nsfnet_tpu.models.mlp import init_mlp
from nsfnet_tpu.ops import losses as L
from nsfnet_tpu.ops import residuals as R
from nsfnet_tpu.ops.derivatives import mlp_derivatives_2d
from nsfnet_tpu.ops.pallas_mlp import TILE
from nsfnet_tpu.ops.pallas_residual import make_fused_residual_loss
from nsfnet_tpu.training.step import StageScalars, make_loss_fn


def _setup(n=TILE, sizes=(2, 32, 32, 32, 3), seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    params = init_mlp(ks[0], sizes)
    x = jax.random.uniform(ks[1], (n, 2), jnp.float32, -1.0, 1.0)
    e = 0.1 * jax.random.normal(ks[2], (n, 1), jnp.float32)
    vis_t = jnp.abs(0.01 * jax.random.normal(ks[3], (n, 1), jnp.float32))
    # SDF-like weights with a padded (zero-weight) tail, mean ~1
    eq_w = jax.random.uniform(ks[4], (n, 1), jnp.float32, 0.2, 1.8)
    eq_w = eq_w.at[-37:].set(0.0)
    return params, x, e, vis_t, eq_w


def _ref_sums_evm(params, x, e, vis_t, eq_w, re, scale):
    derivs = mlp_derivatives_2d(params, x)
    res = R.ev_ns_residuals(derivs, e, vis_t, re, scale)
    return jnp.stack([L.masked_sum_sq(res.eq1, eq_w),
                      L.masked_sum_sq(res.eq2, eq_w),
                      L.masked_sum_sq(res.eq3, eq_w),
                      L.masked_sum_sq(res.eq4, eq_w)])


def _ref_sums_vanilla(params, x, eq_w, re, scale):
    derivs = mlp_derivatives_2d(params, x)
    res = R.ns_residuals(derivs, re, scale)
    return jnp.stack([L.masked_sum_sq(res.eq1, eq_w),
                      L.masked_sum_sq(res.eq2, eq_w),
                      L.masked_sum_sq(res.eq3, eq_w)])


def test_sums_match_evm():
    params, x, e, vis_t, eq_w = _setup()
    fused = make_fused_residual_loss("highest", 2.0, True)
    got = fused(params, x, e, vis_t, eq_w, jnp.float32(100.0))
    ref = _ref_sums_evm(params, x, e, vis_t, eq_w, 100.0, 2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-7)


def test_sums_match_multi_tile():
    params, x, e, vis_t, eq_w = _setup(n=2 * TILE, sizes=(2, 16, 16, 3))
    fused = make_fused_residual_loss("highest", 1.0, True)
    got = fused(params, x, e, vis_t, eq_w, jnp.float32(3000.0))
    ref = _ref_sums_evm(params, x, e, vis_t, eq_w, 3000.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-7)


def test_sums_match_vanilla():
    params, x, _, _, eq_w = _setup(sizes=(2, 24, 24, 3))
    fused = make_fused_residual_loss("highest", 1.0, False)
    got = fused(params, x, eq_w, jnp.float32(400.0))
    ref = _ref_sums_vanilla(params, x, eq_w, 400.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-7)


def _tree_close(got, ref, rtol=5e-4, atol=5e-6):
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=rtol, atol=atol)


def test_grads_match_evm():
    """Hand-derived residual adjoint == jax.grad through the stream chain,
    including the e (EVM net output) cotangent and eq4's cross terms."""
    params, x, e, vis_t, eq_w = _setup(sizes=(2, 32, 32, 32, 3))
    cw = jnp.asarray([1.0, 0.7, 1.3, 0.1], jnp.float32)  # mixed cotangent
    fused = make_fused_residual_loss("highest", 2.0, True)

    def obj_fused(p, ee):
        return jnp.dot(cw, fused(p, x, ee, vis_t, eq_w, jnp.float32(100.0)))

    def obj_ref(p, ee):
        return jnp.dot(cw, _ref_sums_evm(p, x, ee, vis_t, eq_w, 100.0, 2.0))

    g_got = jax.grad(obj_fused, argnums=(0, 1))(params, e)
    g_ref = jax.grad(obj_ref, argnums=(0, 1))(params, e)
    _tree_close(g_got, g_ref)


def test_grads_match_vanilla():
    params, x, _, _, eq_w = _setup(sizes=(2, 16, 16, 3))
    cw = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    fused = make_fused_residual_loss("highest", 1.0, False)

    def obj_fused(p):
        return jnp.dot(cw, fused(p, x, eq_w, jnp.float32(400.0)))

    def obj_ref(p):
        return jnp.dot(cw, _ref_sums_vanilla(p, x, eq_w, 400.0, 1.0))

    _tree_close(jax.grad(obj_fused)(params), jax.grad(obj_ref)(params))


def test_lane_pad_exact():
    """Hidden-dim lane padding is numerically exact on the fused loss."""
    params, x, e, vis_t, eq_w = _setup(sizes=(2, 24, 24, 3))
    base = make_fused_residual_loss("highest", 1.0, True, lane_pad=0)
    padded = make_fused_residual_loss("highest", 1.0, True, lane_pad=128)
    re = jnp.float32(1000.0)
    np.testing.assert_allclose(
        np.asarray(padded(params, x, e, vis_t, eq_w, re)),
        np.asarray(base(params, x, e, vis_t, eq_w, re)), rtol=1e-6, atol=1e-8)

    def obj(fn):
        return lambda p: jnp.sum(fn(p, x, e, vis_t, eq_w, re))

    # padding reorders the fp32 reductions; contributions are structurally
    # zero but round-off differs at ~1e-7
    _tree_close(jax.grad(obj(padded))(params), jax.grad(obj(base))(params),
                rtol=2e-4, atol=1e-6)


def _loss_fns(params, fused):
    """make_loss_fn pair (fused vs stream) over identical static config."""
    evm_params = init_mlp(jax.random.PRNGKey(9), (2, 20, 20, 1))

    def apply_evm(p, x):
        h = x
        for w, b in p[:-1]:
            h = jnp.tanh(h @ w + b)
        return h @ p[-1][0] + p[-1][1]

    common = dict(
        apply_main=lambda p, x: mlp_derivatives_2d(p, x)[0],
        apply_evm=apply_evm,
        coord_scale=2.0,
        alpha_e=1.0,
        alpha_s=10.0,
        entropy_weight=0.1,
        evm=True,
    )
    lf_stream = make_loss_fn(engine=mlp_derivatives_2d, **common)
    lf_fused = make_loss_fn(engine=mlp_derivatives_2d, fused_eq_loss=fused,
                            **common)
    return lf_stream, lf_fused, evm_params


def test_eq_loss_fn_paths_agree():
    """The make_loss_fn fused branch == the stream branch: component
    values, vis_t carry, and grads wrt BOTH nets (main via the kernel
    adjoint, EVM via the g_e chain)."""
    params, x, _, vis_t_minus, eq_w = _setup(sizes=(2, 32, 32, 32, 3))
    fused = make_fused_residual_loss("highest", 2.0, True)
    lf_stream, lf_fused, evm_params = _loss_fns(params, fused)
    sc = StageScalars(lr=jnp.float32(1e-3), alpha_evm=jnp.float32(0.03),
                      re=jnp.float32(100.0), alpha_b=jnp.float32(10.0))
    x_f, y_f = x[:, 0:1], x[:, 1:2]
    n_f = jnp.float32(TILE - 37)

    def run(lf, p_all):
        val, aux = lf.eq_loss_fn(p_all, x_f, y_f, eq_w, n_f, vis_t_minus, sc)
        return val, aux

    v_s, aux_s = run(lf_stream, (params, evm_params))
    v_f, aux_f = run(lf_fused, (params, evm_params))
    np.testing.assert_allclose(float(v_f), float(v_s), rtol=2e-5)
    for a, b in zip(aux_f, aux_s):  # l1..l4, vis_t_mean, carry
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)

    def total(lf):
        def f(p_all):
            val, _ = lf.eq_loss_fn(p_all, x_f, y_f, eq_w, n_f, vis_t_minus, sc)
            return val
        return f

    g_s = jax.grad(total(lf_stream))((params, evm_params))
    g_f = jax.grad(total(lf_fused))((params, evm_params))
    _tree_close(g_f, g_s)
