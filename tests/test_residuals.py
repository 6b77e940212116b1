"""NS residual math vs a manufactured solution with closed-form derivatives.

u = sin(x)cos(y), v = -cos(x)sin(y) is divergence-free; p = sin(x+y).
Every term of eq1/eq2/eq3 (and the EVM eq4) is checked in closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsfnet_tpu.ops.derivatives import derivatives_2d
from nsfnet_tpu.ops.residuals import (
    ev_ns_residuals,
    next_vis_t,
    ns_residuals,
    update_vis_t_minus,
)


def taylor_green_like(x):
    a, b = x[:, 0:1], x[:, 1:2]
    u = jnp.sin(a) * jnp.cos(b)
    v = -jnp.cos(a) * jnp.sin(b)
    p = jnp.sin(a + b)
    return jnp.concatenate([u, v, p], axis=1)


def _expected(pts, re, vis_t=0.0):
    a, b = pts[:, 0:1], pts[:, 1:2]
    u, v = np.sin(a) * np.cos(b), -np.cos(a) * np.sin(b)
    u_x, u_y = np.cos(a) * np.cos(b), -np.sin(a) * np.sin(b)
    v_x, v_y = np.sin(a) * np.sin(b), -np.cos(a) * np.cos(b)
    lap_u, lap_v = -2 * u, -2 * v
    p_x = p_y = np.cos(a + b)
    nu = 1.0 / re + vis_t
    eq1 = u * u_x + v * u_y + p_x - nu * lap_u
    eq2 = u * v_x + v * v_y + p_y - nu * lap_v
    eq3 = u_x + v_y
    return eq1, eq2, eq3, u, v


def test_vanilla_residuals_closed_form(x64):
    pts = np.random.default_rng(0).uniform(0.1, 0.9, (64, 2))
    re = 100.0
    derivs = derivatives_2d(taylor_green_like, jnp.asarray(pts))
    res = ns_residuals(derivs, re)
    eq1, eq2, eq3, _, _ = _expected(pts, re)
    np.testing.assert_allclose(np.asarray(res.eq1), eq1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.eq2), eq2, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.eq3), eq3, atol=1e-10)


def test_ev_residuals_closed_form_and_eq4(x64):
    pts = np.random.default_rng(1).uniform(0.1, 0.9, (64, 2))
    re = 2000.0
    vis_val = 0.003
    derivs = derivatives_2d(taylor_green_like, jnp.asarray(pts))
    e = jnp.full((64, 1), 0.01)
    vis_t = jnp.full((64, 1), vis_val)
    res = ev_ns_residuals(derivs, e, vis_t, re)
    eq1, eq2, eq3, u, v = _expected(pts, re, vis_val)
    np.testing.assert_allclose(np.asarray(res.eq1), eq1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.eq2), eq2, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.eq3), eq3, atol=1e-10)
    expected_eq4 = eq1 * (u - 0.5) + eq2 * (v - 0.5) - 0.01
    np.testing.assert_allclose(np.asarray(res.eq4), expected_eq4, rtol=1e-9, atol=1e-12)


def test_coordinate_transform_scaling(x64):
    """A [0,1]->[-1,1] transform: derivatives wrt network coords scale by 2,
    second derivatives by 4 (ev-NSFnet/pinn_solver.py:311-324)."""
    pts = np.random.default_rng(2).uniform(0.1, 0.9, (32, 2))
    re = 100.0

    def physical(x):  # function of physical coords
        return taylor_green_like(x)

    def network_frame(z):  # network sees z = 2x-1, so x = (z+1)/2
        return physical((z + 1.0) / 2.0)

    z = jnp.asarray(2.0 * pts - 1.0)
    derivs = derivatives_2d(network_frame, z)
    res = ns_residuals(derivs, re, coord_scale=2.0)
    eq1, eq2, eq3, _, _ = _expected(pts, re)
    np.testing.assert_allclose(np.asarray(res.eq1), eq1, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.eq3), eq3, atol=1e-9)


def test_vis_t_lag_semantics(x64):
    """vis_t = min(20/Re, prev alpha*|e|); carry = alpha*|e|, stop-gradiented
    (ev-NSFnet/pinn_solver.py:326-334)."""
    re = 2000.0
    vis_t0 = 20.0 / re
    prev = jnp.asarray([[0.5], [0.001], [0.02]])
    vt = next_vis_t(prev, vis_t0)
    np.testing.assert_allclose(np.asarray(vt), [[vis_t0], [0.001], [0.01]])

    e = jnp.asarray([[-0.4], [0.2]])
    carry = update_vis_t_minus(e, jnp.asarray(0.05))
    np.testing.assert_allclose(np.asarray(carry), [[0.02], [0.01]])
    # stop_gradient: no gradient flows through the carry
    g = jax.grad(lambda ee: jnp.sum(update_vis_t_minus(ee, 0.05)))(e)
    np.testing.assert_allclose(np.asarray(g), 0.0)
