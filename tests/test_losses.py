"""Loss assembly: masked means, padding invariance, NaN-masked pressure."""

import jax.numpy as jnp
import numpy as np

from nsfnet_tpu.ops.losses import boundary_loss, masked_mean_sq, supervised_loss


def test_masked_mean_sq_ignores_padding():
    r = jnp.asarray([1.0, 2.0, 3.0, 99.0, -99.0])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    got = masked_mean_sq(r, w, 3.0)
    np.testing.assert_allclose(float(got), (1 + 4 + 9) / 3, rtol=1e-6)


def test_masked_mean_sq_with_sdf_weights():
    """Weight applied as w * r^2 == (r*sqrt(w))^2 (pinn_solver.py:387-392)."""
    r = jnp.asarray([1.0, 2.0])
    w = jnp.asarray([0.5, 2.0])
    got = masked_mean_sq(r, w, 2.0)
    np.testing.assert_allclose(float(got), (0.5 * 1 + 2.0 * 4) / 2, rtol=1e-6)


def test_boundary_loss_padding_invariant():
    u_p = jnp.asarray([[0.5], [0.2], [7.0]])
    v_p = jnp.asarray([[0.1], [0.0], [7.0]])
    u_b = jnp.asarray([[1.0], [0.0], [0.0]])
    v_b = jnp.asarray([[0.0], [0.0], [0.0]])
    mask = jnp.asarray([[1.0], [1.0], [0.0]])
    got = boundary_loss(u_p, v_p, u_b, v_b, mask, 2.0)
    exp = ((0.5 - 1) ** 2 + 0.2**2) / 2 + (0.1**2 + 0.0) / 2
    np.testing.assert_allclose(float(got), exp, rtol=1e-6)


def test_supervised_loss_nan_pressure_masked():
    u_p = jnp.zeros((3, 1))
    v_p = jnp.zeros((3, 1))
    p_p = jnp.asarray([[1.0], [2.0], [3.0]])
    u_s = jnp.zeros((3, 1))
    v_s = jnp.zeros((3, 1))
    p_s = jnp.asarray([[1.5], [jnp.nan], [3.0]])
    mask = jnp.ones((3, 1))
    p_mask = jnp.asarray([[1.0], [0.0], [1.0]])
    p_s_clean = jnp.nan_to_num(p_s)  # solver stores nan_to_num'd targets
    got = supervised_loss(u_p, v_p, p_p, u_s, v_s, p_s_clean,
                          mask, 3.0, p_mask, 2.0)
    np.testing.assert_allclose(float(got), (0.5**2 + 0.0) / 2, rtol=1e-6)
    assert np.isfinite(float(got))
