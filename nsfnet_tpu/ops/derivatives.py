"""Forward-mode derivative engine for 2-D PINN residuals.

The reference computes u_x, u_y, u_xx, u_yy, v_*, p_x, p_y with six chained
reverse-mode `torch.autograd.grad` passes per step
(ev-NSFnet/pinn_solver.py:301-309). For a network with 2 inputs that is the
wrong mode: forward-mode needs exactly TWO second-order tangent sweeps (one
per coordinate direction) to produce every first derivative and the two
diagonal second derivatives of all outputs at once — and the whole thing is
a static, batched computation XLA fuses into a handful of MXU matmuls.

Two implementations, which must agree to machine precision (tested):

  * `derivatives_2d`      — generic jvp-of-jvp; works for ANY smooth
                            backbone (MLP, KAN, ...).
  * `mlp_derivatives_2d`  — hand-rolled value+tangent propagation through a
                            tanh MLP (the closed-form of what jvp-of-jvp
                            traces), used as the blueprint for the fused
                            Pallas kernel.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from nsfnet_tpu.models.mlp import Params

Derivs = Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]
# (out, d/dx, d/dy, d2/dx2, d2/dy2), each [N, K]


def _directional_second_order(apply_fn: Callable[[jax.Array], jax.Array],
                              x: jax.Array, v: jax.Array):
    """f(x), df·v, d2f·(v,v) via jvp of a jvp (second-order forward mode)."""

    def first_order(z):
        return jax.jvp(apply_fn, (z,), (v,))

    (out, d1), (_, d2) = jax.jvp(first_order, (x,), (v,))
    return out, d1, d2


def derivatives_2d(apply_fn: Callable[[jax.Array], jax.Array], x: jax.Array) -> Derivs:
    """All 1st and diagonal 2nd derivatives of f: [N,2] -> [N,K] wrt x and y.

    `apply_fn` must be a pure batched function (params already closed over).
    The identical primal forward appears in both sweeps; XLA CSE merges it.
    """
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0], x.dtype), x.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0], x.dtype), x.shape)
    out, fx, fxx = _directional_second_order(apply_fn, x, ex)
    _, fy, fyy = _directional_second_order(apply_fn, x, ey)
    return out, fx, fy, fxx, fyy


def first_derivatives_2d(apply_fn: Callable[[jax.Array], jax.Array], x: jax.Array):
    """(out, d/dx, d/dy) only — for first-order residual formulations
    (e.g. the reference KAN notebook's residual, which uses no Laplacian)."""
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0], x.dtype), x.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0], x.dtype), x.shape)
    out, fx = jax.jvp(apply_fn, (x,), (ex,))
    _, fy = jax.jvp(apply_fn, (x,), (ey,))
    return out, fx, fy


def mlp_derivatives_2d(params: Params, x: jax.Array) -> Derivs:
    """Closed-form value+tangent propagation through a tanh MLP.

    Carries (h, h_x, h_y, h_xx, h_yy) through each layer. For z = h W + b
    and t = tanh(z) with s = 1 - t^2 (tanh') and s' = -2 t s (tanh''):

        t_x  = s * z_x
        t_xx = -2 t s * z_x^2 + s * z_xx

    The head layer is linear. Five matmuls per layer against the SAME W —
    the memory traffic of one forward, ~5x its FLOPs, all MXU work.
    """
    n = x.shape[0]
    dt = x.dtype
    h = x
    hx = jnp.broadcast_to(jnp.asarray([1.0, 0.0], dt), (n, 2))
    hy = jnp.broadcast_to(jnp.asarray([0.0, 1.0], dt), (n, 2))
    hxx = jnp.zeros((n, 2), dt)
    hyy = jnp.zeros((n, 2), dt)

    for w, b in params[:-1]:
        z = h @ w + b
        zx, zy, zxx, zyy = hx @ w, hy @ w, hxx @ w, hyy @ w
        t = jnp.tanh(z)
        s = 1.0 - t * t
        curv = -2.0 * t * s
        h = t
        hxx = curv * zx * zx + s * zxx
        hyy = curv * zy * zy + s * zyy
        hx = s * zx
        hy = s * zy

    w, b = params[-1]
    return (h @ w + b, hx @ w, hy @ w, hxx @ w, hyy @ w)
