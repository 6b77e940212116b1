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


def _unit_tangents(x: jax.Array):
    """Coordinate-direction tangent batches.

    Wrapped in an optimization_barrier: if the tangents stay visible as
    broadcasted constants, XLA's algebraic simplifier rewrites the
    first-layer tangent matmuls into degenerate dots that crash the TPU
    fusion cost model (SIGILL CHECK-trap in
    TpuPriorityFusionQueue::NormalizedComputationCost, observed on
    libtpu/v5e). The barrier keeps them as opaque runtime values.
    """
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0], x.dtype), x.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0], x.dtype), x.shape)
    return jax.lax.optimization_barrier((ex, ey))


def derivatives_2d(apply_fn: Callable[[jax.Array], jax.Array], x: jax.Array) -> Derivs:
    """All 1st and diagonal 2nd derivatives of f: [N,2] -> [N,K] wrt x and y.

    `apply_fn` must be a pure batched function (params already closed over).
    The identical primal forward appears in both sweeps; XLA CSE merges it.
    """
    ex, ey = _unit_tangents(x)
    out, fx, fxx = _directional_second_order(apply_fn, x, ex)
    _, fy, fyy = _directional_second_order(apply_fn, x, ey)
    return out, fx, fy, fxx, fyy


def first_derivatives_2d(apply_fn: Callable[[jax.Array], jax.Array], x: jax.Array):
    """(out, d/dx, d/dy) only — for first-order residual formulations
    (e.g. the reference KAN notebook's residual, which uses no Laplacian)."""
    ex, ey = _unit_tangents(x)
    out, fx = jax.jvp(apply_fn, (x,), (ex,))
    _, fy = jax.jvp(apply_fn, (x,), (ey,))
    return out, fx, fy


def _directional_third_order(apply_fn: Callable[[jax.Array], jax.Array],
                             x: jax.Array, v: jax.Array):
    """f, Df·v, D²f·(v,v), D³f·(v,v,v) — third-order forward mode via
    jvp-of-jvp-of-jvp (Taylor-mode for one direction). Exact directional
    derivatives, NOT factorial-normalized Taylor coefficients."""

    def first(u):
        return jax.jvp(apply_fn, (u,), (v,))

    def second(w):
        return jax.jvp(first, (w,), (v,))

    ((f, d1), (_, d2)), ((_, _d2b), (_, d3)) = jax.jvp(second, (x,), (v,))
    return f, d1, d2, d3


def _psi_tangents(x: jax.Array):
    """Tangent batches for the four directions the streamfunction engine
    sweeps: e_x, e_y, (1,1), (1,-1) (opaque — see _unit_tangents)."""
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0], x.dtype), x.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0], x.dtype), x.shape)
    dp = jnp.broadcast_to(jnp.asarray([1.0, 1.0], x.dtype), x.shape)
    dm = jnp.broadcast_to(jnp.asarray([1.0, -1.0], x.dtype), x.shape)
    return jax.lax.optimization_barrier((ex, ey, dp, dm))


def psi_p_derivatives_2d(apply_fn: Callable[[jax.Array], jax.Array],
                         x: jax.Array, uv_scale: float = 1.0) -> Derivs:
    """Streamfunction-pressure formulation: derivatives of the VIRTUAL
    velocity field (u, v, p) from a net f: [N,2] -> [N,2] = (psi, p), with

        u = psi_y,   v = -psi_x   (continuity u_x + v_y == 0 EXACTLY).

    Returns the standard `Derivs` bundle with [N,3] columns (u, v, p), so
    every consumer (NS/EVM residuals, losses, LM residual vector) works
    unchanged — eq3 is identically zero by construction, a constraint the
    reference's velocity-pressure formulation can only penalize
    (NSFnet/pinn_solver.py:155-160). The momentum Laplacian needs THIRD
    derivatives of psi: four order-3 Taylor sweeps along e_x, e_y, (1,1),
    (1,-1) give all ten third-order/mixed partials (the 2-input closed-form
    the reference's 6 chained reverse-mode passes cannot reach at all).

    `uv_scale`: the coordinate-transform chain-rule factor applied ONCE to
    the psi-derived u, v values (they are physical velocities but net-frame
    derivatives of psi); the residual `_unpack` then applies its usual
    per-derivative-order scaling on top, keeping both formulations on the
    same convention. p columns are returned unscaled (p is a direct net
    output, not a psi derivative).
    """
    ex, ey, dp, dm = _psi_tangents(x)
    out, gx, gxx, gxxx = _directional_third_order(apply_fn, x, ex)
    _, gy, gyy, gyyy = _directional_third_order(apply_fn, x, ey)
    _, _, m2, m3 = _directional_third_order(apply_fn, x, dp)
    _, _, n2, n3 = _directional_third_order(apply_fn, x, dm)
    return _assemble_psi_bundle(out, gx, gy, gxx, gyy, m2, n2,
                                gxxx, gyyy, m3, n3, uv_scale)


def _assemble_psi_bundle(out, gx, gy, gxx, gyy, m2, n2,
                         gxxx, gyyy, m3, n3, uv_scale) -> Derivs:
    """Directional third-order sweep results [N,2]=(psi,p) per direction
    -> the (u, v, p) `Derivs` bundle (shared by the generic and the
    closed-form streamfunction engines; see psi_p_derivatives_2d for the
    derivation of the mixed-partial recovery)."""
    col = lambda a, k: a[:, k:k + 1]
    psi_x, psi_xx, psi_xxx = col(gx, 0), col(gxx, 0), col(gxxx, 0)
    psi_y, psi_yy, psi_yyy = col(gy, 0), col(gyy, 0), col(gyyy, 0)
    p, p_x, p_y = col(out, 1), col(gx, 1), col(gy, 1)
    # D²_(1,±1) = psi_xx ± 2 psi_xy + psi_yy
    psi_xy = (col(m2, 0) - col(n2, 0)) * 0.25
    # D³_(1,±1) = psi_xxx ± 3 psi_xxy + 3 psi_xyy ± psi_yyy
    psi_xyy = ((col(m3, 0) + col(n3, 0)) - 2.0 * psi_xxx) / 6.0
    psi_xxy = ((col(m3, 0) - col(n3, 0)) - 2.0 * psi_yyy) / 6.0

    s = uv_scale
    zero = jnp.zeros_like(p)
    cat = lambda a, b, c: jnp.concatenate([a, b, c], axis=1)
    return (
        cat(s * psi_y, -s * psi_x, p),          # (u, v, p)
        cat(s * psi_xy, -s * psi_xx, p_x),      # d/dx
        cat(s * psi_yy, -s * psi_xy, p_y),      # d/dy  (v_y = -u_x: same array)
        cat(s * psi_xxy, -s * psi_xxx, zero),   # d2/dx2 (p_xx unused)
        cat(s * psi_yyy, -s * psi_xyy, zero),   # d2/dy2
    )


def psi_p_uv(apply_fn: Callable[[jax.Array], jax.Array], x: jax.Array,
             uv_scale: float = 1.0) -> jax.Array:
    """(u, v, p) VALUES for the streamfunction formulation — the
    first-order-only companion of psi_p_derivatives_2d, used for boundary/
    supervised losses and prediction (u = s·psi_y, v = -s·psi_x)."""
    ex, ey = _unit_tangents(x)
    out, fx = jax.jvp(apply_fn, (x,), (ex,))
    _, fy = jax.jvp(apply_fn, (x,), (ey,))
    return jnp.concatenate([uv_scale * fy[:, 0:1], -uv_scale * fx[:, 0:1],
                            out[:, 1:2]], axis=1)


def tanh_chain(t: jax.Array):
    """tanh', tanh'', tanh''', tanh'''' expressed in t = tanh(z) — the ONE
    copy of the third/fourth-order tanh algebra shared by the closed-form
    XLA engine and the fused Pallas kernels (forward and adjoint); unused
    orders are dead-code-eliminated by the compiler."""
    d1 = 1.0 - t * t
    d2 = -2.0 * t * d1
    d3 = -2.0 * d1 * (1.0 - 3.0 * t * t)
    d4 = -2.0 * (d2 * (1.0 - 3.0 * t * t) - 6.0 * t * d1 * d1)
    return d1, d2, d3, d4


def mlp_psi_derivatives_2d(params: Params, x: jax.Array,
                           uv_scale: float = 1.0) -> Derivs:
    """Closed-form third-order tangent propagation through a tanh MLP —
    the streamfunction analogue of mlp_derivatives_2d (the closed form of
    what four nested-jvp sweeps trace, and the blueprint for a fused
    kernel). All four sweep directions share ONE primal forward: the
    directional tangents ride a stacked [4, N, H] axis, so each hidden
    layer is 4 batched matmuls against the same W (vs the generic path's
    4 independent traces, each re-deriving the primal for XLA CSE to
    clean up). Per layer, with t = tanh(z):

        t'   = 1 - t^2
        t''  = -2 t t'
        t''' = -2 t' (1 - 3 t^2)

    and the order-3 chain rule (Faa di Bruno) along a fixed direction:

        h1 = t' z1
        h2 = t'' z1^2 + t' z2
        h3 = t''' z1^3 + 3 t'' z1 z2 + t' z3

    First layer handled analytically: its pre-activation tangents are
    constant rows of W0 (z2 = z3 = 0), avoiding both the matmuls and the
    constant-operand dots that crash the TPU fusion cost model (see
    _unit_tangents).
    """
    w0, b0 = params[0]
    z = x @ w0 + b0
    wx, wy = w0[0], w0[1]
    dirs = jnp.stack([wx, wy, wx + wy, wx - wy])[:, None, :]  # [4, 1, H]
    t = jnp.tanh(z)
    d1, d2, d3, _ = tanh_chain(t)
    h = t
    h1 = d1[None] * dirs
    h2 = d2[None] * (dirs * dirs)
    h3 = d3[None] * (dirs * dirs * dirs)

    for w, b in params[1:-1]:
        z = h @ w + b
        z1, z2, z3 = h1 @ w, h2 @ w, h3 @ w
        t = jnp.tanh(z)
        d1, d2, d3, _ = tanh_chain(t)
        h = t
        h3 = d3 * z1 * z1 * z1 + 3.0 * d2 * z1 * z2 + d1 * z3
        h2 = d2 * z1 * z1 + d1 * z2
        h1 = d1 * z1

    w, b = params[-1]
    out = h @ w + b
    o1, o2, o3 = h1 @ w, h2 @ w, h3 @ w
    return _assemble_psi_bundle(out, o1[0], o1[1], o2[0], o2[1], o2[2], o2[3],
                                o3[0], o3[1], o3[2], o3[3], uv_scale)


def mlp_derivatives_2d(params: Params, x: jax.Array) -> Derivs:
    """Closed-form value+tangent propagation through a tanh MLP.

    Carries (h, h_x, h_y, h_xx, h_yy) through each layer. For z = h W + b
    and t = tanh(z) with s = 1 - t^2 (tanh') and s' = -2 t s (tanh''):

        t_x  = s * z_x
        t_xx = -2 t s * z_x^2 + s * z_xx

    The first layer is handled analytically: its input tangents are the
    coordinate unit vectors, so z_x/z_y are just the rows of W0 (broadcast,
    VPU work) and z_xx = z_yy = 0 — four matmuls removed, and it avoids
    constant-tangent dots that crash the TPU fusion cost model (see
    _unit_tangents). The head layer is linear. Five matmuls per hidden
    layer against the SAME W — the memory traffic of one forward, ~5x its
    FLOPs, all MXU work.
    """
    w0, b0 = params[0]
    z = x @ w0 + b0
    t = jnp.tanh(z)
    s = 1.0 - t * t
    curv = -2.0 * t * s
    wx, wy = w0[0], w0[1]  # d z0 / dx, d z0 / dy (constant rows)
    h = t
    hx = s * wx
    hy = s * wy
    hxx = curv * (wx * wx)
    hyy = curv * (wy * wy)

    for w, b in params[1:-1]:
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


def make_kan_derivatives_2d(kan) -> Callable[..., Derivs]:
    """Closed-form value+tangent propagation through a KAN backbone
    (the KAN analogue of mlp_derivatives_2d; replaces the generic
    jvp-of-jvp engine, which traces the Cox-de Boor recursion TWICE per
    direction and fuses poorly).

    Each layer is y_j = sum_i phi_ij(h_i) with
    phi_ij(z) = w_base_ij * silu(z) + w_sp_ij * sum_m c_ijm B_m(z), so the
    chain rule needs only elementwise phi', phi'' (closed-form B-spline
    derivative bases + silu derivatives) contracted against the carried
    tangents:

        y_x  = sum_i phi'(h_i) h_i,x
        y_xx = sum_i phi''(h_i) h_i,x^2 + phi'(h_i) h_i,xx

    One basis evaluation per layer serves the value and both derivative
    orders; everything is batched einsums on static shapes.
    """
    from nsfnet_tpu.models.kan import bspline_basis_derivs

    grid, k, grid_range = kan.grid, kan.k, kan.grid_range

    def engine(params, x: jax.Array) -> Derivs:
        ex, ey = _unit_tangents(x)
        h = x
        hx, hy = ex, ey
        hxx = jnp.zeros_like(x)
        hyy = jnp.zeros_like(x)
        for coef, w_base, w_sp in params:
            basis, dbasis, d2basis = bspline_basis_derivs(h, grid, k, grid_range)
            # [N, in, out] spline value/1st/2nd at each input coordinate
            sp = jnp.einsum("nib,iob->nio", basis, coef)
            dsp = jnp.einsum("nib,iob->nio", dbasis, coef)
            d2sp = jnp.einsum("nib,iob->nio", d2basis, coef)
            sig = jax.nn.sigmoid(h)
            base = h * sig                                   # silu
            dbase = sig + h * sig * (1.0 - sig)              # silu'
            d2base = sig * (1.0 - sig) * (2.0 + h * (1.0 - 2.0 * sig))  # silu''
            phi = w_base[None] * base[..., None] + w_sp[None] * sp
            dphi = w_base[None] * dbase[..., None] + w_sp[None] * dsp
            d2phi = w_base[None] * d2base[..., None] + w_sp[None] * d2sp
            y = jnp.sum(phi, axis=1)
            y_x = jnp.sum(dphi * hx[..., None], axis=1)
            y_y = jnp.sum(dphi * hy[..., None], axis=1)
            y_xx = jnp.sum(d2phi * (hx * hx)[..., None]
                           + dphi * hxx[..., None], axis=1)
            y_yy = jnp.sum(d2phi * (hy * hy)[..., None]
                           + dphi * hyy[..., None], axis=1)
            h, hx, hy, hxx, hyy = y, y_x, y_y, y_xx, y_yy
        return h, hx, hy, hxx, hyy

    return engine
