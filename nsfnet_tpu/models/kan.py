"""Functional Kolmogorov-Arnold Network (KAN) backbone.

Capability parity with the reference's physics-informed KAN notebook
(/root/reference/physics_informed_kan.ipynb cell 0), which builds a pykan
`KAN(width=[2,16,16,8], grid=5, k=3, grid_eps=1.0)` and trains it as a PINN.

This is a from-scratch JAX implementation of the same model family: each
layer maps x in R^in -> R^out via out_j = sum_i phi_ij(x_i) where
phi_ij(x) = w_base_ij * silu(x) + w_sp_ij * sum_m c_ijm B_m(x), with B_m a
degree-k B-spline basis on a uniform grid over [-grid_range, grid_range]
(grid_eps=1.0 in the notebook means a pure uniform grid — no adaptive
re-gridding, which is what we implement).

The basis is evaluated with the Cox-de Boor recursion written as static
jnp ops, so the whole network is smooth almost everywhere and supports the
framework's jvp-of-jvp residual engine unchanged. Everything is batched,
static-shaped, and fuses under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

KanLayerParams = Tuple[jax.Array, jax.Array, jax.Array]  # (coef, w_base, w_sp)
KanParams = Tuple[KanLayerParams, ...]


def _knots(grid: int, k: int, grid_range: Tuple[float, float], dtype=jnp.float32) -> jnp.ndarray:
    """Uniform knot vector extended by k intervals on each side."""
    lo, hi = grid_range
    h = (hi - lo) / grid
    return jnp.arange(-k, grid + k + 1, dtype=dtype) * h + lo


def _cox_de_boor(x: jax.Array, t: jnp.ndarray, degree: int) -> jax.Array:
    """Cox-de Boor recursion to `degree` over an explicit knot vector t.
    Returns [..., len(t) - 1 - degree] basis values. Uniform-knot safe
    (denominators are positive multiples of the spacing)."""
    xe = x[..., None]
    b = ((xe >= t[:-1]) & (xe < t[1:])).astype(x.dtype)
    for d in range(1, degree + 1):
        left = (xe - t[: -(d + 1)]) / (t[d:-1] - t[: -(d + 1)]) * b[..., :-1]
        right = (t[d + 1:] - xe) / (t[d + 1:] - t[1:-d]) * b[..., 1:]
        b = left + right
    return b


def bspline_basis_derivs(x: jax.Array, grid: int, k: int,
                         grid_range=(-1.0, 1.0)):
    """(B, B', B'') of the degree-k basis at x — closed form for the PINN
    residual engine (needs value + 1st + 2nd derivatives in one pass).

    On a uniform knot vector with spacing h the standard derivative
    recurrences collapse to finite differences of lower-degree bases:
        B'_m  = (B_{m,k-1} - B_{m+1,k-1}) / h
        B''_m = (B_{m,k-2} - 2 B_{m+1,k-2} + B_{m+2,k-2}) / h^2
    Requires k >= 2 (true for the notebook's k=3). Each array is
    [..., grid + k].
    """
    assert k >= 2, "second derivatives need spline degree >= 2"
    lo, hi = grid_range
    h = (hi - lo) / grid
    t = _knots(grid, k, grid_range, dtype=x.dtype)
    # ONE degree-k recursion: the degree k-2 and k-1 bases the derivative
    # differences need are loop intermediates, not separate recursions
    xe = x[..., None]
    b = ((xe >= t[:-1]) & (xe < t[1:])).astype(x.dtype)
    b_k2 = b if k == 2 else None
    b_k1 = None
    for d in range(1, k + 1):
        left = (xe - t[: -(d + 1)]) / (t[d:-1] - t[: -(d + 1)]) * b[..., :-1]
        right = (t[d + 1:] - xe) / (t[d + 1:] - t[1:-d]) * b[..., 1:]
        b = left + right
        if d == k - 2:
            b_k2 = b
        elif d == k - 1:
            b_k1 = b
    b_k = b                                # [..., grid + k]
    db = (b_k1[..., :-1] - b_k1[..., 1:]) / h
    d2b = (b_k2[..., :-2] - 2.0 * b_k2[..., 1:-1] + b_k2[..., 2:]) / (h * h)
    return b_k, db, d2b


def bspline_basis(x: jax.Array, grid: int, k: int, grid_range=(-1.0, 1.0)) -> jax.Array:
    """Degree-k B-spline basis values for each scalar in x.

    x: [...]; returns [..., grid + k] basis values (Cox-de Boor).

    ASSUMES A UNIFORM KNOT VECTOR (what _knots produces): every Cox-de Boor
    denominator is a positive multiple of the knot spacing, so no division
    by zero can occur and the recursion is jvp-of-jvp-safe. Extending to
    adaptive/non-uniform grids (pykan grid_eps < 1) requires adding
    jnp.where guards on left_den/right_den first.
    """
    t = _knots(grid, k, grid_range, dtype=x.dtype)  # [grid + 2k + 1]
    return _cox_de_boor(x, t, k)  # [..., grid + k]


def init_kan(
    key: jax.Array,
    width: Sequence[int],
    grid: int = 5,
    k: int = 3,
    noise_scale: float = 0.1,
    dtype=jnp.float32,
) -> KanParams:
    """Initialize per-layer (coef, w_base, w_sp).

    Mirrors pykan's default init shape: small random spline coefficients
    (noise_scale / grid), base weights Xavier-ish, spline mix weights 1.
    The notebook sets noise_scale_base=0 -> w_base starts at kaiming-like
    scale but the *base noise* is zero; we keep w_base ~ Xavier which is the
    pykan default path for scale_base.
    """
    params = []
    n_basis = grid + k
    for fan_in, fan_out in zip(width[:-1], width[1:]):
        key, ck, bk = jax.random.split(key, 3)
        coef = noise_scale / grid * jax.random.normal(ck, (fan_in, fan_out, n_basis), dtype)
        limit = jnp.sqrt(6.0 / (fan_in + fan_out))
        w_base = jax.random.uniform(bk, (fan_in, fan_out), dtype, -limit, limit)
        w_sp = jnp.ones((fan_in, fan_out), dtype)
        params.append((coef, w_base, w_sp))
    return tuple(params)


def kan_layer_apply(layer: KanLayerParams, x: jax.Array, grid: int, k: int,
                    grid_range=(-1.0, 1.0)) -> jax.Array:
    coef, w_base, w_sp = layer
    basis = bspline_basis(x, grid, k, grid_range)          # [N, in, n_basis]
    spline = jnp.einsum("nib,iob->nio", basis, coef)        # [N, in, out]
    base = jax.nn.silu(x)                                   # [N, in]
    phi = w_base[None] * base[..., None] + w_sp[None] * spline
    return jnp.sum(phi, axis=1)                             # [N, out]


def kan_apply(params: KanParams, x: jax.Array, grid: int = 5, k: int = 3,
              grid_range=(-1.0, 1.0)) -> jax.Array:
    h = x
    for layer in params:
        h = kan_layer_apply(layer, h, grid, k, grid_range)
    return h


@dataclasses.dataclass(frozen=True)
class KAN:
    """Descriptor with the notebook's defaults: width=[2,16,16,8], grid=5, k=3."""

    width: Tuple[int, ...] = (2, 16, 16, 8)
    grid: int = 5
    k: int = 3
    grid_range: Tuple[float, float] = (-1.0, 1.0)
    noise_scale: float = 0.1

    def init(self, key: jax.Array, dtype=jnp.float32) -> KanParams:
        return init_kan(key, self.width, self.grid, self.k, self.noise_scale, dtype)

    def apply(self, params: KanParams, x: jax.Array) -> jax.Array:
        return kan_apply(params, x, self.grid, self.k, self.grid_range)
