"""Fused Pallas TPU kernel: third-order Taylor propagation for the
streamfunction-pressure formulation.

The streamfunction engine needs, per collocation point, the value of
(psi, p) plus FOUR directional derivative sweeps of order 3 (e_x, e_y,
(1,1), (1,-1) — see ops/derivatives.py:psi_p_derivatives_2d). The XLA
closed form (mlp_psi_derivatives_2d) materializes 13 per-layer streams
([N,H] x 13) through HBM; this kernel keeps them VMEM-resident across all
layers and packs them into ONE [13T, H] block so each layer is a single
MXU matmul against the shared weight matrix — the third-order analogue of
ops/pallas_mlp.py (same tiling, precision, and rematerializing-backward
design; read that module first).

Pack layout (13 streams of [T, H]):

    [ h | a_x a_y a_p a_m | b_x b_y b_p b_m | c_x c_y c_p c_m ]

where for direction k, (a, b, c) are the order-1/2/3 directional
derivatives of the carried activation. Layer transition with t = tanh(z),
d1 = 1-t^2, d2 = -2 t d1, d3 = -2 d1 (1 - 3 t^2) (order-3 Faa di Bruno
along a fixed direction; z* = packed tangent rows of the SAME matmul):

    a' = d1 z1
    b' = d2 z1^2 + d1 z2
    c' = d3 z1^3 + 3 d2 z1 z2 + d1 z3

Backward (hand-derived adjoint, d4 = d3' = -2 (d2 (1-3t^2) - 6 t d1^2)):

    g_z  = gh d1 + sum_k [ gA d2 z1 + gB (d3 z1^2 + d2 z2)
                           + gC (d4 z1^3 + 3 d3 z1 z2 + d2 z3) ]_k
    g_z1 = gA d1 + 2 gB d2 z1 + 3 gC (d3 z1^2 + d2 z2)
    g_z2 = gB d1 + 3 gC d2 z1
    g_z3 = gC d1

First layer is analytic: its direction tangents are constant rows
r_x = W0[0], r_y = W0[1], r_p = r_x + r_y, r_m = r_x - r_y with
z2 = z3 = 0, contributing both through g_z0 and directly to dW0 rows
(d(r_p)/dW0[0] = d(r_p)/dW0[1] = 1, d(r_m)/dW0[1] = -1).

Like the second-order kernel: differentiable wrt params only (collocation
coordinates are optimization constants), batch padded to TILE, dW/db
accumulate into revisited output blocks over the sequential TPU grid.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsfnet_tpu.models.mlp import Params
from nsfnet_tpu.ops.derivatives import _assemble_psi_bundle, tanh_chain
from nsfnet_tpu.ops.pallas_mlp import (
    TILE,
    _PRECISIONS,
    _dot,
    _dot_nt,
    _dot_tn,
    _flat_weights,
    _interpret,
    _weight_specs,
)

N_STREAMS = 13  # h + 4 directions x 3 orders


def fwd_tile_for_psi(n_hidden: int, hidden: int) -> int:
    """Largest forward tile whose scoped-VMEM stack fits real Mosaic.

    Unlike the order-2 kernel (5 streams, TILE=512 fits), the order-3
    pack is 13 streams: at T=512/H<=128 the forward's live set (carried
    pack + packed pre-activations + head outputs) measured 18.96 MB
    against the v5e's 16 MB scoped-vmem limit (perf-matrix OOM,
    logs/round4/gap.log). Estimate ~3 packed [13T,H] blocks live across
    a layer transition plus the [13T,K] head block, with a 1.4x Mosaic
    stack fudge, and pick the largest divisor of TILE under 10 MB."""
    forced = _os.environ.get("NSFNET_PALLAS_PSI_FWD_TILE")
    if forced:
        t = int(forced)
        if t < 8 or t % 8 != 0 or TILE % t != 0:
            raise ValueError(
                f"NSFNET_PALLAS_PSI_FWD_TILE={t}: must be a divisor of "
                f"TILE={TILE} and a positive multiple of 8")
        return t
    budget = 10 * 1024 * 1024
    hidden_padded = -(-hidden // 128) * 128
    candidates = [t for t in (512, 256, 128, 64, 32, 16, 8)
                  if t <= TILE and TILE % t == 0]
    for t in candidates[:-1]:
        live = int((3 * N_STREAMS * t * hidden_padded
                    + N_STREAMS * t * 128) * 4 * 1.4)
        if live <= budget:
            return t
    return candidates[-1]


def bwd_tile_for_psi(n_hidden: int, hidden: int) -> int:
    """Largest backward tile whose resident set fits the VMEM budget —
    the third-order pack is 13 streams/layer (+12 tangent rows), ~2.6x
    the second-order kernel's footprint."""
    forced = _os.environ.get("NSFNET_PALLAS_PSI_BWD_TILE")
    if forced:
        t = int(forced)
        if t < 8 or t % 8 != 0 or TILE % t != 0:
            raise ValueError(
                f"NSFNET_PALLAS_PSI_BWD_TILE={t}: must be a divisor of "
                f"TILE={TILE} and a positive multiple of 8")
        return t
    budget = 10 * 1024 * 1024
    hidden_padded = -(-hidden // 128) * 128
    candidates = [t for t in (256, 128, 64, 32, 16, 8)
                  if t <= TILE and TILE % t == 0]
    for t in candidates[:-1]:
        live = (n_hidden * N_STREAMS * t * hidden_padded   # packs
                + (n_hidden - 1) * 12 * t * hidden_padded  # ztans
                + 40 * t * hidden_padded) * 4              # working set
        if live <= budget:
            return t
    return candidates[-1]


def _tanh_derivs(z):
    t = jnp.tanh(z)
    d1, d2, d3, _ = tanh_chain(t)
    return t, d1, d2, d3


def _dir_rows(w0):
    """The four constant first-layer tangent rows [1, H] each."""
    rx, ry = w0[0:1, :], w0[1:2, :]
    return rx, ry, rx + ry, rx - ry


def _first_layer_packed(x, w0, b0):
    """Analytic first layer -> packed carries [13T, H]."""
    rx, ry, rp, rm = _dir_rows(w0)
    z = x[:, 0:1] * rx + x[:, 1:2] * ry + b0
    t, d1, d2, d3 = _tanh_derivs(z)
    rows = (rx, ry, rp, rm)
    packed = jnp.concatenate(
        [t]
        + [d1 * r for r in rows]
        + [d2 * (r * r) for r in rows]
        + [d3 * (r * r * r) for r in rows], axis=0)
    return packed, t


def _layer_packed(p_in, w, b, t_dim, prec):
    """One hidden transition on packed carries. Returns (p_out, t, ztan)
    with ztan = the 12 packed tangent rows [12T, H] of the pre-activation."""
    z_all = _dot(p_in, w, prec)
    z = z_all[0:t_dim] + b
    t, d1, d2, d3 = _tanh_derivs(z)
    outs = [t]
    for k in range(4):
        z1 = z_all[(1 + k) * t_dim:(2 + k) * t_dim]
        outs.append(d1 * z1)
    for k in range(4):
        z1 = z_all[(1 + k) * t_dim:(2 + k) * t_dim]
        z2 = z_all[(5 + k) * t_dim:(6 + k) * t_dim]
        outs.append(d2 * z1 * z1 + d1 * z2)
    for k in range(4):
        z1 = z_all[(1 + k) * t_dim:(2 + k) * t_dim]
        z2 = z_all[(5 + k) * t_dim:(6 + k) * t_dim]
        z3 = z_all[(9 + k) * t_dim:(10 + k) * t_dim]
        outs.append(d3 * z1 * z1 * z1 + 3.0 * d2 * z1 * z2 + d1 * z3)
    return jnp.concatenate(outs, axis=0), t, z_all[t_dim:]


# --------------------------------------------------------------------- fwd

def _fwd_kernel(n_hidden: int, t_dim: int, prec, x_ref, *refs):
    w_refs = refs[: 2 * (n_hidden + 1)]
    o_refs = refs[2 * (n_hidden + 1):]

    p, _ = _first_layer_packed(x_ref[:], w_refs[0][:], w_refs[1][:])
    for l in range(1, n_hidden):
        p, _, _ = _layer_packed(p, w_refs[2 * l][:], w_refs[2 * l + 1][:],
                                t_dim, prec)

    wh, bh = w_refs[-2][:], w_refs[-1][:]
    out_all = _dot(p, wh, prec)  # [13T, K]
    o_refs[0][:] = out_all[0:t_dim] + bh
    for s in range(1, N_STREAMS):
        o_refs[s][:] = out_all[s * t_dim:(s + 1) * t_dim]


def _fwd_pallas(params: Params, x: jax.Array, precision: str):
    n_hidden = len(params) - 1
    n, _ = x.shape
    k = params[-1][0].shape[1]
    assert n % TILE == 0, f"batch {n} must be padded to a multiple of {TILE}"
    fwd_tile = fwd_tile_for_psi(n_hidden, params[0][0].shape[1])
    grid = (n // fwd_tile,)

    out_spec = pl.BlockSpec((fwd_tile, k), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, k), jnp.float32)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_hidden, fwd_tile,
                          _PRECISIONS[precision]),
        grid=grid,
        in_specs=[pl.BlockSpec((fwd_tile, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(params),
        out_specs=(out_spec,) * N_STREAMS,
        out_shape=(out_shape,) * N_STREAMS,
        interpret=_interpret(),
    )(x, *_flat_weights(params))


# --------------------------------------------------------------------- bwd

def _split(arr, t_dim, n):
    return [arr[s * t_dim:(s + 1) * t_dim] for s in range(n)]


def _bwd_kernel(n_hidden: int, t_dim: int, prec, x_ref, *refs):
    n_w = 2 * (n_hidden + 1)
    w_refs = refs[:n_w]
    g_refs = refs[n_w:n_w + N_STREAMS]
    d_refs = refs[n_w + N_STREAMS:]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        for d in d_refs:
            d[:] = jnp.zeros(d.shape, d.dtype)

    x = x_ref[:]
    w0 = w_refs[0][:]

    # ---- forward recompute, keeping packed carries and tangents
    p0, t0 = _first_layer_packed(x, w0, w_refs[1][:])
    packs = [p0]
    ts = [t0]
    ztans = [None]
    for l in range(1, n_hidden):
        p, t, ztan = _layer_packed(packs[-1], w_refs[2 * l][:],
                                   w_refs[2 * l + 1][:], t_dim, prec)
        packs.append(p)
        ts.append(t)
        ztans.append(ztan)

    # ---- head backward (packed)
    wh = w_refs[-2][:]
    g_head = jnp.concatenate([r[:] for r in g_refs], axis=0)  # [13T, K]
    d_refs[-2][:] += _dot_tn(packs[-1], g_head, prec)
    d_refs[-1][:] += jnp.sum(g_refs[0][:], axis=0, keepdims=True)
    gp = _dot_nt(g_head, wh, prec)  # [13T, H]

    # ---- hidden transitions, reverse
    for l in range(n_hidden - 1, 0, -1):
        t = ts[l]
        d1, d2, d3, d4 = tanh_chain(t)
        zt = _split(ztans[l], t_dim, 12)   # z1_k, z2_k, z3_k per direction
        gs = _split(gp, t_dim, N_STREAMS)  # gh, gA_k, gB_k, gC_k
        gh = gs[0]

        g_z = gh * d1
        g_z1s, g_z2s, g_z3s = [], [], []
        for k in range(4):
            z1, z2, z3 = zt[k], zt[4 + k], zt[8 + k]
            gA, gB, gC = gs[1 + k], gs[5 + k], gs[9 + k]
            g_z = g_z + (gA * d2 * z1
                         + gB * (d3 * z1 * z1 + d2 * z2)
                         + gC * (d4 * z1 * z1 * z1
                                 + 3.0 * d3 * z1 * z2 + d2 * z3))
            g_z1s.append(gA * d1 + 2.0 * gB * d2 * z1
                         + gC * (3.0 * d3 * z1 * z1 + 3.0 * d2 * z2))
            g_z2s.append(gB * d1 + 3.0 * gC * d2 * z1)
            g_z3s.append(gC * d1)

        g_zpack = jnp.concatenate([g_z] + g_z1s + g_z2s + g_z3s, axis=0)
        d_refs[2 * l][:] += _dot_tn(packs[l - 1], g_zpack, prec)
        d_refs[2 * l + 1][:] += jnp.sum(g_z, axis=0, keepdims=True)
        gp = _dot_nt(g_zpack, w_refs[2 * l][:], prec)

    # ---- first layer (analytic tangents; rows of W0 get direct terms)
    d1, d2, d3, d4 = tanh_chain(t0)
    rows = _dir_rows(w0)
    gs = _split(gp, t_dim, N_STREAMS)
    gh = gs[0]

    g_z0 = gh * d1
    g_rows = []
    for k in range(4):
        r = rows[k]
        gA, gB, gC = gs[1 + k], gs[5 + k], gs[9 + k]
        g_z0 = g_z0 + (gA * d2 * r + gB * d3 * (r * r)
                       + gC * d4 * (r * r * r))
        g_rows.append(jnp.sum(gA * d1 + 2.0 * gB * d2 * r
                              + 3.0 * gC * d3 * (r * r),
                              axis=0, keepdims=True))

    dwx = (jnp.sum(x[:, 0:1] * g_z0, axis=0, keepdims=True)
           + g_rows[0] + g_rows[2] + g_rows[3])
    dwy = (jnp.sum(x[:, 1:2] * g_z0, axis=0, keepdims=True)
           + g_rows[1] + g_rows[2] - g_rows[3])
    d_refs[0][:] += jnp.concatenate([dwx, dwy], axis=0)
    d_refs[1][:] += jnp.sum(g_z0, axis=0, keepdims=True)


def _bwd_pallas(params: Params, x: jax.Array, cotangents, precision: str):
    n_hidden = len(params) - 1
    n, _ = x.shape
    k = params[-1][0].shape[1]
    bwd_tile = bwd_tile_for_psi(n_hidden, params[0][0].shape[1])
    assert n % bwd_tile == 0
    grid = (n // bwd_tile,)

    d_specs, d_shapes = [], []
    for w, b in params:
        d_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
        d_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
        d_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        d_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))

    g_spec = pl.BlockSpec((bwd_tile, k), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    flat = pl.pallas_call(
        functools.partial(_bwd_kernel, n_hidden, bwd_tile,
                          _PRECISIONS[precision]),
        grid=grid,
        in_specs=[pl.BlockSpec((bwd_tile, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(params) + [g_spec] * N_STREAMS,
        out_specs=tuple(d_specs),
        out_shape=tuple(d_shapes),
        interpret=_interpret(),
    )(x, *_flat_weights(params), *cotangents)

    grads = []
    for l in range(len(params)):
        grads.append((flat[2 * l], flat[2 * l + 1].reshape(-1)))
    return tuple(grads)


# ------------------------------------------------------------------ public

@functools.lru_cache(maxsize=None)
def make_fused_psi_derivatives(precision: str = "highest"):
    """Build the fused streamfunction engine at a given MXU precision.

    Returns fn(params, x, uv_scale) -> the (u, v, p) `Derivs` bundle
    (identical contract to mlp_psi_derivatives_2d). Differentiable wrt
    params only; batch N must be a multiple of TILE (the solver pads).
    """
    assert precision in _PRECISIONS, precision

    @jax.custom_vjp
    def fused(params: Params, x: jax.Array):
        return _fwd_pallas(params, x, precision)

    def _vjp_fwd(params, x):
        return _fwd_pallas(params, x, precision), (params, x)

    def _vjp_bwd(res, cts):
        params, x = res
        return _bwd_pallas(params, x, cts, precision), jnp.zeros_like(x)

    fused.defvjp(_vjp_fwd, _vjp_bwd)

    def engine(params, x, uv_scale: float = 1.0):
        o = fused(params, x)
        # streams: [o, a_x, a_y, a_p, a_m, b_x, b_y, b_p, b_m,
        #           c_x, c_y, c_p, c_m]; order-1 diagonal sweeps (a_p, a_m)
        # are carried for the layer recursion but unused by the bundle.
        return _assemble_psi_bundle(o[0], o[1], o[2], o[5], o[6], o[7],
                                    o[8], o[9], o[10], o[11], o[12],
                                    uv_scale)

    return engine
