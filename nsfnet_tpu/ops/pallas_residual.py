"""Fused Pallas TPU kernel: NS residual algebra + loss reduction in VMEM.

The packed-MLP kernel (pallas_mlp.py) removed the per-layer HBM streams but
still hands five [N,K] derivative streams back to XLA, which assembles the
residuals (eq1-eq4 — ev-NSFnet/pinn_solver.py:326-342) and the weighted
sums-of-squares loss (pinn_solver.py:387-397) as elementwise HBM traffic:
~60 B/point out of the forward kernel, ~60 B/point of cotangents back into
the backward kernel, plus the saved residual intermediates XLA keeps for
the VJP. The roofline analysis (VALIDATION.md: 6.2 model-TFLOP/s at exact
fp32 = 18.7%% MXU, step VPU/bandwidth-bound) names that stream algebra as
the binding cost.

This kernel pair fuses the whole chain

    x -> packed forward -> (u,v,p) Taylor streams -> eq1..eq4
      -> per-equation weighted sums of squares

into the MLP kernels, so the only HBM traffic left is the inputs the math
genuinely needs (x, e, vis_t, eq_w: 5 floats/point), one [N,1] cotangent
stream for the EVM net (g_e), and four scalars out.

Forward emits S_i = sum(w * eq_i^2) per grid tile into a revisited (1,4)
accumulator (sequential TPU grid, same trick as the dW accumulation).
Backward recomputes the forward in VMEM, forms the per-point equation
cotangents from the four scalar loss cotangents,

    g_eq4 = 2 w eq4 c4                      (EVM entropy residual)
    g_eq1 = 2 w eq1 c1 + g_eq4 (u - 1/2)    (eq4 = eq1(u-1/2)+eq2(v-1/2)-e)
    g_eq2 = 2 w eq2 c2 + g_eq4 (v - 1/2)
    g_eq3 = 2 w eq3 c3
    g_e   = -g_eq4

chains them through the residual algebra to the five output-stream
cotangents (coordinate-transform scale applied transposed), and runs the
shared packed reverse sweep (pallas_mlp._packed_reverse_sweep).

Differentiable wrt params and e only; x, vis_t, eq_w, re receive zero
cotangents (they are optimization constants: collocation points, the
lagged stop-gradiented eddy viscosity — pinn_solver.py:327-334 — the SDF
weights, and the stage Reynolds number).

The lagged vis_t enters as an input stream already min-capped by the
caller (R.next_vis_t); alpha_evm and the vis_t carry update stay outside
(cheap [N,1] elementwise, and the carry must be returned to the scan
anyway).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsfnet_tpu.models.mlp import Params
from nsfnet_tpu.ops.pallas_mlp import (
    TILE,
    _PRECISIONS,
    _dot,
    _flat_weights,
    _forward_streams,
    _interpret,
    _pad_params_lanes,
    _packed_reverse_sweep,
    _recompute_forward,
    _weight_specs,
    bwd_tile_for,
)


def _head_streams(p_final, w_refs, t_dim, prec):
    """Head matmul on the final packed carry -> five [T,K] streams."""
    out_all = _dot(p_final, w_refs[-2][:], prec)
    o = out_all[0:t_dim] + w_refs[-1][:]
    return (o, out_all[t_dim:2 * t_dim], out_all[2 * t_dim:3 * t_dim],
            out_all[3 * t_dim:4 * t_dim], out_all[4 * t_dim:5 * t_dim])


def _residual_algebra(streams, e, vis_t, re, scale, evm):
    """The NS residual assembly (ops/residuals.py semantics) on in-VMEM
    streams. Returns everything the backward chain reuses."""
    o, ox, oy, oxx, oyy = streams
    ss = scale * scale
    u, v = o[:, 0:1], o[:, 1:2]
    u_x, v_x, p_x = ox[:, 0:1] * scale, ox[:, 1:2] * scale, ox[:, 2:3] * scale
    u_y, v_y, p_y = oy[:, 0:1] * scale, oy[:, 1:2] * scale, oy[:, 2:3] * scale
    u_xx, v_xx = oxx[:, 0:1] * ss, oxx[:, 1:2] * ss
    u_yy, v_yy = oyy[:, 0:1] * ss, oyy[:, 1:2] * ss
    nu_eff = (1.0 / re + vis_t) if evm else (1.0 / re)
    eq1 = (u * u_x + v * u_y) + p_x - nu_eff * (u_xx + u_yy)
    eq2 = (u * v_x + v * v_y) + p_y - nu_eff * (v_xx + v_yy)
    eq3 = u_x + v_y
    eq4 = (eq1 * (u - 0.5) + eq2 * (v - 0.5)) - e if evm else None
    return u, v, u_x, u_y, v_x, v_y, nu_eff, eq1, eq2, eq3, eq4


def _loss_fwd_kernel(n_hidden, t_dim, prec, scale, evm, x_ref, *refs):
    n_w = 2 * (n_hidden + 1)
    w_refs = refs[:n_w]
    if evm:
        e_ref, vt_ref, w_ref, re_ref, acc_ref = refs[n_w:]
    else:
        w_ref, re_ref, acc_ref = refs[n_w:]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    x = x_ref[:]
    streams = _forward_streams(x, w_refs, n_hidden, t_dim, prec)
    e = e_ref[:] if evm else None
    vt = vt_ref[:] if evm else None
    re = re_ref[0, 0]
    *_, eq1, eq2, eq3, eq4 = _residual_algebra(streams, e, vt, re, scale, evm)
    w = w_ref[:]
    parts = [w * eq1 * eq1, w * eq2 * eq2, w * eq3 * eq3]
    if evm:
        parts.append(w * eq4 * eq4)
    # axis-0 keepdims reduction of a [T,K] block to (1,K) — the same
    # lowering the bias-gradient accumulation uses (proven on Mosaic)
    acc_ref[:] += jnp.sum(jnp.concatenate(parts, axis=1), axis=0,
                          keepdims=True)


def _loss_bwd_kernel(n_hidden, t_dim, prec, scale, evm, x_ref, *refs):
    n_w = 2 * (n_hidden + 1)
    w_refs = refs[:n_w]
    if evm:
        e_ref, vt_ref, w_ref, re_ref, ct_ref = refs[n_w:n_w + 5]
        d_refs = refs[n_w + 5:-1]
        ge_ref = refs[-1]
    else:
        w_ref, re_ref, ct_ref = refs[n_w:n_w + 3]
        d_refs = refs[n_w + 3:]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for d in d_refs:
            d[:] = jnp.zeros(d.shape, d.dtype)

    x = x_ref[:]
    fwd = _recompute_forward(x, w_refs, n_hidden, t_dim, prec)
    streams = _head_streams(fwd[0][-1], w_refs, t_dim, prec)
    e = e_ref[:] if evm else None
    vt = vt_ref[:] if evm else None
    re = re_ref[0, 0]
    u, v, u_x, u_y, v_x, v_y, nu_eff, eq1, eq2, eq3, eq4 = _residual_algebra(
        streams, e, vt, re, scale, evm)

    w = w_ref[:]
    if evm:
        g4 = 2.0 * (w * eq4) * ct_ref[0, 3]
        g1 = 2.0 * (w * eq1) * ct_ref[0, 0] + g4 * (u - 0.5)
        g2 = 2.0 * (w * eq2) * ct_ref[0, 1] + g4 * (v - 0.5)
        g3 = 2.0 * (w * eq3) * ct_ref[0, 2]
        ge_ref[:] = -g4
        g_u = g1 * u_x + g2 * v_x + g4 * eq1
        g_v = g1 * u_y + g2 * v_y + g4 * eq2
    else:
        g1 = 2.0 * (w * eq1) * ct_ref[0, 0]
        g2 = 2.0 * (w * eq2) * ct_ref[0, 1]
        g3 = 2.0 * (w * eq3) * ct_ref[0, 2]
        g_u = g1 * u_x + g2 * v_x
        g_v = g1 * u_y + g2 * v_y

    ss = scale * scale
    zero = jnp.zeros_like(g1)
    g_head = jnp.concatenate([
        jnp.concatenate([g_u, g_v, zero], axis=1),                        # value
        jnp.concatenate([g1 * u + g3, g2 * u, g1], axis=1) * scale,       # d/dx
        jnp.concatenate([g1 * v, g2 * v + g3, g2], axis=1) * scale,       # d/dy
        jnp.concatenate([-g1 * nu_eff, -g2 * nu_eff, zero], axis=1) * ss,  # d2/dx2
        jnp.concatenate([-g1 * nu_eff, -g2 * nu_eff, zero], axis=1) * ss,  # d2/dy2
    ], axis=0)  # [5T, K]
    _packed_reverse_sweep(x, w_refs, d_refs, fwd, g_head, t_dim, prec)


def _stream_spec(tile):
    return pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)


_SCALAR_SPEC = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _fused_fwd(params: Params, x, e, vis_t, eq_w, re, precision, scale, evm):
    n_hidden = len(params) - 1
    n = x.shape[0]
    k = params[-1][0].shape[1]
    assert k == 3, "fused residual loss is velocity-formulation (u,v,p) only"
    assert n % TILE == 0, f"batch {n} must be padded to a multiple of {TILE}"
    n_out = 4 if evm else 3

    ins = [x, *_flat_weights(params)]
    in_specs = [pl.BlockSpec((TILE, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] + _weight_specs(params)
    if evm:
        ins += [e, vis_t]
        in_specs += [_stream_spec(TILE), _stream_spec(TILE)]
    ins += [eq_w, jnp.asarray(re, jnp.float32).reshape(1, 1)]
    in_specs += [_stream_spec(TILE), _SCALAR_SPEC]

    acc = pl.pallas_call(
        functools.partial(_loss_fwd_kernel, n_hidden, TILE,
                          _PRECISIONS[precision], scale, evm),
        grid=(n // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_out), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_out), jnp.float32),
        interpret=_interpret(),
    )(*ins)
    return acc[0]


def _fused_bwd(params: Params, x, e, vis_t, eq_w, re, ct, precision, scale, evm):
    n_hidden = len(params) - 1
    n = x.shape[0]
    n_out = 4 if evm else 3
    tile = bwd_tile_for(n_hidden, params[0][0].shape[1])
    assert n % tile == 0

    ins = [x, *_flat_weights(params)]
    in_specs = [pl.BlockSpec((tile, 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] + _weight_specs(params)
    if evm:
        ins += [e, vis_t]
        in_specs += [_stream_spec(tile), _stream_spec(tile)]
    ins += [eq_w, jnp.asarray(re, jnp.float32).reshape(1, 1),
            jnp.asarray(ct, jnp.float32).reshape(1, n_out)]
    in_specs += [_stream_spec(tile), _SCALAR_SPEC,
                 pl.BlockSpec((1, n_out), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]

    d_specs, d_shapes = [], []
    for w, b in params:
        d_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
        d_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
        d_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        d_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
    if evm:
        d_specs.append(_stream_spec(tile))
        d_shapes.append(jax.ShapeDtypeStruct((n, 1), jnp.float32))

    flat = pl.pallas_call(
        functools.partial(_loss_bwd_kernel, n_hidden, tile,
                          _PRECISIONS[precision], scale, evm),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=tuple(d_specs),
        out_shape=tuple(d_shapes),
        interpret=_interpret(),
    )(*ins)

    grads = tuple((flat[2 * l], flat[2 * l + 1].reshape(-1))
                  for l in range(len(params)))
    g_e = flat[-1] if evm else None
    return grads, g_e


@functools.lru_cache(maxsize=None)
def make_fused_residual_loss(precision: str = "highest",
                             coord_scale: float = 1.0,
                             evm: bool = True,
                             lane_pad: int | None = None):
    """Build the fused residual-loss engine at a given MXU precision.

    EVM:     fn(params, x[N,2], e[N,1], vis_t[N,1], eq_w[N,1], re) -> sums[4]
    vanilla: fn(params, x[N,2], eq_w[N,1], re) -> sums[3]

    sums[i] = sum(eq_w * eq_{i+1}^2) over the (local) batch — divide by the
    global real count for the per-equation mean losses. Differentiable wrt
    params and e; x/vis_t/eq_w/re get zero cotangents (see module doc).
    Batch N must be a multiple of TILE; `lane_pad` as in
    make_fused_mlp_derivatives.
    """
    assert precision in _PRECISIONS, precision
    if lane_pad is None:
        lane_pad = int(_os.environ.get("NSFNET_PALLAS_LANE_PAD", 0))
    if lane_pad and lane_pad % 128 != 0:
        raise ValueError(f"lane_pad={lane_pad}: must be 0 or a multiple "
                         f"of the 128-lane MXU granule")
    pad = ((lambda p: _pad_params_lanes(p, lane_pad)) if lane_pad
           else (lambda p: p))
    scale = float(coord_scale)

    if evm:
        @jax.custom_vjp
        def fused(params: Params, x, e, vis_t, eq_w, re):
            return _fused_fwd(pad(params), x, e, vis_t, eq_w, re,
                              precision, scale, True)

        def _vjp_fwd(params, x, e, vis_t, eq_w, re):
            val = _fused_fwd(pad(params), x, e, vis_t, eq_w, re,
                             precision, scale, True)
            return val, (params, x, e, vis_t, eq_w, re)

        def _vjp_bwd(res, ct):
            params, x, e, vis_t, eq_w, re = res
            g, g_e = _fused_bwd(pad(params), x, e, vis_t, eq_w, re, ct,
                                precision, scale, True)
            if lane_pad:
                g = tuple((gw[:w.shape[0], :w.shape[1]], gb[:b.shape[0]])
                          for (gw, gb), (w, b) in zip(g, params))
            return (g, jnp.zeros_like(x), g_e, jnp.zeros_like(vis_t),
                    jnp.zeros_like(eq_w), jnp.zeros_like(re))
    else:
        @jax.custom_vjp
        def fused(params: Params, x, eq_w, re):
            return _fused_fwd(pad(params), x, None, None, eq_w, re,
                              precision, scale, False)

        def _vjp_fwd(params, x, eq_w, re):
            val = _fused_fwd(pad(params), x, None, None, eq_w, re,
                             precision, scale, False)
            return val, (params, x, eq_w, re)

        def _vjp_bwd(res, ct):
            params, x, eq_w, re = res
            g, _ = _fused_bwd(pad(params), x, None, None, eq_w, re, ct,
                              precision, scale, False)
            if lane_pad:
                g = tuple((gw[:w.shape[0], :w.shape[1]], gb[:b.shape[0]])
                          for (gw, gb), (w, b) in zip(g, params))
            return (g, jnp.zeros_like(x), jnp.zeros_like(eq_w),
                    jnp.zeros_like(re))

    fused.defvjp(_vjp_fwd, _vjp_bwd)
    return fused
