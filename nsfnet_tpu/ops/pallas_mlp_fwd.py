"""Fused Pallas kernel: plain tanh-MLP value forward with custom VJP.

Companion to pallas_mlp.py (which fuses the five-stream Taylor propagation
for the main network). This one covers value-only networks — the EVM
viscosity net (ev-NSFnet/pinn_solver.py:99-100): forward keeps all
activations in VMEM; backward rematerializes them and accumulates dW/db in
revisited output blocks. Gradients flow to params only (inputs are
collocation constants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsfnet_tpu.models.mlp import Params
from nsfnet_tpu.ops.pallas_mlp import (
    _PRECISIONS,
    _dot,
    _dot_nt,
    _dot_tn,
    _flat_weights,
    _interpret,
    _weight_specs,
)

TILE = 512


def _fwd_kernel(n_hidden: int, prec, x_ref, *refs):
    w_refs = refs[:2 * (n_hidden + 1)]
    (o,) = refs[2 * (n_hidden + 1):]
    x = x_ref[:]
    w0, b0 = w_refs[0][:], w_refs[1][:]
    h = jnp.tanh(x[:, 0:1] * w0[0:1, :] + x[:, 1:2] * w0[1:2, :] + b0)
    for l in range(1, n_hidden):
        h = jnp.tanh(_dot(h, w_refs[2 * l][:], prec) + w_refs[2 * l + 1][:])
    o[:] = _dot(h, w_refs[-2][:], prec) + w_refs[-1][:]


def _bwd_kernel(n_hidden: int, prec, x_ref, *refs):
    n_w = 2 * (n_hidden + 1)
    w_refs = refs[:n_w]
    g_ref = refs[n_w]
    d_refs = refs[n_w + 1:]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        for d in d_refs:
            d[:] = jnp.zeros(d.shape, d.dtype)

    x = x_ref[:]
    w0, b0 = w_refs[0][:], w_refs[1][:]
    hs = [jnp.tanh(x[:, 0:1] * w0[0:1, :] + x[:, 1:2] * w0[1:2, :] + b0)]
    for l in range(1, n_hidden):
        hs.append(jnp.tanh(_dot(hs[-1], w_refs[2 * l][:], prec)
                           + w_refs[2 * l + 1][:]))

    g = g_ref[:]
    # head
    d_refs[-2][:] += _dot_tn(hs[-1], g, prec)
    d_refs[-1][:] += jnp.sum(g, axis=0, keepdims=True)
    gh = _dot_nt(g, w_refs[-2][:], prec)
    for l in range(n_hidden - 1, 0, -1):
        t = hs[l]
        g_z = gh * (1.0 - t * t)
        d_refs[2 * l][:] += _dot_tn(hs[l - 1], g_z, prec)
        d_refs[2 * l + 1][:] += jnp.sum(g_z, axis=0, keepdims=True)
        gh = _dot_nt(g_z, w_refs[2 * l][:], prec)
    t0 = hs[0]
    g_z0 = gh * (1.0 - t0 * t0)
    dwx = jnp.sum(x[:, 0:1] * g_z0, axis=0, keepdims=True)
    dwy = jnp.sum(x[:, 1:2] * g_z0, axis=0, keepdims=True)
    d_refs[0][:] += jnp.concatenate([dwx, dwy], axis=0)
    d_refs[1][:] += jnp.sum(g_z0, axis=0, keepdims=True)


def _fwd(params: Params, x: jax.Array, precision: str):
    n_hidden = len(params) - 1
    n = x.shape[0]
    k = params[-1][0].shape[1]
    assert n % TILE == 0
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_hidden, _PRECISIONS[precision]),
        grid=(n // TILE,),
        in_specs=[pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + _weight_specs(params),
        out_specs=pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        interpret=_interpret(),
    )(x, *_flat_weights(params))


def _bwd(params: Params, x: jax.Array, g: jax.Array, precision: str):
    n_hidden = len(params) - 1
    n = x.shape[0]
    d_specs, d_shapes = [], []
    for w, b in params:
        d_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        d_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
        d_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        d_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
    flat = pl.pallas_call(
        functools.partial(_bwd_kernel, n_hidden, _PRECISIONS[precision]),
        grid=(n // TILE,),
        in_specs=[pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + _weight_specs(params)
        + [pl.BlockSpec((TILE, g.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=tuple(d_specs),
        out_shape=tuple(d_shapes),
        interpret=_interpret(),
    )(x, *_flat_weights(params), g)
    return tuple((flat[2 * l], flat[2 * l + 1].reshape(-1))
                 for l in range(len(params)))


@functools.lru_cache(maxsize=None)
def make_fused_mlp_forward(precision: str = "highest"):
    """fn(params, x) -> [N, K]: fused value forward, differentiable wrt
    params only. N must be a multiple of TILE."""

    @jax.custom_vjp
    def fused(params: Params, x: jax.Array):
        return _fwd(params, x, precision)

    def vjp_fwd(params, x):
        return _fwd(params, x, precision), (params, x)

    def vjp_bwd(res, g):
        params, x = res
        return _bwd(params, x, g, precision), jnp.zeros_like(x)

    fused.defvjp(vjp_fwd, vjp_bwd)
    return fused
