"""Functional fully-connected tanh network (the PINN backbone).

Capability parity with the reference FCNet (ev-NSFnet/net.py:22-54): a
`[num_ins] + [hidden]*num_layers + [num_outs]` stack of Linear+Tanh with a
linear head, default-initialized like torch.nn.Linear (uniform
±1/sqrt(fan_in) for both weight and bias).

TPU-first shape discipline: params are a flat tuple of (W, b) with
W: [fan_in, fan_out] so `apply` is a chain of [N, fan_in] @ [fan_in, fan_out]
matmuls — batched, static-shaped, MXU-friendly. No classes in the compute
path; `mlp_apply` is a pure function of (params, X).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Tuple[Tuple[jax.Array, jax.Array], ...]


def layer_sizes(num_ins: int, num_outs: int, num_layers: int, hidden_size: int) -> Tuple[int, ...]:
    """Mirror of the reference layer-size recipe (ev-NSFnet/net.py:30)."""
    return tuple([num_ins] + [hidden_size] * num_layers + [num_outs])


def init_mlp(
    key: jax.Array,
    sizes: Sequence[int],
    dtype=jnp.float32,
    init: str = "torch",
) -> Params:
    """Initialize (W, b) pairs for each layer.

    init='torch'  — U(-k, k) with k = 1/sqrt(fan_in) for W and b, matching
                    torch.nn.Linear's default (what the reference uses).
    init='glorot' — Glorot-uniform W, zero b (often better for PINNs).
    """
    params = []
    for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
        key, wk, bk = jax.random.split(key, 3)
        if init == "torch":
            bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
            w = jax.random.uniform(wk, (fan_in, fan_out), dtype, -bound, bound)
            b = jax.random.uniform(bk, (fan_out,), dtype, -bound, bound)
        elif init == "glorot":
            limit = jnp.sqrt(6.0 / (fan_in + fan_out))
            w = jax.random.uniform(wk, (fan_in, fan_out), dtype, -limit, limit)
            b = jnp.zeros((fan_out,), dtype)
        else:
            raise ValueError(f"unknown init: {init!r}")
        params.append((w, b))
    return tuple(params)


def mlp_apply(params: Params, x: jax.Array) -> jax.Array:
    """Forward pass: tanh on all layers except the linear head.

    x: [N, num_ins] -> [N, num_outs]. Works under jvp/vjp/vmap/jit.
    """
    h = x
    for w, b in params[:-1]:
        h = jnp.tanh(h @ w + b)
    w, b = params[-1]
    return h @ w + b


def param_count(params: Params) -> int:
    return sum(int(w.size) + int(b.size) for w, b in params)


def widen_mlp_params(params: Params, new_hidden: int, key: jax.Array,
                     scale: float = 1e-2) -> Params:
    """Function-preserving width increase (Net2Net-style).

    New hidden units get small random INCOMING weights (so they carry
    distinct activations from step one) and exactly ZERO outgoing weights
    into pre-existing units and the head — the widened net computes the
    same function to the last bit, and a second-order optimizer can then
    recruit the new capacity. Used by the capacity-probe experiment
    (scripts/widen_polish.py); no reference counterpart."""
    old = params
    n_layers = len(old)
    out: list = []
    for li, (w, b) in enumerate(old):
        fi, fo = int(w.shape[0]), int(w.shape[1])
        nfi = fi if li == 0 else new_hidden
        nfo = fo if li == n_layers - 1 else new_hidden
        key, k1, k2 = jax.random.split(key, 3)
        W = jnp.zeros((nfi, nfo), w.dtype).at[:fi, :fo].set(w)
        if nfo > fo:
            W = W.at[:fi, fo:].set(
                scale * jax.random.normal(k1, (fi, nfo - fo), w.dtype))
            if nfi > fi:
                W = W.at[fi:, fo:].set(
                    scale * jax.random.normal(k2, (nfi - fi, nfo - fo), w.dtype))
        # the [fi:, :fo] block (new units -> old units/head) stays zero
        B = jnp.zeros((nfo,), b.dtype).at[:fo].set(b)
        out.append((W, B))
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class MLP:
    """Thin descriptor bundling an architecture with init/apply.

    Matches the reference constructor signature semantics
    (FCNet(num_ins, num_outs, num_layers, hidden_size), ev-NSFnet/net.py:23-27).
    """

    num_ins: int = 2
    num_outs: int = 3
    num_layers: int = 6
    hidden_size: int = 80
    init_scheme: str = "torch"

    @property
    def sizes(self) -> Tuple[int, ...]:
        return layer_sizes(self.num_ins, self.num_outs, self.num_layers, self.hidden_size)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return init_mlp(key, self.sizes, dtype=dtype, init=self.init_scheme)

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        return mlp_apply(params, x)
