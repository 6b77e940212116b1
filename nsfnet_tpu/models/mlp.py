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


def fourier_b_matrix(num_ins: int, num_features: int, sigma: float,
                     seed: int = 0, dtype=jnp.float32) -> jax.Array:
    """Fixed (non-trainable) random Fourier projection B ~ N(0, sigma^2),
    deterministic in `seed` so it is reconstructible from config alone —
    checkpoints stay plain (W, b) tuples.

    Always sampled at float32 then cast: JAX draws different bit-streams
    per dtype, so sampling at x.dtype would silently change the embedding
    (and hence the network) when a checkpoint is applied at float64
    (e.g. scripts/lm_fp64_probe.py)."""
    b = sigma * jax.random.normal(
        jax.random.PRNGKey(seed), (num_ins, num_features), jnp.float32)
    return b.astype(dtype)


def fourier_embed(x: jax.Array, b_matrix: jax.Array) -> jax.Array:
    """[x, sin(2 pi x B), cos(2 pi x B)] input embedding (Tancik et al.) —
    the standard spectral-bias fix for PINNs on sharp-feature problems.
    Smooth, so the jvp-of-jvp residual engine differentiates through it."""
    proj = (2.0 * jnp.pi) * (x @ b_matrix)
    return jnp.concatenate([x, jnp.sin(proj), jnp.cos(proj)], axis=1)


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
    fourier_features: int = 0   # random Fourier embedding size m (0 = off);
    fourier_sigma: float = 3.0  # the net then sees [x, sin/cos(2 pi x B)],
    fourier_seed: int = 0       # B fixed, reconstructed from config

    @property
    def sizes(self) -> Tuple[int, ...]:
        n_in = self.num_ins + 2 * self.fourier_features
        return layer_sizes(n_in, self.num_outs, self.num_layers, self.hidden_size)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return init_mlp(key, self.sizes, dtype=dtype, init=self.init_scheme)

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        if self.fourier_features:
            b = fourier_b_matrix(self.num_ins, self.fourier_features,
                                 self.fourier_sigma, self.fourier_seed, x.dtype)
            x = fourier_embed(x, b)
        return mlp_apply(params, x)
