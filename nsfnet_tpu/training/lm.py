"""Matrix-free Levenberg-Marquardt (Gauss-Newton-CG) for the PINN loss.

The training loss is a pure sum of squares (training/step.py
make_residual_fn), so near a minimum Gauss-Newton curvature J^T J is an
excellent Hessian approximation and converges far faster than first-order
methods — and, unlike a Wolfe line search, the damped trust-region accept
test stays robust when fp32 can no longer resolve loss differences across
a 120k-point sum (the observed full-batch L-BFGS stall mode on TPU).

Nothing is materialized: J is ~[500k x 38k], but CG on the damped normal
equations (J^T J + lam I) delta = -J^T r only needs Jv / J^T u products —
one `jax.linearize` per LM step, then each CG iteration re-plays the
linearized graph forward (jvp) and transposed (vjp). Everything runs in
one jitted scan, chunked into bounded device dispatches for the TPU
watchdog (one LM step costs ~2*cg_iters residual-grad equivalents).

No reference counterpart: the reference trains Adam-only (and pykan
L-BFGS in the KAN notebook). This is a framework extension.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def run_lm(
    residual_fn: Callable,
    params,
    n_steps: int,
    cg_iters: int = 50,
    init_lam: float = 1e-3,
    matmul_precision: str = "highest",
    max_chunk: int = 10,
    progress: Callable | None = None,
):
    """Minimize sum(residual_fn(params)**2) with damped Gauss-Newton.

    Returns (final_params, loss_history, final_lam). The damping lam
    adapts classically: /3 on accepted steps, *8 on rejected ones (the
    rejected trial costs one residual evaluation, nothing else).
    """
    w0, unravel = ravel_pytree(params)

    def res_w(w):
        return residual_fn(unravel(w))

    chunk = max(1, min(int(max_chunk), int(n_steps)))
    n_chunks = -(-int(n_steps) // chunk)

    def lm_step(carry, _):
        w, lam = carry
        r, jvp_fn = jax.linearize(res_w, w)
        vjp_fn = jax.linear_transpose(jvp_fn, w)
        g = vjp_fn(r)[0]  # J^T r = grad/2
        loss0 = r @ r

        def Av(v):
            return vjp_fn(jvp_fn(v))[0] + lam * v

        def cg_body(c, _):
            x, rr, p, rs = c
            Ap = Av(p)
            a = rs / (p @ Ap + 1e-30)
            x = x + a * p
            rr = rr - a * Ap
            rs2 = rr @ rr
            p = rr + (rs2 / (rs + 1e-30)) * p
            return (x, rr, p, rs2), None

        (delta, _, _, _), _ = jax.lax.scan(
            cg_body, (jnp.zeros_like(g), -g, -g, g @ g), None,
            length=cg_iters)
        w_try = w + delta
        r_try = res_w(w_try)
        loss_try = r_try @ r_try
        accept = loss_try < loss0
        w = jnp.where(accept, w_try, w)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                        jnp.minimum(lam * 8.0, 1e8))
        return (w, lam), jnp.where(accept, loss_try, loss0)

    @jax.jit
    def run_chunk(w, lam):
        with jax.default_matmul_precision(matmul_precision):
            (w, lam), hist = jax.lax.scan(lm_step, (w, lam), None,
                                          length=chunk)
        return w, lam, hist

    w, lam = w0, jnp.asarray(init_lam, w0.dtype)
    hists = []
    for i in range(n_chunks):
        w, lam, hist = run_chunk(w, lam)
        hist.block_until_ready()
        hists.append(hist)
        if progress is not None:
            progress((i + 1) * chunk, float(hist[-1]), float(lam))

    return unravel(w), jnp.concatenate(hists), float(lam)


def run_lm_micro(
    eq_residual_fn: Callable,
    aux_residual_fn: Callable,
    eq_slices,
    params,
    n_steps: int,
    cg_iters: int = 50,
    init_lam: float = 1e-3,
    matmul_precision: str = "highest",
    max_chunk: int = 10,
    progress: Callable | None = None,
):
    """Memory-bounded LM: identical math to run_lm, but every Gauss-Newton
    product (J^T J v, J^T r, sum r^2) is a `lax.scan` over K collocation
    slices with the linearization RECOMPUTED per slice — peak activation
    memory drops by ~K at the cost of one extra residual forward per CG
    iteration. Lets full-batch (N_f=120k+) LM run on nets whose stored
    linearization blows HBM (observed: 6x160 at N_f=120k on v5e).

    eq_residual_fn(w_params, slice) -> per-slice residual rows (scaled by
    the GLOBAL counts, so slices concatenate to the exact full vector);
    aux_residual_fn(w_params) -> boundary/supervised rows;
    eq_slices: pytree of [K, m, 1]-stacked slice data.
    """
    w0, unravel = ravel_pytree(params)

    def res_eq(w, sl):
        return eq_residual_fn(unravel(w), sl)

    def res_aux(w):
        return aux_residual_fn(unravel(w))

    def sum_sq(w):
        def body(acc, sl):
            r = res_eq(w, sl)
            return acc + r @ r, None
        acc, _ = jax.lax.scan(body, jnp.zeros((), w.dtype), eq_slices)
        ra = res_aux(w)
        return acc + ra @ ra

    def lm_step(carry, _):
        w, lam = carry
        loss0 = sum_sq(w)

        def scan_gn(acc_init, per_slice):
            """Accumulate per_slice(jvp_fn, vjp_fn, slice residual) over
            slices, re-linearizing inside the scan body (sequential ->
            bounded memory)."""
            def body(acc, sl):
                f = lambda w_: res_eq(w_, sl)
                r, jvp_fn = jax.linearize(f, w)
                vjp_fn = jax.linear_transpose(jvp_fn, w)
                return acc + per_slice(r, jvp_fn, vjp_fn), None
            acc, _ = jax.lax.scan(body, acc_init, eq_slices)
            return acc

        ra, jvp_a = jax.linearize(res_aux, w)
        vjp_a = jax.linear_transpose(jvp_a, w)

        g = scan_gn(jnp.zeros_like(w), lambda r, jf, vf: vf(r)[0])
        g = g + vjp_a(ra)[0]

        def Av(v):
            av = scan_gn(jnp.zeros_like(w), lambda r, jf, vf: vf(jf(v))[0])
            return av + vjp_a(jvp_a(v))[0] + lam * v

        def cg_body(c, _):
            x, rr, p, rs = c
            Ap = Av(p)
            a = rs / (p @ Ap + 1e-30)
            x = x + a * p
            rr = rr - a * Ap
            rs2 = rr @ rr
            p = rr + (rs2 / (rs + 1e-30)) * p
            return (x, rr, p, rs2), None

        (delta, _, _, _), _ = jax.lax.scan(
            cg_body, (jnp.zeros_like(g), -g, -g, g @ g), None,
            length=cg_iters)
        w_try = w + delta
        loss_try = sum_sq(w_try)
        accept = loss_try < loss0
        w = jnp.where(accept, w_try, w)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                        jnp.minimum(lam * 8.0, 1e8))
        return (w, lam), jnp.where(accept, loss_try, loss0)

    chunk = max(1, min(int(max_chunk), int(n_steps)))
    n_chunks = -(-int(n_steps) // chunk)

    @jax.jit
    def run_chunk(w, lam):
        with jax.default_matmul_precision(matmul_precision):
            (w, lam), hist = jax.lax.scan(lm_step, (w, lam), None,
                                          length=chunk)
        return w, lam, hist

    w, lam = w0, jnp.asarray(init_lam, w0.dtype)
    hists = []
    for i in range(n_chunks):
        w, lam, hist = run_chunk(w, lam)
        hist.block_until_ready()
        hists.append(hist)
        if progress is not None:
            progress((i + 1) * chunk, float(hist[-1]), float(lam))

    return unravel(w), jnp.concatenate(hists), float(lam)
