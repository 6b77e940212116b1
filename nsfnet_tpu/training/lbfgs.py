"""Jitted L-BFGS with zoom (strong-Wolfe) line search.

Covers the reference's L-BFGS capability (the KAN notebook trains with
pykan LBFGS, lr=1, history 10, strong_wolfe — physics_informed_kan.ipynb
cell 0) and the Adam -> L-BFGS polish schedule. Built on optax.lbfgs whose
line search is a lax.while_loop, so the entire optimizer — line search
included — runs inside one jitted scan on device.

During an L-BFGS stage the EVM viscosity field is held FROZEN at its
current carry: the line search evaluates the loss many times per step and a
lagged carry update per evaluation would make the objective non-stationary.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def run_lbfgs(
    loss_fn: Callable,
    params,
    n_steps: int,
    memory_size: int = 10,
    matmul_precision: str = "highest",
    max_chunk: int = 50,
    progress: Callable | None = None,
):
    """Minimize loss_fn(params) -> scalar for ~n_steps L-BFGS iterations.

    Returns (final_params, loss_history).

    The scan is split into fixed-length chunks of `max_chunk` steps, one
    device dispatch each: a single L-BFGS step runs up to 25 line-search
    loss evaluations, so an unchunked full-batch scan blows past the TPU
    watchdog's per-dispatch limit and kills the worker (observed at
    n_steps=2000, N_f=120k). Every chunk has the SAME static length —
    one compile total — so n_steps is rounded UP to a whole number of
    chunks. `progress(steps_done, last_loss)` is called after each chunk.
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=25),
    )

    value_and_grad = jax.value_and_grad(loss_fn)
    chunk = max(1, min(int(max_chunk), int(n_steps)))
    n_chunks = -(-int(n_steps) // chunk)

    @jax.jit
    def run_chunk(params, opt_state):
        with jax.default_matmul_precision(matmul_precision):
            def body(carry, _):
                p, s = carry
                value, grad = value_and_grad(p)
                updates, s = opt.update(
                    grad, s, p, value=value, grad=grad, value_fn=loss_fn)
                p = optax.apply_updates(p, updates)
                return (p, s), value

            (params_out, state_out), history = jax.lax.scan(
                body, (params, opt_state), None, length=chunk)
        return params_out, state_out, history

    opt_state = jax.jit(opt.init)(params)
    overshoot = n_chunks * chunk - int(n_steps)
    if overshoot:
        from nsfnet_tpu.logger import get_logger

        get_logger().info(
            f"lbfgs/lm: running {n_chunks * chunk} steps "
            f"({overshoot} over the requested {int(n_steps)}: fixed "
            f"{chunk}-step chunks compile once)")
    hists = []
    for i in range(n_chunks):
        params, opt_state, hist = run_chunk(params, opt_state)
        hist.block_until_ready()  # bound dispatch queue; enable progress
        hists.append(hist)
        if progress is not None:
            progress((i + 1) * chunk, float(hist[-1]))

    return params, jnp.concatenate(hists)
