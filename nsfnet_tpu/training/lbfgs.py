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
import optax


def run_lbfgs(
    loss_fn: Callable,
    params,
    n_steps: int,
    memory_size: int = 10,
    matmul_precision: str = "highest",
):
    """Minimize loss_fn(params) -> scalar for n_steps L-BFGS iterations.

    Returns (final_params, loss_history[n_steps]).
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=25),
    )

    value_and_grad = jax.value_and_grad(loss_fn)

    @jax.jit
    def fit(params):
        with jax.default_matmul_precision(matmul_precision):
            opt_state = opt.init(params)

            def body(carry, _):
                p, s = carry
                value, grad = value_and_grad(p)
                updates, s = opt.update(
                    grad, s, p, value=value, grad=grad, value_fn=loss_fn)
                p = optax.apply_updates(p, updates)
                return (p, s), value

            (params_out, _), history = jax.lax.scan(
                body, (params, opt_state), None, length=n_steps)
        return params_out, history

    return fit(params)
