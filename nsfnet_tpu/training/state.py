"""Train-state and batch pytrees.

Unlike the reference — which checkpoints only the two state_dicts and loses
optimizer moments, step counter, RNG and the vis_t field on resume
(ev-NSFnet/pinn_solver.py:108-120, 742-759) — the full training state here
is one pytree: params, both optimizer states, the lagged EVM viscosity
carry, and step counters. Checkpointing it gives exact resume.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class Batch(NamedTuple):
    """Device-resident, padded, statically-shaped training data.

    *_mask / eq_w are zero on pad rows; n_* are the real (global) counts as
    float scalars so padded means are exact global means.
    """

    x_f: jax.Array      # [Nf_pad, 1] collocation x
    y_f: jax.Array      # [Nf_pad, 1]
    eq_w: jax.Array     # [Nf_pad, 1] SDF weight x pad mask (1 on real rows when SDF off)
    n_f: jax.Array      # scalar: real collocation count
    x_b: jax.Array      # [Nb_pad, 1] boundary
    y_b: jax.Array
    u_b: jax.Array
    v_b: jax.Array
    b_mask: jax.Array   # [Nb_pad, 1]
    n_b: jax.Array      # scalar
    x_s: Optional[jax.Array] = None  # supervised (None when disabled)
    y_s: Optional[jax.Array] = None
    u_s: Optional[jax.Array] = None
    v_s: Optional[jax.Array] = None
    p_s: Optional[jax.Array] = None
    s_mask: Optional[jax.Array] = None
    p_mask: Optional[jax.Array] = None
    n_s: Optional[jax.Array] = None
    n_p: Optional[jax.Array] = None


class TrainState(NamedTuple):
    params: Any                       # main net pytree
    params_evm: Optional[Any]         # EVM net pytree (None in vanilla mode)
    opt_main: Any                     # optax state for the main net
    opt_evm: Optional[Any]
    vis_t_minus: Optional[jax.Array]  # [Nf_pad, 1] lagged alpha*|e| carry
    step: jax.Array                   # global step (spans stages)
    epoch_in_stage: jax.Array         # 0-based step within the current stage


class StepMetrics(NamedTuple):
    total: jax.Array
    boundary: jax.Array
    equation: jax.Array
    supervised: jax.Array
    eq1: jax.Array
    eq2: jax.Array
    eq3: jax.Array
    eq4: jax.Array
    vis_t_mean: jax.Array


def reset_stage(state: TrainState) -> TrainState:
    return state._replace(epoch_in_stage=jnp.zeros((), jnp.int32))
