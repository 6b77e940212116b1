"""Loss assembly for the cavity PINN.

Semantics parity with the reference, expressed for padded/sharded batches:

  * BC loss: mean((u_b - u_pred)^2) + mean((v_b - v_pred)^2)
    (ev-NSFnet/pinn_solver.py:378-379).
  * Equation loss: per-equation weighted MSE, weight applied as
    res*sqrt(w) before squaring (ev-NSFnet/pinn_solver.py:387-397);
    loss_e = eq1 + eq2 + eq3 + 0.1*eq4 in the EVM variant, eq1+eq2+eq3 in
    the vanilla one (NSFnet/pinn_solver.py:218-221).
  * Supervised loss: MSE on u, v and finite-masked p
    (ev-NSFnet/pinn_solver.py:399-411).
  * Global-mean semantics under data parallelism: the reference all-reduces
    per-rank means (pinn_solver.py:413-424). Here every mean is computed as
    sum(w * r^2) / count over the GLOBAL padded array inside jit, with pad
    rows carrying weight 0 — XLA inserts the collectives, and the result is
    the exact global mean for any mesh size (including the reference's
    uneven last-shard case, which padding subsumes).

All reductions accept an explicit `count` (number of REAL points) so padded
entries never bias the mean.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def masked_sum_sq(residual: jax.Array, weights: jax.Array) -> jax.Array:
    """sum(w * r^2) over the local shard. Under shard_map the caller psums
    the stacked sums once; counts are global, so sums/count is the exact
    global mean."""
    r = residual.reshape(-1)
    w = weights.reshape(-1)
    return jnp.sum(w * r * r)


def masked_mean_sq(residual: jax.Array, weights: jax.Array, count) -> jax.Array:
    """sum(w * r^2) / count. `weights` is 0 on pad rows; for the unweighted
    case it is the 0/1 validity mask. `count` = number of real points."""
    return masked_sum_sq(residual, weights) / count


def masked_l2_norm(residual: jax.Array, weights: jax.Array) -> jax.Array:
    """sqrt(sum(w * r^2)) — the reference's 'L2' loss mode
    (NSFnet/pinn_solver.py:201-204, 215-218: torch.norm(res, p=2)).

    NOTE: under data parallelism this is computed from the GLOBAL sum of
    squares (psum before the sqrt), which is the true L2 norm; the
    reference never runs L2 mode distributed."""
    return jnp.sqrt(masked_sum_sq(residual, weights) + 1e-30)


class LossBundle(NamedTuple):
    total: jax.Array
    boundary: jax.Array
    equation: jax.Array
    supervised: jax.Array
    eq1: jax.Array
    eq2: jax.Array
    eq3: jax.Array
    eq4: jax.Array


def boundary_loss(u_pred, v_pred, u_b, v_b, mask, count) -> jax.Array:
    return (masked_mean_sq(u_pred - u_b, mask, count)
            + masked_mean_sq(v_pred - v_b, mask, count))


def equation_loss(res, eq_weights, count, evm_entropy_weight: float = 0.1):
    """Per-equation weighted MSEs. `eq_weights` already folds together the
    SDF weights (mean-normalized) and the pad mask."""
    l1 = masked_mean_sq(res.eq1, eq_weights, count)
    l2 = masked_mean_sq(res.eq2, eq_weights, count)
    l3 = masked_mean_sq(res.eq3, eq_weights, count)
    if res.eq4 is not None:
        l4 = masked_mean_sq(res.eq4, eq_weights, count)
        total = l1 + l2 + l3 + evm_entropy_weight * l4
    else:
        l4 = jnp.zeros((), res.eq1.dtype)
        total = l1 + l2 + l3
    return total, (l1, l2, l3, l4)


def supervised_loss(u_pred, v_pred, p_pred, u_s, v_s, p_s,
                    mask, count, p_mask: Optional[jax.Array], p_count) -> jax.Array:
    loss = (masked_mean_sq(u_pred - u_s, mask, count)
            + masked_mean_sq(v_pred - v_s, mask, count))
    if p_s is not None and p_mask is not None:
        # p targets can contain NaN (reference masks by isfinite,
        # ev-NSFnet/pinn_solver.py:405-410); zero them under the mask so the
        # NaNs never reach the arithmetic.
        p_t = jnp.where(p_mask > 0, p_s, 0.0)
        p_p = jnp.where(p_mask > 0, p_pred, 0.0)
        loss = loss + masked_mean_sq(p_p - p_t, p_mask, jnp.maximum(p_count, 1.0))
    return loss
