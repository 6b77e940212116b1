"""Steady incompressible Navier-Stokes residuals for the cavity PINN.

Physics parity with the reference:
  * vanilla momentum/continuity residuals — NSFnet/pinn_solver.py:155-160
  * entropy-viscosity (EVM) regularized residuals + entropy residual eq4
    — ev-NSFnet/pinn_solver.py:326-342
  * coordinate-transform chain-rule scaling — ev-NSFnet/pinn_solver.py:311-324

The derivative bundle comes from the forward-mode engine (derivatives.py);
this module is pure elementwise math that XLA fuses into the tangent sweeps.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from nsfnet_tpu.ops.derivatives import Derivs


class Residuals(NamedTuple):
    eq1: jax.Array  # x-momentum
    eq2: jax.Array  # y-momentum
    eq3: jax.Array  # continuity
    eq4: Optional[jax.Array]  # entropy residual (EVM only)
    e: Optional[jax.Array]    # raw EVM net output (for the vis_t carry)
    uvp: jax.Array            # primal [N, >=3] network output


def _unpack(derivs: Derivs, scale: float, scale_sq: float):
    out, dx, dy, dxx, dyy = derivs
    u, v, p = out[:, 0:1], out[:, 1:2], out[:, 2:3]
    u_x, v_x, p_x = dx[:, 0:1] * scale, dx[:, 1:2] * scale, dx[:, 2:3] * scale
    u_y, v_y, p_y = dy[:, 0:1] * scale, dy[:, 1:2] * scale, dy[:, 2:3] * scale
    u_xx, v_xx = dxx[:, 0:1] * scale_sq, dxx[:, 1:2] * scale_sq
    u_yy, v_yy = dyy[:, 0:1] * scale_sq, dyy[:, 1:2] * scale_sq
    return u, v, p, u_x, u_y, v_x, v_y, p_x, p_y, u_xx, u_yy, v_xx, v_yy


def ns_residuals(derivs: Derivs, re: float, coord_scale: float = 1.0) -> Residuals:
    """Vanilla residuals: eq1/eq2 momentum with molecular viscosity 1/Re,
    eq3 continuity (NSFnet/pinn_solver.py:155-160)."""
    scale_sq = coord_scale * coord_scale
    u, v, _, u_x, u_y, v_x, v_y, p_x, p_y, u_xx, u_yy, v_xx, v_yy = _unpack(
        derivs, coord_scale, scale_sq)
    nu = 1.0 / re
    eq1 = (u * u_x + v * u_y) + p_x - nu * (u_xx + u_yy)
    eq2 = (u * v_x + v * v_y) + p_y - nu * (v_xx + v_yy)
    eq3 = u_x + v_y
    return Residuals(eq1, eq2, eq3, None, None, derivs[0])


def ev_ns_residuals(
    derivs: Derivs,
    e: jax.Array,
    vis_t: jax.Array,
    re: float,
    coord_scale: float = 1.0,
) -> Residuals:
    """EVM-regularized residuals (ev-NSFnet/pinn_solver.py:337-342).

    vis_t is the *lagged* eddy-viscosity field (previous step's
    min(20/Re, alpha_evm*|e|)), already stop-gradiented by the caller: it
    enters the momentum equations as a constant per-point coefficient.
    eq4 trains e to predict the convective energy residual.
    """
    scale_sq = coord_scale * coord_scale
    u, v, _, u_x, u_y, v_x, v_y, p_x, p_y, u_xx, u_yy, v_xx, v_yy = _unpack(
        derivs, coord_scale, scale_sq)
    nu_eff = 1.0 / re + vis_t
    eq1 = (u * u_x + v * u_y) + p_x - nu_eff * (u_xx + u_yy)
    eq2 = (u * v_x + v * v_y) + p_y - nu_eff * (v_xx + v_yy)
    eq3 = u_x + v_y
    eq4 = (eq1 * (u - 0.5) + eq2 * (v - 0.5)) - e
    return Residuals(eq1, eq2, eq3, eq4, e, derivs[0])


def next_vis_t(vis_t_minus: jax.Array, vis_t0: float) -> jax.Array:
    """vis_t used THIS step: min(20/Re, previous alpha_evm*|e|)
    (ev-NSFnet/pinn_solver.py:327-331). Pure device math — the reference
    routes this through host numpy every iteration (a per-step D2H sync)."""
    return jnp.minimum(vis_t0, vis_t_minus)


def update_vis_t_minus(e: jax.Array, alpha_evm: jax.Array) -> jax.Array:
    """Carry for the NEXT step: alpha_evm*|e|, detached
    (ev-NSFnet/pinn_solver.py:334)."""
    return jax.lax.stop_gradient(alpha_evm * jnp.abs(e))
