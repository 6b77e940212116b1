"""The jitted training step and scan-chunked multi-step runner.

One step = the reference's full-batch epoch (solve_Adam body,
ev-NSFnet/pinn_solver.py:456-480), fully on device:

  * forward-mode NS residuals on the collocation batch,
  * BC / equation / supervised losses with global-mean semantics,
  * Adam update of the main net every step,
  * gated Adam update of the EVM net once per `evm_update_freq` steps —
    the in-jit equivalent of the reference's freeze/defreeze schedule
    (pinn_solver.py:452-462: EVM trains exactly on stage-epochs
    k*10000, k>=1). Divergence (intentional, see SURVEY §7): the reference
    REBUILDS the Adam optimizer at every freeze/unfreeze, zeroing moments
    for ALL nets (pinn_solver.py:489-511); we keep moments.
  * the vis_t carry update (device-side; the reference round-trips through
    host numpy every step, pinn_solver.py:327-334).

`make_chunk_runner` wraps the step in a lax.scan so thousands of steps run
per host dispatch; learning rate and alpha_evm are runtime scalars, so
stage changes never retrace.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nsfnet_tpu.ops import losses as L
from nsfnet_tpu.ops import residuals as R
from nsfnet_tpu.training.state import Batch, StepMetrics, TrainState

Engine = Callable[..., tuple]  # (params, X[N,2]) -> Derivs


class StageScalars(NamedTuple):
    """Per-stage runtime scalars — traced, so stage changes never retrace.

    Beyond the reference's per-stage (lr, alpha_evm), the framework supports
    a staged-Re curriculum and boundary-weight annealing (BASELINE.json
    config 'NSFnet Re=2000 with staged-Re curriculum, boundary-weight
    annealing, L-BFGS polish')."""

    lr: jax.Array
    alpha_evm: jax.Array
    re: jax.Array
    alpha_b: jax.Array


def make_loss_fn(
    engine: Engine,
    apply_main: Callable,
    apply_evm: Optional[Callable],
    coord_scale: float,
    alpha_e: float,
    alpha_s: float,
    entropy_weight: float = 0.1,
    evm: bool = True,
    axis_name: Optional[str] = None,
    loss_mode: str = "MSE",
    fused_eq_loss: Optional[Callable] = None,
):
    """Build the pure loss function. Static config is closed over; runtime
    scalars (lr/alpha_evm/Re/bc weight) are arguments so stages don't
    retrace.

    axis_name: set when the loss runs inside shard_map — every component is
    a local-sum/global-count, so one stacked psum turns them into exact
    global means (the collective-light version of the reference's per-rank
    loss all_reduce, ev-NSFnet/pinn_solver.py:413-424).

    loss_mode: 'MSE' (default) or 'L2' — the reference v1's un-normalized
    L2-norm loss (NSFnet/pinn_solver.py:201-218). L2 is single-program only
    (like the reference's); the solver rejects L2 + sharding/microbatching.

    fused_eq_loss: optional fused Pallas residual-loss engine
    (ops/pallas_residual.make_fused_residual_loss) — replaces the
    engine -> residual -> masked-sum chain for the equation component with
    one kernel that returns the per-equation weighted sums of squares
    directly (MSE mode only). The EVM net still runs through XLA; its
    gradient flows via the kernel's g_e cotangent.
    """
    assert loss_mode in ("MSE", "L2")
    if loss_mode == "L2":
        assert axis_name is None, "L2 loss mode is not supported under shard_map"
        assert fused_eq_loss is None, "fused_eq_loss is MSE-mode only"

    def eq_loss_fn(params_all, x_f, y_f, eq_w, n_f, vis_t_minus, sc: StageScalars):
        """Equation-residual part of the loss on a (micro)batch of
        collocation points. Component values are partial-sum/global-count,
        so microbatch contributions ADD to the full-batch values."""
        params, params_evm = params_all
        re = sc.re
        vis_t0 = 20.0 / re  # ev-NSFnet/pinn_solver.py:67
        x_eq = jnp.concatenate([x_f, y_f], axis=1)

        if fused_eq_loss is not None:
            if evm:
                e = apply_evm(params_evm, x_eq)[:, 0:1]
                vis_t = R.next_vis_t(vis_t_minus, vis_t0)
                sums = fused_eq_loss(params, x_eq, e, vis_t, eq_w, re)
                l1, l2, l3, l4 = sums[0] / n_f, sums[1] / n_f, sums[2] / n_f, \
                    sums[3] / n_f
                new_vis_t_minus = R.update_vis_t_minus(e, sc.alpha_evm)
                vis_t_mean = jnp.sum(vis_t * eq_w) / n_f
                loss_e = l1 + l2 + l3 + entropy_weight * l4
            else:
                sums = fused_eq_loss(params, x_eq, eq_w, re)
                l1, l2, l3 = sums[0] / n_f, sums[1] / n_f, sums[2] / n_f
                l4 = jnp.zeros(())
                new_vis_t_minus = vis_t_minus
                vis_t_mean = jnp.zeros(())
                loss_e = l1 + l2 + l3
            return alpha_e * loss_e, (l1, l2, l3, l4, vis_t_mean,
                                      new_vis_t_minus)

        derivs = engine(params, x_eq)
        if evm:
            e = apply_evm(params_evm, x_eq)[:, 0:1]
            vis_t = R.next_vis_t(vis_t_minus, vis_t0)
            res = R.ev_ns_residuals(derivs, e, vis_t, re, coord_scale)
            new_vis_t_minus = R.update_vis_t_minus(e, sc.alpha_evm)
            vis_t_mean = jnp.sum(vis_t * eq_w) / n_f
        else:
            res = R.ns_residuals(derivs, re, coord_scale)
            new_vis_t_minus = vis_t_minus
            vis_t_mean = jnp.zeros(())

        if loss_mode == "L2":
            l1 = L.masked_l2_norm(res.eq1, eq_w)
            l2 = L.masked_l2_norm(res.eq2, eq_w)
            l3 = L.masked_l2_norm(res.eq3, eq_w)
            l4 = (L.masked_l2_norm(res.eq4, eq_w) if res.eq4 is not None
                  else jnp.zeros(()))
            loss_e = l1 + l2 + l3 + (entropy_weight * l4 if evm else 0.0)
        else:
            loss_e, (l1, l2, l3, l4) = L.equation_loss(res, eq_w, n_f, entropy_weight)
        return alpha_e * loss_e, (l1, l2, l3, l4, vis_t_mean, new_vis_t_minus)

    def aux_loss_fn(params_all, batch: Batch, sc: StageScalars):
        """Boundary + supervised part, weighted. Returns the weighted value
        plus the raw components."""
        params, _ = params_all
        x_bc = jnp.concatenate([batch.x_b, batch.y_b], axis=1)
        uvp_b = apply_main(params, x_bc)
        if loss_mode == "L2":
            # norm(u_b - u_pred) + norm(v_b - v_pred), NSFnet/pinn_solver.py:201-203
            loss_b = (L.masked_l2_norm(uvp_b[:, 0:1] - batch.u_b, batch.b_mask)
                      + L.masked_l2_norm(uvp_b[:, 1:2] - batch.v_b, batch.b_mask))
        else:
            loss_b = L.boundary_loss(uvp_b[:, 0:1], uvp_b[:, 1:2],
                                     batch.u_b, batch.v_b, batch.b_mask, batch.n_b)

        if batch.x_s is not None:
            x_sup = jnp.concatenate([batch.x_s, batch.y_s], axis=1)
            uvp_s = apply_main(params, x_sup)
            loss_s = L.supervised_loss(
                uvp_s[:, 0:1], uvp_s[:, 1:2], uvp_s[:, 2:3],
                batch.u_s, batch.v_s, batch.p_s,
                batch.s_mask, batch.n_s, batch.p_mask, batch.n_p)
        else:
            loss_s = jnp.zeros(())
        return sc.alpha_b * loss_b + alpha_s * loss_s, (loss_b, loss_s)

    def assemble(loss_b, l1, l2, l3, l4, loss_s, vis_t_mean, sc):
        """psum (if sharded) + totals + metrics, from raw components."""
        if axis_name is not None:
            # one collective for all components (each is local-sum/global-count)
            stacked = jax.lax.psum(
                jnp.stack([loss_b, l1, l2, l3, l4, loss_s, vis_t_mean]), axis_name)
            loss_b, l1, l2, l3, l4, loss_s, vis_t_mean = stacked
        loss_e = l1 + l2 + l3 + (entropy_weight * l4 if evm else 0.0)
        total = sc.alpha_b * loss_b + alpha_e * loss_e + alpha_s * loss_s
        return StepMetrics(total, loss_b, loss_e, loss_s, l1, l2, l3, l4, vis_t_mean)

    def loss_fn(params_all, batch: Batch, vis_t_minus, sc: StageScalars):
        _, (l1, l2, l3, l4, vis_t_mean, new_vis_t_minus) = eq_loss_fn(
            params_all, batch.x_f, batch.y_f, batch.eq_w, batch.n_f,
            vis_t_minus, sc)
        _, (loss_b, loss_s) = aux_loss_fn(params_all, batch, sc)
        metrics = assemble(loss_b, l1, l2, l3, l4, loss_s, vis_t_mean, sc)
        return metrics.total, (metrics, new_vis_t_minus)

    loss_fn.eq_loss_fn = eq_loss_fn
    loss_fn.aux_loss_fn = aux_loss_fn
    loss_fn.assemble = assemble
    return loss_fn


def make_residual_fn(
    engine: Engine,
    apply_main: Callable,
    apply_evm: Optional[Callable],
    coord_scale: float,
    alpha_e: float,
    alpha_s: float,
    entropy_weight: float = 0.1,
    evm: bool = True,
):
    """Flat weighted-residual vector r(params) with sum(r^2) == the MSE
    loss total, exactly (same masks/counts/weights as make_loss_fn).

    This is the least-squares structure Gauss-Newton / Levenberg-Marquardt
    exploits (training/lm.py): r stacks sqrt(alpha/count)-scaled equation,
    boundary, and supervised residuals; pad rows carry weight 0 so they
    contribute zero rows to the Jacobian. Single-program (no collectives),
    MSE mode only."""

    def eq_residual_fn(params_all, x_f, y_f, eq_w, vis_t_minus, n_f,
                       sc: StageScalars):
        """Equation-point rows only, on an arbitrary SLICE of the
        collocation set. `n_f` is the GLOBAL real-point count (slices must
        keep the full-batch row scaling so concatenating slice outputs
        reproduces the full residual vector exactly) — this is what the
        microbatched Gauss-Newton products scan over (training/lm.py)."""
        params, params_evm = params_all
        re = sc.re
        vis_t0 = 20.0 / re
        x_eq = jnp.concatenate([x_f, y_f], axis=1)
        derivs = engine(params, x_eq)
        if evm:
            e = apply_evm(params_evm, x_eq)[:, 0:1]
            vis_t = R.next_vis_t(vis_t_minus, vis_t0)
            res = R.ev_ns_residuals(derivs, e, vis_t, re, coord_scale)
        else:
            res = R.ns_residuals(derivs, re, coord_scale)
        sw = jnp.sqrt(eq_w * (alpha_e / n_f))
        parts = [sw * res.eq1, sw * res.eq2, sw * res.eq3]
        if evm and res.eq4 is not None:
            parts.append(jnp.sqrt(jnp.asarray(entropy_weight)) * sw * res.eq4)
        return jnp.concatenate([p.reshape(-1) for p in parts])

    def aux_residual_fn(params_all, batch: Batch, sc: StageScalars):
        """Boundary + supervised rows (small, never sliced)."""
        params, _ = params_all
        parts = []
        x_bc = jnp.concatenate([batch.x_b, batch.y_b], axis=1)
        uvp_b = apply_main(params, x_bc)
        bw = jnp.sqrt(batch.b_mask * (sc.alpha_b / batch.n_b))
        parts += [bw * (uvp_b[:, 0:1] - batch.u_b),
                  bw * (uvp_b[:, 1:2] - batch.v_b)]

        if batch.x_s is not None:
            x_sup = jnp.concatenate([batch.x_s, batch.y_s], axis=1)
            uvp_s = apply_main(params, x_sup)
            suw = jnp.sqrt(batch.s_mask * (alpha_s / batch.n_s))
            parts += [suw * (uvp_s[:, 0:1] - batch.u_s),
                      suw * (uvp_s[:, 1:2] - batch.v_s)]
            if batch.p_s is not None and batch.p_mask is not None:
                pw = jnp.sqrt(batch.p_mask
                              * (alpha_s / jnp.maximum(batch.n_p, 1.0)))
                p_t = jnp.where(batch.p_mask > 0, batch.p_s, 0.0)
                p_p = jnp.where(batch.p_mask > 0, uvp_s[:, 2:3], 0.0)
                parts.append(pw * (p_p - p_t))
        return jnp.concatenate([p.reshape(-1) for p in parts])

    def residual_fn(params_all, batch: Batch, vis_t_minus, sc: StageScalars):
        r_eq = eq_residual_fn(params_all, batch.x_f, batch.y_f, batch.eq_w,
                              vis_t_minus, batch.n_f, sc)
        r_aux = aux_residual_fn(params_all, batch, sc)
        return jnp.concatenate([r_eq, r_aux])

    residual_fn.eq_residual_fn = eq_residual_fn
    residual_fn.aux_residual_fn = aux_residual_fn
    return residual_fn


def make_train_step(
    loss_fn,
    tx_main: optax.GradientTransformation,
    tx_evm: Optional[optax.GradientTransformation],
    evm_update_freq: int = 10000,
    evm: bool = True,
    axis_name: Optional[str] = None,
):
    """Adam with runtime learning rate: tx = scale_by_adam, applied as
    params += -lr * direction. The EVM update is gated by lax.cond on the
    stage-epoch counter, leaving its params AND moments untouched on frozen
    steps (exact freeze semantics without optimizer rebuilds).

    axis_name: inside shard_map, per-shard gradients are psummed before the
    optimizer update (the DDP-allreduce equivalent, compiled over ICI)."""

    def train_step(state: TrainState, batch: Batch, sc: StageScalars):
        (_, (metrics, new_vtm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.params, state.params_evm), batch, state.vis_t_minus, sc)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
        g_main, g_evm = grads
        lr = sc.lr

        upd, new_opt_main = tx_main.update(g_main, state.opt_main, state.params)
        new_params = jax.tree.map(lambda p, u: p - lr * u, state.params, upd)

        if evm:
            # EVM trains on stage-epochs k*evm_update_freq, k>=1
            # (ev-NSFnet/pinn_solver.py:456-462).
            do_evm = jnp.logical_and(
                state.epoch_in_stage % evm_update_freq == 0,
                state.epoch_in_stage > 0)

            def evm_apply_update(args):
                p, o, g = args
                u, o2 = tx_evm.update(g, o, p)
                return jax.tree.map(lambda pp, uu: pp - lr * uu, p, u), o2

            def evm_keep(args):
                p, o, _ = args
                return p, o

            new_params_evm, new_opt_evm = jax.lax.cond(
                do_evm, evm_apply_update, evm_keep,
                (state.params_evm, state.opt_evm, g_evm))
        else:
            new_params_evm, new_opt_evm = state.params_evm, state.opt_evm

        new_state = TrainState(
            params=new_params,
            params_evm=new_params_evm,
            opt_main=new_opt_main,
            opt_evm=new_opt_evm,
            vis_t_minus=new_vtm,
            step=state.step + 1,
            epoch_in_stage=state.epoch_in_stage + 1,
        )
        return new_state, metrics

    return train_step


def make_microbatched_train_step(
    loss_fn,
    tx_main: optax.GradientTransformation,
    tx_evm: Optional[optax.GradientTransformation],
    n_micro: int,
    evm_update_freq: int = 10000,
    evm: bool = True,
    axis_name: Optional[str] = None,
):
    """Gradient-accumulation variant: the collocation batch is processed in
    `n_micro` sequential microbatches inside a lax.scan, so N_f can exceed
    what one residual-engine activation footprint allows in HBM (the
    scaling axis the reference leaves unimplemented —
    ev-NSFnet/README.md roadmap; SURVEY §5.7).

    Loss components are partial-sum/global-count, so microbatch gradients
    and component sums ADD exactly to the full-batch values; the optimizer
    update is mathematically identical to the non-microbatched step.
    """
    eq_fn = loss_fn.eq_loss_fn
    aux_fn = loss_fn.aux_loss_fn
    assemble = loss_fn.assemble

    def train_step(state: TrainState, batch: Batch, sc: StageScalars):
        params_all = (state.params, state.params_evm)

        def mb(a):
            return a.reshape(n_micro, -1, a.shape[-1]) if a is not None else None

        xs = (mb(batch.x_f), mb(batch.y_f), mb(batch.eq_w),
              mb(state.vis_t_minus) if state.vis_t_minus is not None else None)

        def eq_value(p_all, x_f, y_f, w, vtm):
            val, aux = eq_fn(p_all, x_f, y_f, w, batch.n_f, vtm, sc)
            return val, aux

        zero_g = jax.tree.map(jnp.zeros_like, params_all)

        def body(carry, mbatch):
            g_acc, comp_acc = carry
            x_f, y_f, w, vtm = mbatch
            (_, (l1, l2, l3, l4, vmean, nvtm)), g = jax.value_and_grad(
                eq_value, has_aux=True)(params_all, x_f, y_f, w, vtm)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            comp_acc = comp_acc + jnp.stack([l1, l2, l3, l4, vmean])
            return (g_acc, comp_acc), nvtm

        (g_eq, comps), nvtm_stack = jax.lax.scan(
            body, (zero_g, jnp.zeros(5)), xs)
        l1, l2, l3, l4, vis_t_mean = comps
        new_vtm = (nvtm_stack.reshape(-1, nvtm_stack.shape[-1])
                   if state.vis_t_minus is not None else None)

        (_, (loss_b, loss_s)), g_aux = jax.value_and_grad(
            aux_fn, has_aux=True)(params_all, batch, sc)
        grads = jax.tree.map(jnp.add, g_eq, g_aux)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
        metrics = assemble(loss_b, l1, l2, l3, l4, loss_s, vis_t_mean, sc)

        g_main, g_evm = grads
        lr = sc.lr
        upd, new_opt_main = tx_main.update(g_main, state.opt_main, state.params)
        new_params = jax.tree.map(lambda p, u: p - lr * u, state.params, upd)

        if evm:
            do_evm = jnp.logical_and(
                state.epoch_in_stage % evm_update_freq == 0,
                state.epoch_in_stage > 0)

            def evm_apply_update(args):
                p, o, g = args
                u, o2 = tx_evm.update(g, o, p)
                return jax.tree.map(lambda pp, uu: pp - lr * uu, p, u), o2

            def evm_keep(args):
                p, o, _ = args
                return p, o

            new_params_evm, new_opt_evm = jax.lax.cond(
                do_evm, evm_apply_update, evm_keep,
                (state.params_evm, state.opt_evm, g_evm))
        else:
            new_params_evm, new_opt_evm = state.params_evm, state.opt_evm

        return TrainState(
            params=new_params,
            params_evm=new_params_evm,
            opt_main=new_opt_main,
            opt_evm=new_opt_evm,
            vis_t_minus=new_vtm,
            step=state.step + 1,
            epoch_in_stage=state.epoch_in_stage + 1,
        ), metrics

    return train_step


def make_chunk_runner(train_step, matmul_precision: str = "highest"):
    """Run `n_steps` training steps in one jitted lax.scan dispatch.

    n_steps is static (few distinct chunk sizes per run => few compiles);
    lr / alpha_evm are traced scalars. Returns the final state and the LAST
    step's metrics (what the reference logs, pinn_solver.py:478-480).
    """

    @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("state",))
    def run_chunk(state: TrainState, batch: Batch, sc: StageScalars, n_steps: int):
        with jax.default_matmul_precision(matmul_precision):
            def body(carry, _):
                new_carry, _metrics = train_step(carry, batch, sc)
                return new_carry, None

            # n_steps-1 silent steps in a scan, then one metric-reporting
            # step (the reference logs only the interval's last epoch,
            # pinn_solver.py:478-480).
            if n_steps > 1:
                state, _ = jax.lax.scan(body, state, None, length=n_steps - 1)
            state, metrics = train_step(state, batch, sc)
        return state, metrics

    return run_chunk


def make_sharded_chunk_runner(train_step, mesh, state_template, batch_template,
                              matmul_precision: str = "highest",
                              data_axis: str = "data"):
    """shard_map version of the chunk runner: point batches and the vis_t
    carry arrive pre-sharded on the data axis, params/optimizer state are
    replicated, and the step's psums (loss components + gradients) ride ICI.

    Required when the residual engine is a Pallas kernel (XLA cannot
    auto-partition a custom call); gives identical math to the jit path.
    """
    from jax.sharding import PartitionSpec as P

    batch_spec = jax.tree.map(
        lambda a: P(data_axis, None) if getattr(a, "ndim", 0) == 2 else P(),
        batch_template)
    state_spec = jax.tree.map(lambda a: P(), state_template)
    if state_template.vis_t_minus is not None:
        state_spec = state_spec._replace(vis_t_minus=P(data_axis, None))
    sc_spec = StageScalars(P(), P(), P(), P())
    metrics_spec = StepMetrics(*([P()] * len(StepMetrics._fields)))

    cache = {}

    def run_chunk(state: TrainState, batch: Batch, sc: StageScalars, n_steps: int):
        if n_steps not in cache:
            def body_fn(state, batch, sc):
                with jax.default_matmul_precision(matmul_precision):
                    def body(carry, _):
                        new_carry, _m = train_step(carry, batch, sc)
                        return new_carry, None

                    if n_steps > 1:
                        state, _ = jax.lax.scan(body, state, None, length=n_steps - 1)
                    state, metrics = train_step(state, batch, sc)
                return state, metrics

            # check_vma=False: pallas_call outputs don't carry vma metadata
            sharded = jax.shard_map(
                body_fn, mesh=mesh,
                in_specs=(state_spec, batch_spec, sc_spec),
                out_specs=(state_spec, metrics_spec),
                check_vma=False)
            cache[n_steps] = jax.jit(sharded, donate_argnums=(0,))
        return cache[n_steps](state, batch, sc)

    return run_chunk
