"""Throughput-oriented batched RTI step (fused Pallas QP backend).

The production serving path (BASELINE.json configs 3-5): many independent
NMPC instances advanced one SQP-RTI iteration per call.  Mathematically
identical to vmap(rti_step) with the XLA IPM backend — the difference is
the QP solve runs through `ops.ipm_fast` (batch-last fused Riccati
kernels), which is an order of magnitude faster per iteration on TPU.

States stay batch-first at the API (compatible with `solver.rti.RTIState`
pytrees); layout conversion to batch-last happens at the QP boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.models.quadrotor import dynamics
from crazyflie_nmpc_tpu.ops import ipm, ipm_fast
from crazyflie_nmpc_tpu.ops.integrators import linearize_trajectory
from crazyflie_nmpc_tpu.solver.ocp import OCPSpec
from crazyflie_nmpc_tpu.solver.rti import RTIOutput, RTIState


def rti_step_batched(spec: OCPSpec, states: RTIState, x0s: jax.Array,
                     yref: jax.Array, yref_e: jax.Array,
                     config: ipm.IPMConfig = ipm.IPMConfig(),
                     block_b: int = 128, stages_per_step: int = 1,
                     interpret: bool = False,
                     fused_prep: bool = True,
                     prep_stages_per_step: int = 5,
                     condense: int = 1):
    """One RTI iteration for a batch of problems.

    Args:
      states: RTIState with leading batch axis (x_traj (B,N+1,nx),
        u_traj (B,N,nu)).
      x0s: (B, nx).  yref: (N, ny) shared or (B, N, ny) per-problem;
      yref_e likewise.
    Returns (RTIState', RTIOutput) with leading batch axes.
    """
    B = x0s.shape[0]
    cost = spec.cost
    nx = states.x_traj.shape[-1]
    nu = states.u_traj.shape[-1]
    N = states.u_traj.shape[-2]
    dtype = states.x_traj.dtype

    # --- batch-last diagonal QP assembly: the reference cost is LLS with
    # selector Vx/Vu and diagonal W (generate_c_code.py:86-107), so
    # qx = q ⊙ (x - yref_x), ru = r ⊙ (u - yref_u), Hessians are the
    # broadcast diagonals.
    bl = lambda z: jnp.moveaxis(z, 0, -1)          # batch-first -> last
    q_diag = jnp.diagonal(cost.W)[:nx].astype(dtype)
    r_diag = jnp.diagonal(cost.W)[nx:].astype(dtype)
    pT_diag = jnp.diagonal(cost.W_e).astype(dtype)

    if yref.ndim == 2:
        yref_b = yref[None]
        yref_e_b = yref_e[None]
    else:
        yref_b, yref_e_b = yref, yref_e
    p = pT_diag * (states.x_traj[:, -1] - yref_e_b)

    if fused_prep and spec.sim_steps == 1:
        # preparation phase as ONE Pallas launch: ERK4 + sparse analytic
        # VDE + assembly (ops.pallas.prep_kernel)
        from crazyflie_nmpc_tpu.ops.pallas import prep_kernel as pk

        while N % prep_stages_per_step != 0:  # shrink to a divisor of N
            prep_stages_per_step -= 1

        par = spec.params
        ptile = jnp.stack([jnp.broadcast_to(jnp.asarray(v, dtype), (B,))
                           for v in (par.g0, par.mq, par.Ixx, par.Iyy,
                                     par.Izz, par.Cd, par.Ct, par.l,
                                     spec.dt)])
        yref_bl = jnp.broadcast_to(
            jnp.moveaxis(yref_b, 0, -1), (N, nx + nu, B))
        tile = lambda v, n: jnp.broadcast_to(
            jnp.asarray(v, dtype).reshape(n, 1), (n, B))
        A_k, B_k, c_k, qx_k, ru_k, lb_k, ub_k = pk.prep_sweep(
            bl(states.x_traj), bl(states.u_traj), yref_bl,
            tile(q_diag, nx), tile(r_diag, nu),
            tile(jnp.broadcast_to(spec.lbu, (nu,)), nu),
            tile(jnp.broadcast_to(spec.ubu, (nu,)), nu),
            ptile, block_b=block_b,
            stages_per_step=prep_stages_per_step, interpret=interpret)
        qp = dict(
            A=A_k, B=B_k, c=c_k, qx=qx_k, ru=ru_k, lb=lb_k, ub=ub_k,
            qxx=jnp.broadcast_to(q_diag[None, :, None], (N, nx, B)),
            ruu=jnp.broadcast_to(r_diag[None, :, None], (N, nu, B)),
            pT=jnp.broadcast_to(pT_diag[:, None], (nx, B)),
            p=bl(p),
            dx0=bl(x0s - states.x_traj[:, 0]),
        )
    else:
        # XLA preparation: stage-parallel jacfwd linearization
        x_next, A, Bm = jax.vmap(
            lambda xt, ut: linearize_trajectory(dynamics, spec.params, xt,
                                                ut, spec.dt, spec.sim_steps)
        )(states.x_traj, states.u_traj)
        qx = q_diag * (states.x_traj[:, :-1] - yref_b[..., :nx])
        ru = r_diag * (states.u_traj - yref_b[..., nx:])
        qp = dict(
            A=bl(A), B=bl(Bm),
            c=bl(x_next - states.x_traj[:, 1:]),
            qxx=jnp.broadcast_to(q_diag[None, :, None], (N, nx, B)),
            qx=bl(qx),
            ruu=jnp.broadcast_to(r_diag[None, :, None], (N, nu, B)),
            ru=bl(ru),
            pT=jnp.broadcast_to(pT_diag[:, None], (nx, B)),
            p=bl(p),
            lb=bl(spec.lbu - states.u_traj),
            ub=bl(spec.ubu - states.u_traj),
            dx0=bl(x0s - states.x_traj[:, 0]),
        )

    # --- feedback: batch-last fused IPM
    sol = ipm_fast.solve_batched(qp, config,
                                 block_b=block_b,
                                 stages_per_step=stages_per_step,
                                 interpret=interpret,
                                 condense=condense)
    dx = jnp.moveaxis(sol.dx, -1, 0)   # (B, N+1, nx)
    du = jnp.moveaxis(sol.du, -1, 0)   # (B, N, nu)

    x_traj = states.x_traj + dx
    u_traj = states.u_traj + du

    res_nl = jnp.maximum(jnp.max(jnp.abs(qp["c"]), axis=(0, 1)),
                         jnp.max(jnp.abs(qp["dx0"]), axis=0))
    step_norm = jnp.maximum(jnp.max(jnp.abs(du), axis=(1, 2)),
                            jnp.max(jnp.abs(dx), axis=(1, 2)))

    new_states = RTIState(x_traj=x_traj, u_traj=u_traj)
    out = RTIOutput(
        u0=u_traj[:, 0],
        u1=u_traj[:, 1],
        x_plan=x_traj,
        u_plan=u_traj,
        kkt_res=jnp.maximum(res_nl, step_norm),
        qp_mu=sol.stats["mu"],
    )
    return new_states, out
