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
from crazyflie_nmpc_tpu.ops.qp import build_qp, gauss_newton_cost_blocks
from crazyflie_nmpc_tpu.solver.ocp import OCPSpec
from crazyflie_nmpc_tpu.solver.rti import RTIOutput, RTIState


def rti_step_batched(spec: OCPSpec, states: RTIState, x0s: jax.Array,
                     yref: jax.Array, yref_e: jax.Array,
                     config: ipm.IPMConfig = ipm.IPMConfig(),
                     block_b: int = 128, stages_per_step: int = 1,
                     interpret: bool = False):
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

    # --- preparation: stage-parallel linearization for all problems
    x_next, A, Bm = jax.vmap(
        lambda xt, ut: linearize_trajectory(dynamics, spec.params, xt, ut,
                                            spec.dt, spec.sim_steps)
    )(states.x_traj, states.u_traj)

    if yref.ndim == 2:
        yref_b = jnp.broadcast_to(yref, (B,) + yref.shape)
        yref_e_b = jnp.broadcast_to(yref_e, (B,) + yref_e.shape)
    else:
        yref_b, yref_e_b = yref, yref_e

    qp = jax.vmap(
        lambda a, bm, xn, xt, ut, x0, yr, ye: build_qp(
            a, bm, xn, xt, ut, x0, spec.lbu, spec.ubu,
            gauss_newton_cost_blocks(cost.W, cost.Vx, cost.Vu, cost.W_e,
                                     cost.Vx_e, xt, ut, yr, ye))
    )(A, Bm, x_next, states.x_traj, states.u_traj, x0s, yref_b, yref_e_b)

    # --- feedback: batch-last fused IPM
    sol = ipm_fast.solve_batched(ipm_fast.from_qpdata(qp), config,
                                 block_b=block_b,
                                 stages_per_step=stages_per_step,
                                 interpret=interpret)
    dx = jnp.moveaxis(sol.dx, -1, 0)   # (B, N+1, nx)
    du = jnp.moveaxis(sol.du, -1, 0)   # (B, N, nu)

    x_traj = states.x_traj + dx
    u_traj = states.u_traj + du

    res_nl = jnp.maximum(jnp.max(jnp.abs(qp.c), axis=(1, 2)),
                         jnp.max(jnp.abs(qp.dx0), axis=1))
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
