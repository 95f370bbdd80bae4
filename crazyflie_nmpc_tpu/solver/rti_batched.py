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
    nx = states.x_traj.shape[-1]
    nu = states.u_traj.shape[-1]
    N = states.u_traj.shape[-2]
    dtype = states.x_traj.dtype

    # --- preparation: stage-parallel linearization for all problems
    x_next, A, Bm = jax.vmap(
        lambda xt, ut: linearize_trajectory(dynamics, spec.params, xt, ut,
                                            spec.dt, spec.sim_steps)
    )(states.x_traj, states.u_traj)

    # --- batch-last diagonal QP assembly, built directly (no dense cost
    # blocks, no QPData detour): the reference cost is LLS with selector
    # Vx/Vu and diagonal W (generate_c_code.py:86-107), so
    # qx = q ⊙ (x - yref_x), ru = r ⊙ (u - yref_u), Hessians are the
    # broadcast diagonals.  Skipping the dense (B, N, 13, 13) blocks saves
    # both their construction and a ~35 MB layout transpose per step.
    bl = lambda z: jnp.moveaxis(z, 0, -1)          # batch-first -> last
    q_diag = jnp.diagonal(cost.W)[:nx].astype(dtype)
    r_diag = jnp.diagonal(cost.W)[nx:].astype(dtype)
    pT_diag = jnp.diagonal(cost.W_e).astype(dtype)

    if yref.ndim == 2:
        yref_b = yref[None]
        yref_e_b = yref_e[None]
    else:
        yref_b, yref_e_b = yref, yref_e
    qx = q_diag * (states.x_traj[:, :-1] - yref_b[..., :nx])
    ru = r_diag * (states.u_traj - yref_b[..., nx:])
    p = pT_diag * (states.x_traj[:, -1] - yref_e_b)

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
                                 interpret=interpret)
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
