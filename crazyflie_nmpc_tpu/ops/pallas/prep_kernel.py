"""Fused RTI preparation kernel: ERK4 + analytic VDE + QP assembly.

One Pallas launch replaces the XLA preparation phase (jacfwd linearization
+ Gauss-Newton assembly + batch-last layout change), which profiled at
~3.7 ms of the 8.4 ms step at B=1024.  Three ingredients:

  * batch-last channel layout: the state tile is (13, B); every dynamics
    channel and Jacobian entry is a (B,)-lane vector (same layout story as
    riccati_kernels.py);
  * the hand-derived Jacobians (models.quadrotor.dynamics_jacobians) kept
    in SPARSE form — df/dx has ~60 structural nonzeros of 169, so the
    chain-rule products J @ S cost ~60 row-FMAs instead of 169, and the
    whole VDE is ~6x fewer FLOPs than pushing 17 jacfwd tangents;
  * the RK4 tangent chain of `ops.integrators.step_with_sensitivities_vde`
    (K_i = J_i (I + gamma_i dt K_{i-1}), A = I + dt/6 sum b_i K_i).

Stages are independent — the grid is (batch_blocks, stage_blocks) with no
carried scratch.  Physical params stream as an (8, B) tile so per-problem
perturbations (the Monte-Carlo config) batch for free.

Exactness: equals `linearize_trajectory` + the diagonal QP assembly to
f32 roundoff (tests/test_pallas_kernels.py::test_prep_kernel_*).
Dynamics/Jacobian expressions mirror models/quadrotor.py (the reference
ODE, export_ode_model.py:85-97); any drift is caught by the parity test.
"""

from __future__ import annotations

import functools as _ft

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 13
NU = 4
NY = NX + NU
NPARAM = 9  # g0, mq, Ixx, Iyy, Izz, Cd, Ct, l, dt
# (dt rides the params tile because tf is a traced OCPSpec leaf)


def _dyn_rows(p, x, u):
    """13 dynamics channels as (B,) rows; x (13,B), u (4,B), p (8,B)."""
    g0, mq, Ixx, Iyy, Izz, Cd, Ct, l = (p[i] for i in range(8))
    q1, q2, q3, q4 = x[3], x[4], x[5], x[6]
    vbx, vby, vbz = x[7], x[8], x[9]
    wx, wy, wz = x[10], x[11], x[12]
    w1, w2, w3, w4 = u[0], u[1], u[2], u[3]

    dxq = (vbx * (2 * q1 * q1 + 2 * q2 * q2 - 1)
           - vby * (2 * q1 * q4 - 2 * q2 * q3)
           + vbz * (2 * q1 * q3 + 2 * q2 * q4))
    dyq = (vby * (2 * q1 * q1 + 2 * q3 * q3 - 1)
           + vbx * (2 * q1 * q4 + 2 * q2 * q3)
           - vbz * (2 * q1 * q2 - 2 * q3 * q4))
    dzq = (vbz * (2 * q1 * q1 + 2 * q4 * q4 - 1)
           - vbx * (2 * q1 * q3 - 2 * q2 * q4)
           + vby * (2 * q1 * q2 + 2 * q3 * q4))
    dq1 = -(q2 * wx) / 2 - (q3 * wy) / 2 - (q4 * wz) / 2
    dq2 = (q1 * wx) / 2 - (q4 * wy) / 2 + (q3 * wz) / 2
    dq3 = (q4 * wx) / 2 + (q1 * wy) / 2 - (q2 * wz) / 2
    dq4 = (q2 * wy) / 2 - (q3 * wx) / 2 + (q1 * wz) / 2
    thrust = (Ct * (w1 * w1 + w2 * w2 + w3 * w3 + w4 * w4)) / mq
    dvbx = vby * wz - vbz * wy + g0 * (2 * q1 * q3 - 2 * q2 * q4)
    dvby = vbz * wx - vbx * wz - g0 * (2 * q1 * q2 + 2 * q3 * q4)
    dvbz = (vbx * wy - vby * wx
            - g0 * (2 * q1 * q1 + 2 * q4 * q4 - 1) + thrust)
    dwx = -(Ct * l * (w1 * w1 + w2 * w2 - w3 * w3 - w4 * w4)
            - Iyy * wy * wz + Izz * wy * wz) / Ixx
    dwy = -(Ct * l * (w1 * w1 - w2 * w2 - w3 * w3 + w4 * w4)
            + Ixx * wx * wz - Izz * wx * wz) / Iyy
    dwz = -(Cd * (w1 * w1 - w2 * w2 + w3 * w3 - w4 * w4)
            - Ixx * wx * wy + Iyy * wx * wy) / Izz
    return [dxq, dyq, dzq, dq1, dq2, dq3, dq4, dvbx, dvby, dvbz,
            dwx, dwy, dwz]


def _jx_entries(p, x):
    """Sparse df/dx: {(row, col): (B,) value} — mirrors
    models.quadrotor.dynamics_jacobians."""
    g0 = p[0]
    Ixx, Iyy, Izz = p[2], p[3], p[4]
    q1, q2, q3, q4 = x[3], x[4], x[5], x[6]
    vbx, vby, vbz = x[7], x[8], x[9]
    wx, wy, wz = x[10], x[11], x[12]
    J = {
        # dxq row
        (0, 3): 4 * q1 * vbx - 2 * q4 * vby + 2 * q3 * vbz,
        (0, 4): 4 * q2 * vbx + 2 * q3 * vby + 2 * q4 * vbz,
        (0, 5): 2 * q2 * vby + 2 * q1 * vbz,
        (0, 6): -2 * q1 * vby + 2 * q2 * vbz,
        (0, 7): 2 * q1 * q1 + 2 * q2 * q2 - 1,
        (0, 8): -(2 * q1 * q4 - 2 * q2 * q3),
        (0, 9): 2 * q1 * q3 + 2 * q2 * q4,
        # dyq row
        (1, 3): 4 * q1 * vby + 2 * q4 * vbx - 2 * q2 * vbz,
        (1, 4): 2 * q3 * vbx - 2 * q1 * vbz,
        (1, 5): 4 * q3 * vby + 2 * q2 * vbx + 2 * q4 * vbz,
        (1, 6): 2 * q1 * vbx + 2 * q3 * vbz,
        (1, 7): 2 * q1 * q4 + 2 * q2 * q3,
        (1, 8): 2 * q1 * q1 + 2 * q3 * q3 - 1,
        (1, 9): -(2 * q1 * q2 - 2 * q3 * q4),
        # dzq row
        (2, 3): 4 * q1 * vbz - 2 * q3 * vbx + 2 * q2 * vby,
        (2, 4): 2 * q4 * vbx + 2 * q1 * vby,
        (2, 5): -2 * q1 * vbx + 2 * q4 * vby,
        (2, 6): 4 * q4 * vbz + 2 * q2 * vbx + 2 * q3 * vby,
        (2, 7): -(2 * q1 * q3 - 2 * q2 * q4),
        (2, 8): 2 * q1 * q2 + 2 * q3 * q4,
        (2, 9): 2 * q1 * q1 + 2 * q4 * q4 - 1,
        # quaternion kinematics rows
        (3, 4): -wx / 2, (3, 5): -wy / 2, (3, 6): -wz / 2,
        (3, 10): -q2 / 2, (3, 11): -q3 / 2, (3, 12): -q4 / 2,
        (4, 3): wx / 2, (4, 5): wz / 2, (4, 6): -wy / 2,
        (4, 10): q1 / 2, (4, 11): -q4 / 2, (4, 12): q3 / 2,
        (5, 3): wy / 2, (5, 4): -wz / 2, (5, 6): wx / 2,
        (5, 10): q4 / 2, (5, 11): q1 / 2, (5, 12): -q2 / 2,
        (6, 3): wz / 2, (6, 4): wy / 2, (6, 5): -wx / 2,
        (6, 10): -q3 / 2, (6, 11): q2 / 2, (6, 12): q1 / 2,
        # body-velocity rows
        (7, 3): 2 * g0 * q3, (7, 4): -2 * g0 * q4, (7, 5): 2 * g0 * q1,
        (7, 6): -2 * g0 * q2,
        (7, 8): wz, (7, 9): -wy, (7, 11): -vbz, (7, 12): vby,
        (8, 3): -2 * g0 * q2, (8, 4): -2 * g0 * q1, (8, 5): -2 * g0 * q4,
        (8, 6): -2 * g0 * q3,
        (8, 7): -wz, (8, 9): wx, (8, 10): vbz, (8, 12): -vbx,
        (9, 3): -4 * g0 * q1, (9, 6): -4 * g0 * q4,
        (9, 7): wy, (9, 8): -wx, (9, 10): -vby, (9, 11): vbx,
        # angular-rate rows
        (10, 11): (Iyy - Izz) * wz / Ixx, (10, 12): (Iyy - Izz) * wy / Ixx,
        (11, 10): (Izz - Ixx) * wz / Iyy, (11, 12): (Izz - Ixx) * wx / Iyy,
        (12, 10): (Ixx - Iyy) * wy / Izz, (12, 11): (Ixx - Iyy) * wx / Izz,
    }
    return J


def _ju_rows(p, u):
    """Sparse df/du rows: {row: [(col, (B,) value), ...]}."""
    mq, Ixx, Iyy, Izz = p[1], p[2], p[3], p[4]
    Cd, Ct, l = p[5], p[6], p[7]
    w1, w2, w3, w4 = u[0], u[1], u[2], u[3]
    tcm = 2.0 * Ct / mq
    tlx = 2.0 * Ct * l / Ixx
    tly = 2.0 * Ct * l / Iyy
    tdz = 2.0 * Cd / Izz
    return {
        9: [(0, tcm * w1), (1, tcm * w2), (2, tcm * w3), (3, tcm * w4)],
        10: [(0, -tlx * w1), (1, -tlx * w2), (2, tlx * w3), (3, tlx * w4)],
        11: [(0, -tly * w1), (1, tly * w2), (2, tly * w3), (3, -tly * w4)],
        12: [(0, -tdz * w1), (1, tdz * w2), (2, -tdz * w3), (3, tdz * w4)],
    }


def _jx_mul(J, S):
    """Sparse J (dict) @ dense S (13, m, B) -> (13, m, B)."""
    zero = jnp.zeros_like(S[0])
    rows = []
    for i in range(NX):
        acc = None
        for j in range(NX):
            e = J.get((i, j))
            if e is None:
                continue
            t = e * S[j]
            acc = t if acc is None else acc + t
        rows.append(zero if acc is None else acc)
    return jnp.stack(rows)


def _jx_dense(J, dtype, B):
    """Materialize the sparse Jacobian as (13, 13, B)."""
    zero = jnp.zeros((B,), dtype)
    return jnp.stack([
        jnp.stack([J.get((i, j), zero) + zero for j in range(NX)])
        for i in range(NX)
    ])


def _ju_dense(Ju_rows, dtype, B):
    zero = jnp.zeros((B,), dtype)
    return jnp.stack([
        jnp.stack([dict(Ju_rows.get(i, ())).get(j, zero) + zero
                   for j in range(NU)])
        for i in range(NX)
    ])


def _prep_kernel(ns, x_ref, xn_ref, u_ref, yref_ref,
                 qd_ref, rd_ref, lbu_ref, ubu_ref, p_ref,
                 A_out, B_out, c_out, qx_out, ru_out, lb_out, ub_out):
    p = p_ref[:]
    dt = p[8]
    dtype = p.dtype
    Bb = p.shape[-1]
    eye = jnp.eye(NX, dtype=dtype)[:, :, None]

    for j in range(ns):
        x = x_ref[j]          # (13, B)
        u = u_ref[j]          # (4, B)

        # ---- RK4 with the closed-form matrix VDE (sparse Jacobians)
        k1 = jnp.stack(_dyn_rows(p, x, u))
        J1 = _jx_entries(p, x)
        x2 = x + 0.5 * dt * k1
        k2 = jnp.stack(_dyn_rows(p, x2, u))
        J2 = _jx_entries(p, x2)
        x3 = x + 0.5 * dt * k2
        k3 = jnp.stack(_dyn_rows(p, x3, u))
        J3 = _jx_entries(p, x3)
        x4 = x + dt * k3
        k4 = jnp.stack(_dyn_rows(p, x4, u))
        J4 = _jx_entries(p, x4)

        K1 = _jx_dense(J1, dtype, Bb)
        K2 = _jx_mul(J2, eye + 0.5 * dt * K1)
        K3 = _jx_mul(J3, eye + 0.5 * dt * K2)
        K4 = _jx_mul(J4, eye + dt * K3)
        A = eye + (dt / 6.0) * (K1 + 2 * K2 + 2 * K3 + K4)

        # df/du is x-independent (rows 9..12 only), so G is shared by all
        # four stages
        G = _ju_dense(_ju_rows(p, u), dtype, Bb)
        M1 = G
        M2 = G + _jx_mul(J2, 0.5 * dt * M1)
        M3 = G + _jx_mul(J3, 0.5 * dt * M2)
        M4 = G + _jx_mul(J4, dt * M3)
        Bm = (dt / 6.0) * (M1 + 2 * M2 + 2 * M3 + M4)

        x_next = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        # ---- QP assembly (diagonal LLS cost, cf. rti_step_batched)
        A_out[j] = A
        B_out[j] = Bm
        c_out[j] = x_next - xn_ref[j]
        qx_out[j] = qd_ref[:] * (x - yref_ref[j][:NX])
        ru_out[j] = rd_ref[:] * (u - yref_ref[j][NX:])
        lb_out[j] = lbu_ref[:] - u
        ub_out[j] = ubu_ref[:] - u


def prep_sweep(x_traj, u_traj, yref, q_diag, r_diag, lbu, ubu, params,
               block_b: int = 128, stages_per_step: int = 5,
               interpret: bool = False):
    """Fused preparation launch.

    Args (batch-last):
      x_traj (N+1, 13, B), u_traj (N, 4, B), yref (N, 17, B),
      q_diag/r_diag/lbu/ubu as (13, B)/(4, B) tiles,
      params (9, B): [g0, mq, Ixx, Iyy, Izz, Cd, Ct, l, dt] (dt rides
      the tile because the horizon length is a traced spec leaf).
    Returns the per-stage QP arrays (A, B, c, qx, ru, lb, ub), batch-last.
    The (13, B)-sized terminal gradient and dx0 are one XLA op each and
    stay with the caller.
    """
    N = u_traj.shape[0]
    Btot = u_traj.shape[-1]
    dtype = u_traj.dtype
    ns = stages_per_step
    if N % ns != 0:
        raise ValueError(f"N={N} must be divisible by {ns}")
    if Btot % block_b != 0:
        raise ValueError(f"batch {Btot} must be divisible by {block_b}")
    nb = Btot // block_b
    ngrid = N // ns

    def spec(shape_prefix):
        def idx(b, n):
            return (n,) + (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec((ns,) + shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def flat(shape_prefix):
        def idx(b, n):
            return (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec(shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    in_specs = [
        spec((NX,)),      # x_k
        spec((NX,)),      # x_{k+1}
        spec((NU,)),      # u_k
        spec((NY,)),      # yref_k
        flat((NX,)),      # q_diag
        flat((NU,)),      # r_diag
        flat((NU,)),      # lbu
        flat((NU,)),      # ubu
        flat((NPARAM,)),  # params
    ]
    out_shape = (
        jax.ShapeDtypeStruct((N, NX, NX, Btot), dtype),  # A
        jax.ShapeDtypeStruct((N, NX, NU, Btot), dtype),  # B
        jax.ShapeDtypeStruct((N, NX, Btot), dtype),      # c
        jax.ShapeDtypeStruct((N, NX, Btot), dtype),      # qx
        jax.ShapeDtypeStruct((N, NU, Btot), dtype),      # ru
        jax.ShapeDtypeStruct((N, NU, Btot), dtype),      # lb
        jax.ShapeDtypeStruct((N, NU, Btot), dtype),      # ub
    )
    out_specs = (spec((NX, NX)), spec((NX, NU)), spec((NX,)), spec((NX,)),
                 spec((NU,)), spec((NU,)), spec((NU,)))
    return pl.pallas_call(
        _ft.partial(_prep_kernel, ns),
        grid=(nb, ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x_traj[:-1], x_traj[1:], u_traj, yref, q_diag, r_diag, lbu, ubu,
      params)
