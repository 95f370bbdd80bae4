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


def _pinv(p):
    """(1/mq, 1/Ixx, 1/Iyy, 1/Izz), hoisted ONCE per VDE stage: the row
    functions below run 4x per RK4 step each and every mass/inertia
    divide is a lane-wide VPU division (~2x the cost of the multiply
    that replaces it — the round-4 speed-of-light ablation's lesson,
    docs/PERF.md)."""
    return 1.0 / p[1], 1.0 / p[2], 1.0 / p[3], 1.0 / p[4]


def _dyn_rows(p, x, u, pi=None):
    """13 dynamics channels as (B,) rows; x (13,B), u (4,B), p (8,B)."""
    g0, mq, Ixx, Iyy, Izz, Cd, Ct, l = (p[i] for i in range(8))
    imq, iIxx, iIyy, iIzz = pi if pi is not None else _pinv(p)
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
    thrust = (Ct * (w1 * w1 + w2 * w2 + w3 * w3 + w4 * w4)) * imq
    dvbx = vby * wz - vbz * wy + g0 * (2 * q1 * q3 - 2 * q2 * q4)
    dvby = vbz * wx - vbx * wz - g0 * (2 * q1 * q2 + 2 * q3 * q4)
    dvbz = (vbx * wy - vby * wx
            - g0 * (2 * q1 * q1 + 2 * q4 * q4 - 1) + thrust)
    dwx = -(Ct * l * (w1 * w1 + w2 * w2 - w3 * w3 - w4 * w4)
            - Iyy * wy * wz + Izz * wy * wz) * iIxx
    dwy = -(Ct * l * (w1 * w1 - w2 * w2 - w3 * w3 + w4 * w4)
            + Ixx * wx * wz - Izz * wx * wz) * iIyy
    dwz = -(Cd * (w1 * w1 - w2 * w2 + w3 * w3 - w4 * w4)
            - Ixx * wx * wy + Iyy * wx * wy) * iIzz
    return [dxq, dyq, dzq, dq1, dq2, dq3, dq4, dvbx, dvby, dvbz,
            dwx, dwy, dwz]


def _jx_entries(p, x, pi=None):
    """Sparse df/dx: {(row, col): (B,) value} — mirrors
    models.quadrotor.dynamics_jacobians."""
    g0 = p[0]
    Ixx, Iyy, Izz = p[2], p[3], p[4]
    _, iIxx, iIyy, iIzz = pi if pi is not None else _pinv(p)
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
        (10, 11): (Iyy - Izz) * wz * iIxx, (10, 12): (Iyy - Izz) * wy * iIxx,
        (11, 10): (Izz - Ixx) * wz * iIyy, (11, 12): (Izz - Ixx) * wx * iIyy,
        (12, 10): (Ixx - Iyy) * wy * iIzz, (12, 11): (Ixx - Iyy) * wx * iIzz,
    }
    return J


def _ju_rows(p, u, pi=None):
    """Sparse df/du rows: {row: [(col, (B,) value), ...]}."""
    Cd, Ct, l = p[5], p[6], p[7]
    w1, w2, w3, w4 = u[0], u[1], u[2], u[3]
    imq, iIxx, iIyy, iIzz = pi if pi is not None else _pinv(p)
    tcm = 2.0 * Ct * imq
    tlx = 2.0 * Ct * l * iIxx
    tly = 2.0 * Ct * l * iIyy
    tdz = 2.0 * Cd * iIzz
    return {
        9: [(0, tcm * w1), (1, tcm * w2), (2, tcm * w3), (3, tcm * w4)],
        10: [(0, -tlx * w1), (1, -tlx * w2), (2, tlx * w3), (3, tlx * w4)],
        11: [(0, -tly * w1), (1, tly * w2), (2, tly * w3), (3, -tly * w4)],
        12: [(0, -tdz * w1), (1, tdz * w2), (2, -tdz * w3), (3, tdz * w4)],
    }


def _jx_mul(J, S):
    """Sparse J (dict) @ dense S (13, m, *batch) -> (13, m, *batch)."""
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


def _jx_dense(J, dtype, bshape):
    """Materialize the sparse Jacobian as (13, 13, *batch)."""
    zero = jnp.zeros(bshape, dtype)
    return jnp.stack([
        jnp.stack([J.get((i, j), zero) + zero for j in range(NX)])
        for i in range(NX)
    ])


def _ju_dense(Ju_rows, dtype, bshape):
    zero = jnp.zeros(bshape, dtype)
    return jnp.stack([
        jnp.stack([dict(Ju_rows.get(i, ())).get(j, zero) + zero
                   for j in range(NU)])
        for i in range(NX)
    ])


def _prep_kernel(ns, vde_order, x_ref, xn_ref, u_ref, yref_ref,
                 qd_ref, rd_ref, lbu_ref, ubu_ref, p_ref,
                 A_out, B_out, c_out, qx_out, ru_out, lb_out, ub_out):
    p = p_ref[:]
    dt = p[8]
    dtype = p.dtype
    bshape = p.shape[1:]        # (B,) or (bs, 128) for the 2D batch tile
    # identity at full rank (Mosaic cannot shape-cast 13x13 -> 13x13x1x1)
    eshape = (NX, NX) + (1,) * len(bshape)
    eye = (jax.lax.broadcasted_iota(jnp.int32, eshape, 0)
           == jax.lax.broadcasted_iota(jnp.int32, eshape, 1)).astype(dtype)
    vde = _vde_stage if vde_order == 4 else _vde_stage_o2

    for j in range(ns):
        x = x_ref[j]          # (13, B)
        u = u_ref[j]          # (4, B)

        # ---- RK4 with the closed-form matrix VDE (sparse Jacobians)
        A, Bm, x_next = vde(p, dt, dtype, bshape, eye, x, u)

        # ---- QP assembly (diagonal LLS cost, cf. rti_step_batched)
        A_out[j] = A
        B_out[j] = Bm
        c_out[j] = x_next - xn_ref[j]
        qx_out[j] = qd_ref[:] * (x - yref_ref[j][:NX])
        ru_out[j] = rd_ref[:] * (u - yref_ref[j][NX:])
        lb_out[j] = lbu_ref[:] - u
        ub_out[j] = ubu_ref[:] - u


def _vde_stage_o2(p, dt, dtype, bshape, eye, x, u):
    """Reduced-order sensitivity variant (opt-in, `vde_order=2`): the
    STATE propagates through the exact ERK4 (x_next and hence the
    defect c are unchanged — the converged trajectory is the same),
    but A/B come from a 2nd-order midpoint expansion

        A ~= I + dt J(x2) + dt^2/2 J(x2)^2
        B ~= dt (G + dt/2 J(x2) G)

    instead of the full matrix VDE — 1 Jacobian evaluation + 2 sparse
    products instead of 4 + 6.  This is an INEXACT-Jacobian Gauss-
    Newton: each tick's QP (and so its control) shifts by the O(dt^3)
    sensitivity truncation; adjudication (throughput / oracle parity /
    flight divergence) in tools/vde_order_sol.py and docs/PERF.md —
    the fixed-cost SoL study named the VDE arithmetic as 56-64% of the
    prep launch, the single largest remaining fixed-cost term."""
    pi = _pinv(p)
    k1 = jnp.stack(_dyn_rows(p, x, u, pi))
    x2 = x + 0.5 * dt * k1
    k2 = jnp.stack(_dyn_rows(p, x2, u, pi))
    x3 = x + 0.5 * dt * k2
    k3 = jnp.stack(_dyn_rows(p, x3, u, pi))
    x4 = x + dt * k3
    k4 = jnp.stack(_dyn_rows(p, x4, u, pi))
    x_next = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    J2 = _jx_entries(p, x2, pi)
    J2d = _jx_dense(J2, dtype, bshape)
    A = eye + dt * J2d + (dt * dt / 2.0) * _jx_mul(J2, J2d)
    G = _ju_dense(_ju_rows(p, u, pi), dtype, bshape)
    Bm = dt * (G + (dt / 2.0) * _jx_mul(J2, G))
    return A, Bm, x_next


def _vde_stage(p, dt, dtype, bshape, eye, x, u):
    """One stage of ERK4 + closed-form matrix VDE (shared by both prep
    kernels).  Returns (A, Bm, x_next)."""
    pi = _pinv(p)     # 4 divides for the whole stage instead of ~44
    k1 = jnp.stack(_dyn_rows(p, x, u, pi))
    J1 = _jx_entries(p, x, pi)
    x2 = x + 0.5 * dt * k1
    k2 = jnp.stack(_dyn_rows(p, x2, u, pi))
    J2 = _jx_entries(p, x2, pi)
    x3 = x + 0.5 * dt * k2
    k3 = jnp.stack(_dyn_rows(p, x3, u, pi))
    J3 = _jx_entries(p, x3, pi)
    x4 = x + dt * k3
    k4 = jnp.stack(_dyn_rows(p, x4, u, pi))
    J4 = _jx_entries(p, x4, pi)

    K1 = _jx_dense(J1, dtype, bshape)
    K2 = _jx_mul(J2, eye + 0.5 * dt * K1)
    K3 = _jx_mul(J3, eye + 0.5 * dt * K2)
    K4 = _jx_mul(J4, eye + dt * K3)
    A = eye + (dt / 6.0) * (K1 + 2 * K2 + 2 * K3 + K4)

    G = _ju_dense(_ju_rows(p, u, pi), dtype, bshape)
    M1 = G
    M2 = G + _jx_mul(J2, 0.5 * dt * M1)
    M3 = G + _jx_mul(J3, 0.5 * dt * M2)
    M4 = G + _jx_mul(J4, dt * M3)
    Bm = (dt / 6.0) * (M1 + 2 * M2 + 2 * M3 + M4)

    x_next = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return A, Bm, x_next


def _prep_c2_kernel(npair, ablate, vde_order, x_ref, xn_ref, u_ref,
                    yref_ref,
                    qd_ref, rd_ref, lbu_ref, ubu_ref, p_ref,
                    Ab_out, Bb_out, cb_out, Qb_out, S1T_out, R00_out,
                    qb_out, rb_out, Ae_out, Be_out, c_out, lb_out, ub_out):
    # `ablate` (frozenset of op-group names) is MEASUREMENT-ONLY (cf.
    # _kkt_c2_kernel): each named group is replaced by a same-shape cheap
    # substitute so tools/fixed_cost_sol.py can price it by deletion.
    # Groups: "vde" (ERK4 + matrix VDE), "cond" (condensed-dynamics
    # products), "cost" (condensed-cost products).
    from crazyflie_nmpc_tpu.ops.pallas.riccati_kernels import (
        _add_diag, _mm, _mtm, _mtv, _mv)

    p = p_ref[:]
    dt = p[8]
    dtype = p.dtype
    bshape = p.shape[1:]
    eshape = (NX, NX) + (1,) * len(bshape)
    eye = (jax.lax.broadcasted_iota(jnp.int32, eshape, 0)
           == jax.lax.broadcasted_iota(jnp.int32, eshape, 1)).astype(dtype)
    qd = qd_ref[:]
    vde = _vde_stage if vde_order == 4 else _vde_stage_o2

    for j in range(npair):
        e, o = 2 * j, 2 * j + 1
        if "vde" in ablate:
            A0 = eye + 0.0 * x_ref[e][None]
            A1 = eye + 0.0 * x_ref[o][None]
            B0 = 0.0 * x_ref[e][:, None] * u_ref[e][None]
            B1 = 0.0 * x_ref[o][:, None] * u_ref[o][None]
            x1p, x2p = x_ref[e], x_ref[o]
        else:
            A0, B0, x1p = vde(p, dt, dtype, bshape, eye,
                              x_ref[e], u_ref[e])
            A1, B1, x2p = vde(p, dt, dtype, bshape, eye,
                              x_ref[o], u_ref[o])
        c0 = x1p - xn_ref[e]
        c1 = x2p - xn_ref[o]
        qx0 = qd * (x_ref[e] - yref_ref[e][:NX])
        qx1 = qd * (x_ref[o] - yref_ref[o][:NX])
        ru0 = rd_ref[:] * (u_ref[e] - yref_ref[e][NX:])
        ru1 = rd_ref[:] * (u_ref[o] - yref_ref[o][NX:])

        # condensed dynamics (cf. condensed_kernels._condense2_kernel)
        if "cond" in ablate:
            Ab_out[j] = A1
            Bb_out[j] = jnp.concatenate([B0, B1], axis=1)
            cb_out[j] = c1
        else:
            Ab_out[j] = _mm(A1, A0, NX, NX, NX)
            Bb_out[j] = jnp.concatenate([_mm(A1, B0, NX, NX, NU), B1],
                                        axis=1)
            cb_out[j] = _mv(A1, c0, NX, NX) + c1

        # condensed cost (diagonal stage cost q — the rti_batched path)
        if "cost" in ablate:
            # substitutes must be cheap SLICES, not transposes — a
            # (13,4,B)->(4,13,B) swapaxes costs a Mosaic relayout that
            # dwarfs the ops being deleted (measured: -75%)
            Qb_out[j] = A0
            S1T_out[j] = A0[:NU]
            R00_out[j] = A0[:NU, :NU]
            qb_out[j] = qx0
            rb_out[j] = jnp.concatenate([ru0, ru1], axis=0)
        else:
            qA = qd[:, None] * A0
            qB = qd[:, None] * B0
            Qb_out[j] = _add_diag(_mtm(A0, qA, NX, NX, NX), qd, NX)
            S1T_out[j] = _mtm(B0, qA, NX, NU, NX)
            R00_out[j] = _mtm(B0, qB, NX, NU, NU)
            h = qd * c0 + qx1
            qb_out[j] = qx0 + _mtv(A0, h, NX, NX)
            rb_out[j] = jnp.concatenate([ru0 + _mtv(B0, h, NX, NU), ru1],
                                        axis=0)

        # expansion data (even stages only) + full-horizon c for the
        # nonlinear-residual report
        Ae_out[j] = A0
        Be_out[j] = B0
        c_out[e] = c0
        c_out[o] = c1
        lb_out[e] = lbu_ref[:] - u_ref[e]
        lb_out[o] = lbu_ref[:] - u_ref[o]
        ub_out[e] = ubu_ref[:] - u_ref[e]
        ub_out[o] = ubu_ref[:] - u_ref[o]


def prep_condense2(x_traj, u_traj, yref, q_diag, r_diag, lbu, ubu, params,
                   block_b: int = 128, pairs_per_step: int = 5,
                   interpret: bool = False,
                   ablate: frozenset = frozenset(),
                   vde_order: int = 4):
    """Fused RTI preparation + block-2 partial condensing: ONE launch from
    (x, u, yref) to the condensed QP data.

    Equivalent to `prep_sweep` followed by `condensed_kernels.condense2`
    (parity-pinned in tests), but the full-horizon A/B Jacobians never
    leave VMEM — only the M = N/2 condensed stages plus the even-stage
    expansion data are written, which removes ~320 MB/step of HBM traffic
    at N=50, B=4096 (the prep->condense write+read round trip).

    Specialized to the uniform diagonal stage cost of the reference OCP
    (generate_c_code.py:62-107), like the rest of the fused serving path.

    Returns (cnd, Ae, Be, c, lb, ub): `cnd` is the condense2 output dict
    (Abar/Bbar/cbar/Qbar/S1T/R00/qbar/rbar, all (M, ..., B)); Ae/Be the
    even-stage Jacobians for interior-state expansion; c the full-horizon
    defect (N, 13, B); lb/ub the per-original-input bounds (N, 4, B).
    """
    N = u_traj.shape[0]
    Btot = u_traj.shape[-1]
    dtype = u_traj.dtype
    if N % 2 != 0:
        raise ValueError("prep_condense2 needs even N")
    M = N // 2
    np_ = pairs_per_step
    while M % np_ != 0:
        np_ -= 1
    if Btot % block_b != 0:
        raise ValueError(f"batch {Btot} must be divisible by {block_b}")
    nb = Btot // block_b
    ngrid = M // np_

    def pair_spec(shape_prefix):    # (M, ...) outputs, np_ rows per step
        def idx(b, n):
            return (n,) + (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec((np_,) + shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def stage_spec(shape_prefix):   # (N, ...) inputs/outputs, 2*np_ rows
        def idx(b, n):
            return (n,) + (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec((2 * np_,) + shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def flat(shape_prefix):
        def idx(b, n):
            return (0,) * len(shape_prefix) + (b,)
        return pl.BlockSpec(shape_prefix + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    in_specs = [
        stage_spec((NX,)),      # x_k
        stage_spec((NX,)),      # x_{k+1}
        stage_spec((NU,)),      # u_k
        stage_spec((NY,)),      # yref_k
        flat((NX,)),            # q_diag
        flat((NU,)),            # r_diag
        flat((NU,)),            # lbu
        flat((NU,)),            # ubu
        flat((NPARAM,)),        # params
    ]
    NUC = 2 * NU
    out_shape = (
        jax.ShapeDtypeStruct((M, NX, NX, Btot), dtype),   # Abar
        jax.ShapeDtypeStruct((M, NX, NUC, Btot), dtype),  # Bbar
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),       # cbar
        jax.ShapeDtypeStruct((M, NX, NX, Btot), dtype),   # Qbar
        jax.ShapeDtypeStruct((M, NU, NX, Btot), dtype),   # S1T
        jax.ShapeDtypeStruct((M, NU, NU, Btot), dtype),   # R00
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),       # qbar
        jax.ShapeDtypeStruct((M, NUC, Btot), dtype),      # rbar
        jax.ShapeDtypeStruct((M, NX, NX, Btot), dtype),   # A even
        jax.ShapeDtypeStruct((M, NX, NU, Btot), dtype),   # B even
        jax.ShapeDtypeStruct((N, NX, Btot), dtype),       # c (full)
        jax.ShapeDtypeStruct((N, NU, Btot), dtype),       # lb
        jax.ShapeDtypeStruct((N, NU, Btot), dtype),       # ub
    )
    out_specs = (pair_spec((NX, NX)), pair_spec((NX, NUC)),
                 pair_spec((NX,)), pair_spec((NX, NX)),
                 pair_spec((NU, NX)), pair_spec((NU, NU)),
                 pair_spec((NX,)), pair_spec((NUC,)),
                 pair_spec((NX, NX)), pair_spec((NX, NU)),
                 stage_spec((NX,)), stage_spec((NU,)), stage_spec((NU,)))
    outs = pl.pallas_call(
        _ft.partial(_prep_c2_kernel, np_, ablate, vde_order),
        grid=(nb, ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x_traj[:-1], x_traj[1:], u_traj, yref, q_diag, r_diag, lbu, ubu,
      params)
    cnd = dict(Abar=outs[0], Bbar=outs[1], cbar=outs[2], Qbar=outs[3],
               S1T=outs[4], R00=outs[5], qbar=outs[6], rbar=outs[7])
    return cnd, outs[8], outs[9], outs[10], outs[11], outs[12]


def prep_sweep(x_traj, u_traj, yref, q_diag, r_diag, lbu, ubu, params,
               block_b: int = 128, stages_per_step: int = 5,
               interpret: bool = False, batch_rows: int | None = None,
               vde_order: int = 4):
    """Fused preparation launch.

    Args (batch-last):
      x_traj (N+1, 13, B), u_traj (N, 4, B), yref (N, 17, B),
      q_diag/r_diag/lbu/ubu as (13, B)/(4, B) tiles,
      params (9, B): [g0, mq, Ixx, Iyy, Izz, Cd, Ct, l, dt] (dt rides
      the tile because the horizon length is a traced spec leaf).
    Returns the per-stage QP arrays (A, B, c, qx, ru, lb, ub), batch-last.
    The (13, B)-sized terminal gradient and dx0 are one XLA op each and
    stay with the caller.

    batch_rows (bs): process the batch as (bs, 128) 2D tiles instead of
    (block_b,) lane rows — the hypothesis being that the per-channel
    (B,)-shaped arithmetic is sublane-starved at 1/8 tile occupancy.
    MEASURED NEGATIVE on v5e (docs/PERF.md): bs=8/16 is within ±2% of
    the 1D layout both standalone and in the full RTI step — Mosaic's
    lowering of the 1D lane ops is not the bottleneck.  Kept (with an
    interpret-mode parity test) as the recorded ablation; default 1.
    The HBM layout of every input/output is unchanged (pure reshape:
    the batch axis is contiguous), so downstream kernels are unaffected
    either way.
    """
    N = u_traj.shape[0]
    Btot = u_traj.shape[-1]
    dtype = u_traj.dtype
    ns = stages_per_step
    if N % ns != 0:
        raise ValueError(f"N={N} must be divisible by {ns}")
    if batch_rows is None:
        batch_rows = 1
    if batch_rows > 1:
        return _prep_sweep_2d(x_traj, u_traj, yref, q_diag, r_diag, lbu,
                              ubu, params, batch_rows, min(ns, 2),
                              interpret, vde_order)
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
        _ft.partial(_prep_kernel, ns, vde_order),
        grid=(nb, ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x_traj[:-1], x_traj[1:], u_traj, yref, q_diag, r_diag, lbu, ubu,
      params)


def _prep_sweep_2d(x_traj, u_traj, yref, q_diag, r_diag, lbu, ubu, params,
                   bs: int, ns: int, interpret: bool,
                   vde_order: int = 4):
    """2D-batch-tile variant: identical kernel body, batch as (bs, 128).

    All HBM arrays keep their 1D-batch shapes at the boundary — the batch
    axis is contiguous, so the (…, B) <-> (…, B/128, 128) reshapes are
    free (no data movement; XLA folds them into the layout).
    """
    N = u_traj.shape[0]
    Btot = u_traj.shape[-1]
    dtype = u_traj.dtype
    lanes = bs * 128
    if Btot % lanes != 0:
        raise ValueError(f"batch {Btot} must be divisible by {lanes} "
                         f"(batch_rows={bs})")
    while N % ns != 0:
        ns -= 1
    nb = Btot // lanes
    ngrid = N // ns
    b2 = lambda z: z.reshape(z.shape[:-1] + (Btot // 128, 128))

    def spec(shape_prefix):
        def idx(b, n):
            return (n,) + (0,) * len(shape_prefix) + (b, 0)
        return pl.BlockSpec((ns,) + shape_prefix + (bs, 128), idx,
                            memory_space=pltpu.VMEM)

    def flat(shape_prefix):
        def idx(b, n):
            return (0,) * len(shape_prefix) + (b, 0)
        return pl.BlockSpec(shape_prefix + (bs, 128), idx,
                            memory_space=pltpu.VMEM)

    in_specs = [
        spec((NX,)), spec((NX,)), spec((NU,)), spec((NY,)),
        flat((NX,)), flat((NU,)), flat((NU,)), flat((NU,)),
        flat((NPARAM,)),
    ]
    B2 = Btot // 128
    out_shape = (
        jax.ShapeDtypeStruct((N, NX, NX, B2, 128), dtype),
        jax.ShapeDtypeStruct((N, NX, NU, B2, 128), dtype),
        jax.ShapeDtypeStruct((N, NX, B2, 128), dtype),
        jax.ShapeDtypeStruct((N, NX, B2, 128), dtype),
        jax.ShapeDtypeStruct((N, NU, B2, 128), dtype),
        jax.ShapeDtypeStruct((N, NU, B2, 128), dtype),
        jax.ShapeDtypeStruct((N, NU, B2, 128), dtype),
    )
    out_specs = (spec((NX, NX)), spec((NX, NU)), spec((NX,)), spec((NX,)),
                 spec((NU,)), spec((NU,)), spec((NU,)))
    outs = pl.pallas_call(
        _ft.partial(_prep_kernel, ns, vde_order),
        grid=(nb, ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(b2(x_traj[:-1]), b2(x_traj[1:]), b2(u_traj), b2(yref), b2(q_diag),
      b2(r_diag), b2(lbu), b2(ubu), b2(params))
    return tuple(o.reshape(o.shape[:-2] + (Btot,)) for o in outs)
