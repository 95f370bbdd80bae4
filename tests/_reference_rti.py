"""Shared-nothing CPU reference RTI — the acados-parity certification oracle.

The BASELINE accuracy target is "<1e-4 control error vs acados RTI at N=50"
(BASELINE.json), but acados itself cannot run here (its submodule is empty
in the reference snapshot).  This module is the independent proxy: a
literal, from-first-principles implementation of one SQP-RTI iteration on
the reference OCP, sharing NO code with `crazyflie_nmpc_tpu`:

  * pure numpy, float64 end to end;
  * the quadrotor ODE rewritten from the physics (same equations of motion
    the reference's CasADi model encodes, export_ode_model.py:85-97);
  * ERK4 discrete-map sensitivities via COMPLEX-STEP differentiation
    (h = 1e-200 -> derivatives exact to machine epsilon, independent of
    both jax.jacfwd and the repo's hand-derived VDE);
  * Gauss-Newton cost blocks assembled from the reference's W/Vx/Vu
    matrices (generate_c_code.py:62-129), built here from literals;
  * the QP solved as ONE DENSE KKT SYSTEM with a textbook primal
    active-set method (Nocedal & Wright Alg. 16.3) — no Riccati, no
    condensing, no interior point, no iteration cap effects.  The solution
    is the exact minimizer of the RTI quadratic subproblem.

A `rti_step_ref` here therefore computes exactly what acados' SQP_RTI
Gauss-Newton step (acados_mpc.cpp:611 `acados_solve()`; partial-condensing
HPIPM backend, generate_c_code.py:140-146) computes for this problem, up
to f64 roundoff: identical linearization point semantics, identical QP.
tests/test_certification.py asserts the production solver's per-solve
u-sequences agree with this oracle to <1e-4 along hover and helix loops.
"""

from __future__ import annotations

import numpy as np

# --- physical constants (export_ode_model.py:33-42, literals, not imports)
G0 = 9.8066
MQ = 33e-3
IXX = 1.395e-5
IYY = 1.395e-5
IZZ = 2.173e-5
CD = 7.9379e-6
CT = 3.25e-4
ARM_L = 32.5e-3

NX, NU = 13, 4
NY = NX + NU

# reference cost diagonals (generate_c_code.py:62-84) and input bounds
# (generate_c_code.py:59,133-136)
Q_DIAG = np.array([120.0, 100.0, 100.0, 1e-3, 1e-3, 1e-3, 1e-3,
                   0.7, 1.0, 4.0, 1e-5, 1e-5, 10.0])
R_DIAG = np.array([0.06, 0.06, 0.06, 0.06])
WN_FACTOR = 50.0
U_MIN, U_MAX = 0.0, 22.0


def hover_speed() -> float:
    """sqrt(m g / 4 Ct) ~= 15.7777 kRPM (generate_c_code.py:58)."""
    return float(np.sqrt(MQ * G0 / (4.0 * CT)))


def ode(x, u):
    """Quaternion quadrotor xdot = f(x, u) — numpy, complex-safe.

    Restates the reference equations of motion (export_ode_model.py:85-97):
    R(q) body->earth kinematics, quaternion kinematics, Newton-Euler with
    X-configuration rotor mixing.  All operations are polynomial so the
    function is analytic in complex arithmetic (complex-step safe).
    Shapes: x (..., 13), u (..., 4) -> (..., 13).
    """
    q1, q2, q3, q4 = x[..., 3], x[..., 4], x[..., 5], x[..., 6]
    vbx, vby, vbz = x[..., 7], x[..., 8], x[..., 9]
    wx, wy, wz = x[..., 10], x[..., 11], x[..., 12]
    w1, w2, w3, w4 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]

    dxq = (vbx * (2 * q1 * q1 + 2 * q2 * q2 - 1)
           - vby * (2 * q1 * q4 - 2 * q2 * q3)
           + vbz * (2 * q1 * q3 + 2 * q2 * q4))
    dyq = (vby * (2 * q1 * q1 + 2 * q3 * q3 - 1)
           + vbx * (2 * q1 * q4 + 2 * q2 * q3)
           - vbz * (2 * q1 * q2 - 2 * q3 * q4))
    dzq = (vbz * (2 * q1 * q1 + 2 * q4 * q4 - 1)
           - vbx * (2 * q1 * q3 - 2 * q2 * q4)
           + vby * (2 * q1 * q2 + 2 * q3 * q4))

    dq1 = -(q2 * wx + q3 * wy + q4 * wz) / 2
    dq2 = (q1 * wx - q4 * wy + q3 * wz) / 2
    dq3 = (q4 * wx + q1 * wy - q2 * wz) / 2
    dq4 = (q2 * wy - q3 * wx + q1 * wz) / 2

    thrust = CT * (w1 * w1 + w2 * w2 + w3 * w3 + w4 * w4) / MQ
    dvbx = vby * wz - vbz * wy + G0 * (2 * q1 * q3 - 2 * q2 * q4)
    dvby = vbz * wx - vbx * wz - G0 * (2 * q1 * q2 + 2 * q3 * q4)
    dvbz = (vbx * wy - vby * wx
            - G0 * (2 * q1 * q1 + 2 * q4 * q4 - 1) + thrust)

    dwx = -(CT * ARM_L * (w1 * w1 + w2 * w2 - w3 * w3 - w4 * w4)
            - IYY * wy * wz + IZZ * wy * wz) / IXX
    dwy = -(CT * ARM_L * (w1 * w1 - w2 * w2 - w3 * w3 + w4 * w4)
            + IXX * wx * wz - IZZ * wx * wz) / IYY
    dwz = -(CD * (w1 * w1 - w2 * w2 + w3 * w3 - w4 * w4)
            - IXX * wx * wy + IYY * wx * wy) / IZZ

    return np.stack([dxq, dyq, dzq, dq1, dq2, dq3, dq4,
                     dvbx, dvby, dvbz, dwx, dwy, dwz], axis=-1)


def rk4(x, u, dt):
    """Classic 4-stage explicit Runge-Kutta step (acados ERK, num_steps=1)."""
    k1 = ode(x, u)
    k2 = ode(x + 0.5 * dt * k1, u)
    k3 = ode(x + 0.5 * dt * k2, u)
    k4 = ode(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def linearize(x_traj, u_traj, dt):
    """Stage linearization of the ERK4 map by complex-step differentiation.

    A[k] = dF/dx, B[k] = dF/du at (x_k, u_k), exact to machine epsilon:
    Im(F(x + i h e_j)) / h with h = 1e-200 has no subtractive cancellation.
    Independent of jax AD and of the repo's closed-form VDE.

    Returns (x_next (N, 13), A (N, 13, 13), B (N, 13, 4)).
    """
    N = u_traj.shape[0]
    xs, us = x_traj[:-1], u_traj
    h = 1e-200
    x_next = rk4(xs, us, dt)

    A = np.empty((N, NX, NX))
    for j in range(NX):
        xj = xs.astype(complex)
        xj[:, j] += 1j * h
        A[:, :, j] = rk4(xj, us.astype(complex), dt).imag / h
    B = np.empty((N, NX, NU))
    for j in range(NU):
        uj = us.astype(complex)
        uj[:, j] += 1j * h
        B[:, :, j] = rk4(xs.astype(complex), uj, dt).imag / h
    return x_next, A, B


def _cost_matrices():
    """W = blkdiag(Q, R), W_e = 50 Q, selector Vx/Vu
    (generate_c_code.py:62-129)."""
    W = np.diag(np.concatenate([Q_DIAG, R_DIAG]))
    Vx = np.zeros((NY, NX))
    Vx[:NX, :] = np.eye(NX)
    Vu = np.zeros((NY, NU))
    Vu[NX:, :] = np.eye(NU)
    W_e = np.diag(WN_FACTOR * Q_DIAG)
    return W, Vx, Vu, W_e


def build_dense_qp(x_traj, u_traj, x0, yref, yref_e, dt):
    """Assemble the RTI quadratic subproblem as ONE dense QP.

    Variables z = [dx_0 .. dx_N, du_0 .. du_{N-1}]  (dim (N+1)nx + N nu).
    Equalities E z = d: the initial-state equality dx_0 = x0 - xbar_0
    (lbx0=ubx0, acados_mpc.cpp:581-582) and the linearized multiple-shooting
    dynamics A_k dx_k + B_k du_k - dx_{k+1} = -(F(xbar_k, ubar_k) -
    xbar_{k+1}).  Bounds lb <= du_k <= ub are the input box shifted by the
    iterate.  Gauss-Newton Hessian/gradient from the LLS cost.

    Returns (H, g, E, d, lb, ub, nz) with bound indices covering the du
    block [ (N+1)nx : ].
    """
    N = u_traj.shape[0]
    x_next, A, B = linearize(x_traj, u_traj, dt)
    W, Vx, Vu, W_e = _cost_matrices()

    Qxx = Vx.T @ W @ Vx
    Ruu = Vu.T @ W @ Vu
    S = Vu.T @ W @ Vx          # (nu, nx)
    y = x_traj[:-1] @ Vx.T + u_traj @ Vu.T
    e = y - yref
    qx = e @ (W @ Vx)          # (N, nx)
    ru = e @ (W @ Vu)          # (N, nu)
    P = W_e                    # Vx_e = I
    p = W_e @ (x_traj[-1] - yref_e)

    nz = (N + 1) * NX + N * NU
    xo = lambda k: k * NX
    uo = lambda k: (N + 1) * NX + k * NU

    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N):
        H[xo(k):xo(k) + NX, xo(k):xo(k) + NX] += Qxx
        H[uo(k):uo(k) + NU, uo(k):uo(k) + NU] += Ruu
        H[xo(k):xo(k) + NX, uo(k):uo(k) + NU] += S.T
        H[uo(k):uo(k) + NU, xo(k):xo(k) + NX] += S
        g[xo(k):xo(k) + NX] = qx[k]
        g[uo(k):uo(k) + NU] = ru[k]
    H[xo(N):xo(N) + NX, xo(N):xo(N) + NX] += P
    g[xo(N):xo(N) + NX] = p

    nE = (N + 1) * NX
    E = np.zeros((nE, nz))
    d = np.zeros(nE)
    E[0:NX, 0:NX] = np.eye(NX)
    d[0:NX] = x0 - x_traj[0]
    for k in range(N):
        r = (k + 1) * NX
        E[r:r + NX, xo(k):xo(k) + NX] = A[k]
        E[r:r + NX, uo(k):uo(k) + NU] = B[k]
        E[r:r + NX, xo(k + 1):xo(k + 1) + NX] = -np.eye(NX)
        d[r:r + NX] = -(x_next[k] - x_traj[k + 1])

    lb = (U_MIN - u_traj).ravel()
    ub = (U_MAX - u_traj).ravel()
    return H, g, E, d, lb, ub, nz


def solve_qp_active_set(H, g, E, d, lb, ub, bound_offset, max_iter=200):
    """Primal active-set method for  min 1/2 z'Hz + g'z  s.t. Ez=d,
    lb <= z[bound_offset:] <= ub  (Nocedal & Wright Alg. 16.3).

    H must be positive definite on the null space of the constraints (true
    for the GN Hessian here: all cost diagonals are strictly positive).
    Returns the exact minimizer (up to f64 linear-algebra roundoff).
    """
    nz = H.shape[0]
    nb = lb.shape[0]

    # feasible start: du = 0 (strictly inside the box along RTI iterates),
    # dx from the linear dynamics rollout with du = 0.
    z = np.zeros(nz)
    # solve E z = d for the dx block given du=0: E's dx-part is block
    # lower-triangular with -I sub-blocks -> forward substitution
    N = nb // NU
    z[0:NX] = d[0:NX]
    for k in range(N):
        r = (k + 1) * NX
        Ak = E[r:r + NX, k * NX:(k + 1) * NX]
        z[(k + 1) * NX:(k + 2) * NX] = Ak @ z[k * NX:(k + 1) * NX] - d[r:r + NX]
    zb = z[bound_offset:]
    if np.any(zb < lb - 1e-12) or np.any(zb > ub - 1e-12):
        # du=0 outside the box (iterate pushed past a bound): clamp and
        # re-roll the states; the active-set loop restores optimality.
        zb2 = np.clip(zb, lb + 0.0, ub - 0.0)
        z[bound_offset:] = zb2
        z[0:NX] = d[0:NX]
        for k in range(N):
            r = (k + 1) * NX
            Ak = E[r:r + NX, k * NX:(k + 1) * NX]
            Bk = E[r:r + NX, bound_offset + k * NU:bound_offset + (k + 1) * NU]
            z[(k + 1) * NX:(k + 2) * NX] = (
                Ak @ z[k * NX:(k + 1) * NX]
                + Bk @ z[bound_offset + k * NU:bound_offset + (k + 1) * NU]
                - d[r:r + NX])

    # working set: list of (bound index i in [0, nb), side +1 lower/-1 upper)
    work: list[tuple[int, int]] = []
    zb = z[bound_offset:]
    for i in range(nb):
        if abs(zb[i] - lb[i]) < 1e-14:
            work.append((i, +1))
        elif abs(zb[i] - ub[i]) < 1e-14:
            work.append((i, -1))

    nE = E.shape[0]
    for _ in range(max_iter):
        # EQP for step p: min 1/2 p'Hp + (g + Hz)'p  s.t. Ep = 0, p_i = 0
        # for active bounds
        na = len(work)
        K = np.zeros((nz + nE + na, nz + nE + na))
        K[:nz, :nz] = H
        K[:nz, nz:nz + nE] = E.T
        K[nz:nz + nE, :nz] = E
        for a, (i, s) in enumerate(work):
            K[bound_offset + i, nz + nE + a] = s   # a_i = s * e_i
            K[nz + nE + a, bound_offset + i] = s
        rhs = np.zeros(nz + nE + na)
        rhs[:nz] = -(g + H @ z)
        sol = np.linalg.solve(K, rhs)
        p = sol[:nz]

        if np.max(np.abs(p)) < 1e-11:
            if na == 0:
                return z
            # KKT form [H C'; C 0][p; m] = [-(g+Hz); 0] gives, at p = 0,
            # grad = -C'm, so the >=-form inequality multiplier is -m.
            lam = -sol[nz + nE:]
            j = int(np.argmin(lam))
            if lam[j] >= -1e-10:
                return z
            work.pop(j)
            continue

        # step to the nearest blocking inactive bound
        alpha = 1.0
        block = None
        pb = p[bound_offset:]
        zb = z[bound_offset:]
        active = {i for i, _ in work}
        for i in range(nb):
            if i in active:
                continue
            if pb[i] < -1e-14:
                a = (lb[i] - zb[i]) / pb[i]
                if a < alpha:
                    alpha, block = a, (i, +1)
            elif pb[i] > 1e-14:
                a = (ub[i] - zb[i]) / pb[i]
                if a < alpha:
                    alpha, block = a, (i, -1)
        z = z + max(alpha, 0.0) * p
        if block is not None:
            work.append(block)
            # pin exactly onto the bound to avoid drift
            i, s = block
            z[bound_offset + i] = lb[i] if s > 0 else ub[i]
        elif alpha >= 1.0 - 1e-15:
            # full step taken with no blocking constraint: re-check
            # stationarity on the next loop pass
            continue
    raise RuntimeError("active-set QP did not converge")


def rti_step_ref(x_traj, u_traj, x0, yref, yref_e, dt):
    """One reference SQP-RTI iteration: linearize at the iterate, solve the
    exact QP, take the full Newton-type step (acados_mpc.cpp:611 semantics).

    Returns (x_traj', u_traj') — the post-step primal iterate, whose rows
    are what the reference extracts as u0/u1/x4 (acados_mpc.cpp:619-625).
    """
    N = u_traj.shape[0]
    H, g, E, d, lb, ub, nz = build_dense_qp(
        x_traj, u_traj, x0, yref, yref_e, dt)
    off = (N + 1) * NX
    z = solve_qp_active_set(H, g, E, d, lb, ub, off)
    dx = z[:off].reshape(N + 1, NX)
    du = z[off:].reshape(N, NU)
    return x_traj + dx, u_traj + du
