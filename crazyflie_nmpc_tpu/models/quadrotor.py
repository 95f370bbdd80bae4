"""Quaternion quadrotor dynamics for the Crazyflie 2.1 — TPU-native (JAX).

13 states: inertial position (xq, yq, zq), unit quaternion (qw, qx, qy, qz),
body-frame linear velocity (vbx, vby, vbz), body angular rates (wx, wy, wz).
4 controls: individual propeller speeds w1..w4 in kRPM.

Behavioral parity with the reference CasADi model
(crazyflie_controller/scripts/crazyflie_full_model/export_ode_model.py:29-122):
same state/control ordering, same physical constants, same equations of motion
(kinematics via the body->earth rotation, quaternion kinematics, Newton-Euler
in the body frame with X-configuration rotor mixing).

Design notes (TPU-first):
  * `QuadrotorParams` is a registered pytree dataclass, so every parameter can
    itself carry a batch dimension — Monte-Carlo over mass/drag is a `vmap`
    over params, no code change.
  * `dynamics(params, x, u)` is written as pure column algebra on the last
    axis: under `vmap` each "scalar" becomes a (B,)-lane vector, which maps
    straight onto the VPU's 8x128 lanes with batch as the minor dimension.
  * No data-dependent control flow; fully jit/scan/vmap-composable.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# State vector layout (indices into the 13-vector), mirrors the reference's
# systemStates enum (crazyflie_controller/src/acados_mpc.cpp:117-131).
XQ, YQ, ZQ = 0, 1, 2
QW, QX, QY, QZ = 3, 4, 5, 6
VBX, VBY, VBZ = 7, 8, 9
WX, WY, WZ = 10, 11, 12

NX = 13  # number of states
NU = 4   # number of controls
NY = NX + NU   # stage reference/measurement dim
NYN = NX       # terminal reference dim

STATE_NAMES = (
    "xq", "yq", "zq", "qw", "qx", "qy", "qz",
    "vbx", "vby", "vbz", "wx", "wy", "wz",
)
CONTROL_NAMES = ("w1", "w2", "w3", "w4")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuadrotorParams:
    """Physical parameters of the Crazyflie 2.1 (with one mocap marker).

    Defaults are the reference's identified constants
    (export_ode_model.py:33-42).  All fields are pytree leaves: pass arrays of
    shape (B,) to batch the model over perturbed physical parameters.
    """

    g0: Any = 9.8066      # [m/s^2] gravity
    mq: Any = 33e-3       # [kg] total mass
    Ixx: Any = 1.395e-5   # [kg m^2]
    Iyy: Any = 1.395e-5   # [kg m^2]
    Izz: Any = 2.173e-5   # [kg m^2]
    Cd: Any = 7.9379e-6   # [N/kRPM^2] drag (yaw) coefficient
    Ct: Any = 3.25e-4     # [N/kRPM^2] thrust coefficient
    l: Any = 32.5e-3      # [m] arm length (motor center to rotation axis)

    def hover_speed(self):
        """Steady-state propeller speed [kRPM]: sqrt(m g / 4 Ct) ~= 15.7777.

        Matches `hov_w` in generate_c_code.py:58.
        """
        return jnp.sqrt((self.mq * self.g0) / (4.0 * self.Ct))


# Input bound used by the reference OCP (generate_c_code.py:59,133-134).
W_MAX_KRPM = 22.0
W_MIN_KRPM = 0.0


def dynamics(params: QuadrotorParams, x: jax.Array, u: jax.Array) -> jax.Array:
    """Continuous-time dynamics xdot = f(x, u).

    Vector-form restatement of the reference's explicit ODE
    (export_ode_model.py:85-97):
      pos_dot  = R(q) v_b                      (body->earth rotation)
      q_dot    = 1/2 q (x) [0, w]              (quaternion kinematics)
      v_b_dot  = v_b x w + R(q)^T (-g e3) + (0,0, Ct |u|^2 / m)
      w_dot    = J^{-1} (tau(u) - w x J w)     (X-config rotor mixing)

    Shapes: x (..., 13), u (..., 4) -> (..., 13). Any leading batch axes
    broadcast against batched params.
    """
    q1, q2, q3, q4 = x[..., QW], x[..., QX], x[..., QY], x[..., QZ]
    vbx, vby, vbz = x[..., VBX], x[..., VBY], x[..., VBZ]
    wx, wy, wz = x[..., WX], x[..., WY], x[..., WZ]
    w1, w2, w3, w4 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]

    g0, mq = params.g0, params.mq
    Ixx, Iyy, Izz = params.Ixx, params.Iyy, params.Izz
    Ct, Cd, l = params.Ct, params.Cd, params.l

    # Rows of the body->earth rotation matrix R(q) (unit-quaternion form).
    dxq = (vbx * (2 * q1**2 + 2 * q2**2 - 1)
           - vby * (2 * q1 * q4 - 2 * q2 * q3)
           + vbz * (2 * q1 * q3 + 2 * q2 * q4))
    dyq = (vby * (2 * q1**2 + 2 * q3**2 - 1)
           + vbx * (2 * q1 * q4 + 2 * q2 * q3)
           - vbz * (2 * q1 * q2 - 2 * q3 * q4))
    dzq = (vbz * (2 * q1**2 + 2 * q4**2 - 1)
           - vbx * (2 * q1 * q3 - 2 * q2 * q4)
           + vby * (2 * q1 * q2 + 2 * q3 * q4))

    # Quaternion kinematics qdot = 1/2 * q (x) (0, w).
    dq1 = -(q2 * wx) / 2 - (q3 * wy) / 2 - (q4 * wz) / 2
    dq2 = (q1 * wx) / 2 - (q4 * wy) / 2 + (q3 * wz) / 2
    dq3 = (q4 * wx) / 2 + (q1 * wy) / 2 - (q2 * wz) / 2
    dq4 = (q2 * wy) / 2 - (q3 * wx) / 2 + (q1 * wz) / 2

    # Body-frame translational dynamics (Coriolis + gravity + total thrust).
    thrust_acc = (Ct * (w1**2 + w2**2 + w3**2 + w4**2)) / mq
    dvbx = vby * wz - vbz * wy + g0 * (2 * q1 * q3 - 2 * q2 * q4)
    dvby = vbz * wx - vbx * wz - g0 * (2 * q1 * q2 + 2 * q3 * q4)
    dvbz = (vbx * wy - vby * wx
            - g0 * (2 * q1**2 + 2 * q4**2 - 1) + thrust_acc)

    # Euler rotational dynamics with X-configuration rotor torque mixing.
    dwx = -(Ct * l * (w1**2 + w2**2 - w3**2 - w4**2)
            - Iyy * wy * wz + Izz * wy * wz) / Ixx
    dwy = -(Ct * l * (w1**2 - w2**2 - w3**2 + w4**2)
            + Ixx * wx * wz - Izz * wx * wz) / Iyy
    dwz = -(Cd * (w1**2 - w2**2 + w3**2 - w4**2)
            - Ixx * wx * wy + Iyy * wx * wy) / Izz

    return jnp.stack(
        [dxq, dyq, dzq, dq1, dq2, dq3, dq4, dvbx, dvby, dvbz, dwx, dwy, dwz],
        axis=-1,
    )


def hover_state(params: QuadrotorParams, pos=(0.0, 0.0, 0.0), dtype=None):
    """Equilibrium state: identity attitude, zero velocity, at `pos`."""
    dtype = dtype or jnp.zeros(0).dtype
    x = jnp.zeros(NX, dtype=dtype)
    x = x.at[XQ].set(pos[0]).at[YQ].set(pos[1]).at[ZQ].set(pos[2])
    return x.at[QW].set(1.0)


def hover_control(params: QuadrotorParams, dtype=None):
    """Equilibrium control: all four rotors at hover speed [kRPM]."""
    dtype = dtype or jnp.zeros(0).dtype
    return jnp.full((NU,), params.hover_speed(), dtype=dtype)


def dynamics_jacobians(params: QuadrotorParams, x: jax.Array,
                       u: jax.Array):
    """Analytic Jacobians Jx = df/dx (..., 13, 13), Ju = df/du (..., 13, 4).

    Hand-derived from `dynamics` (the reference ODE, export_ode_model.py:
    85-97) so the RTI preparation phase can propagate sensitivities with
    dense matrix chain rules instead of 17 jacfwd tangent passes — the
    same closed-form-VDE move the CasADi-generated `forw_vde` makes.
    Verified against `jax.jacfwd(dynamics)` in tests/test_dynamics.py.
    """
    q1, q2, q3, q4 = x[..., QW], x[..., QX], x[..., QY], x[..., QZ]
    vbx, vby, vbz = x[..., VBX], x[..., VBY], x[..., VBZ]
    wx, wy, wz = x[..., WX], x[..., WY], x[..., WZ]
    w1, w2, w3, w4 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]

    g0, mq = params.g0, params.mq
    Ixx, Iyy, Izz = params.Ixx, params.Iyy, params.Izz
    Ct, Cd, l = params.Ct, params.Cd, params.l

    z = jnp.zeros_like(q1)
    h = 0.5 * jnp.ones_like(q1)

    def row(cols):
        """cols: dict {state_index: (B,) expr} -> (..., 13)."""
        return jnp.stack([cols.get(i, z) for i in range(NX)], axis=-1)

    Jx = jnp.stack([
        # dxq
        row({QW: 4 * q1 * vbx - 2 * q4 * vby + 2 * q3 * vbz,
             QX: 4 * q2 * vbx + 2 * q3 * vby + 2 * q4 * vbz,
             QY: 2 * q2 * vby + 2 * q1 * vbz,
             QZ: -2 * q1 * vby + 2 * q2 * vbz,
             VBX: 2 * q1 ** 2 + 2 * q2 ** 2 - 1,
             VBY: -(2 * q1 * q4 - 2 * q2 * q3),
             VBZ: 2 * q1 * q3 + 2 * q2 * q4}),
        # dyq
        row({QW: 4 * q1 * vby + 2 * q4 * vbx - 2 * q2 * vbz,
             QX: 2 * q3 * vbx - 2 * q1 * vbz,
             QY: 4 * q3 * vby + 2 * q2 * vbx + 2 * q4 * vbz,
             QZ: 2 * q1 * vbx + 2 * q3 * vbz,
             VBX: 2 * q1 * q4 + 2 * q2 * q3,
             VBY: 2 * q1 ** 2 + 2 * q3 ** 2 - 1,
             VBZ: -(2 * q1 * q2 - 2 * q3 * q4)}),
        # dzq
        row({QW: 4 * q1 * vbz - 2 * q3 * vbx + 2 * q2 * vby,
             QX: 2 * q4 * vbx + 2 * q1 * vby,
             QY: -2 * q1 * vbx + 2 * q4 * vby,
             QZ: 4 * q4 * vbz + 2 * q2 * vbx + 2 * q3 * vby,
             VBX: -(2 * q1 * q3 - 2 * q2 * q4),
             VBY: 2 * q1 * q2 + 2 * q3 * q4,
             VBZ: 2 * q1 ** 2 + 2 * q4 ** 2 - 1}),
        # dq1..dq4 (quaternion kinematics, linear in q and w)
        row({QX: -wx * h, QY: -wy * h, QZ: -wz * h,
             WX: -q2 * h, WY: -q3 * h, WZ: -q4 * h}),
        row({QW: wx * h, QY: wz * h, QZ: -wy * h,
             WX: q1 * h, WY: -q4 * h, WZ: q3 * h}),
        row({QW: wy * h, QX: -wz * h, QZ: wx * h,
             WX: q4 * h, WY: q1 * h, WZ: -q2 * h}),
        row({QW: wz * h, QX: wy * h, QY: -wx * h,
             WX: -q3 * h, WY: q2 * h, WZ: q1 * h}),
        # dvbx/dvby/dvbz (Coriolis + gravity tilt + thrust)
        row({QW: 2 * g0 * q3, QX: -2 * g0 * q4, QY: 2 * g0 * q1,
             QZ: -2 * g0 * q2,
             VBY: wz, VBZ: -wy, WY: -vbz, WZ: vby}),
        row({QW: -2 * g0 * q2, QX: -2 * g0 * q1, QY: -2 * g0 * q4,
             QZ: -2 * g0 * q3,
             VBX: -wz, VBZ: wx, WX: vbz, WZ: -vbx}),
        row({QW: -4 * g0 * q1, QZ: -4 * g0 * q4,
             VBX: wy, VBY: -wx, WX: -vby, WY: vbx}),
        # dwx/dwy/dwz (Euler rotational dynamics)
        row({WY: (Iyy - Izz) * wz / Ixx, WZ: (Iyy - Izz) * wy / Ixx}),
        row({WX: (Izz - Ixx) * wz / Iyy, WZ: (Izz - Ixx) * wx / Iyy}),
        row({WX: (Ixx - Iyy) * wy / Izz, WY: (Ixx - Iyy) * wx / Izz}),
    ], axis=-2)

    def urow(c1, c2, c3, c4):
        return jnp.stack([c1, c2, c3, c4], axis=-1)

    zu = jnp.zeros_like(w1)
    tcm = 2.0 * Ct / mq
    tlx = 2.0 * Ct * l / Ixx
    tly = 2.0 * Ct * l / Iyy
    tdz = 2.0 * Cd / Izz
    Ju = jnp.stack([
        urow(zu, zu, zu, zu), urow(zu, zu, zu, zu), urow(zu, zu, zu, zu),
        urow(zu, zu, zu, zu), urow(zu, zu, zu, zu), urow(zu, zu, zu, zu),
        urow(zu, zu, zu, zu),
        urow(zu, zu, zu, zu), urow(zu, zu, zu, zu),
        urow(tcm * w1, tcm * w2, tcm * w3, tcm * w4),
        urow(-tlx * w1, -tlx * w2, tlx * w3, tlx * w4),
        urow(-tly * w1, tly * w2, tly * w3, -tly * w4),
        urow(-tdz * w1, tdz * w2, -tdz * w3, tdz * w4),
    ], axis=-2)
    return Jx, Ju
