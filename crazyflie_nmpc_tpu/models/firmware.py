"""Onboard attitude-loop plant: the cmd_vel actuation path in software.

The reference NMPC does NOT drive rotors directly — it publishes a
`cmd_vel` attitude command (roll/pitch degrees, yaw rate deg/s, thrust
PWM, acados_mpc.cpp:644-670) that the radio forwards to the Crazyflie
FIRMWARE, whose onboard cascaded attitude/rate controller produces the
per-rotor commands.  That inner loop is why the reference's simple
single-last-command delay predictor is stable on hardware: actuation
mismatch decays through the onboard feedback rather than compounding
through the open-loop-unstable attitude dynamics.

This module models that inner loop so the full reference architecture
closes in software:

    NMPC (rotor-level internal model) -> to_cmd_vel(u1, x4)
      -> [radio delay] -> attitude_plant_step (this module) -> physics

Cascade (firmware-style, continuous gains, run at the plant substep):
    attitude P:  rate_sp_xy = kp_att * (attitude_cmd - attitude)
    yaw rate:    rate_sp_z  = yawrate_cmd
    rate P:      omega_dot_sp = kp_rate * (rate_sp - omega)
    mixer:       exact torque allocation through the model's X-mixing
                 (dynamics' tau rows, quadrotor.py:128-134):
                   s1 = (mt + mx + my + mz)/4 ... with s_i = w_i^2,
                   mx = -Ixx wdot_x / (Ct l), my = -Iyy wdot_y / (Ct l),
                   mz = -Izz wdot_z / Cd,  mt = 4 * pwm2krpm(thrust)^2
    limits:      s_i >= 0, w_i in [0, 22] kRPM (generate_c_code.py:133)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.models import rotations
from crazyflie_nmpc_tpu.models.quadrotor import (
    NU,
    W_MAX_KRPM,
    QuadrotorParams,
    dynamics,
)
from crazyflie_nmpc_tpu.ops.integrators import rk4_step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AttitudeGains:
    """Inner-loop gains [1/s].  Defaults give ~100 ms attitude / ~25 ms
    rate time constants — the regime of the stock firmware cascade."""

    kp_att: Any = 10.0
    kp_rate: Any = 40.0


def mix_cmd_vel(params: QuadrotorParams, gains: AttitudeGains,
                x: jax.Array, cmd: jax.Array) -> jax.Array:
    """One cascade evaluation: (state, cmd_vel) -> rotor speeds [kRPM].

    cmd layout (the wire contract, README.md:104-110):
      cmd[0] = roll [deg], cmd[1] = pitch [deg],
      cmd[2] = yaw rate [deg/s], cmd[3] = thrust [PWM ticks].

    Sign conventions (the wire quirks the reference output path encodes,
    acados_mpc.cpp:660-668): quat_to_euler returns angles NEGATED
    relative to the body-axis angles the rates integrate (for a body-x
    rotation alpha with alpha_dot = wx, phi_eu = -alpha).  The reference
    publishes roll = -phi_eu (= +alpha, body frame) and
    pitch = +theta_eu (= -beta: the firmware's nose-down-positive pitch).
    The cascade therefore tracks alpha_sp = +cmd[0], beta_sp = -cmd[1]
    against the body-axis feedback alpha = -phi_eu, beta = -theta_eu.
    """
    from crazyflie_nmpc_tpu.solver.outputs import pwm2krpm

    eu = rotations.quat_to_euler(x[3:7])
    alpha, beta = -eu[0], -eu[1]     # body-axis angles: d/dt ~ (wx, wy)
    wx, wy, wz = x[10], x[11], x[12]

    rate_sp_x = gains.kp_att * (rotations.deg2rad(cmd[0]) - alpha)
    rate_sp_y = gains.kp_att * (-rotations.deg2rad(cmd[1]) - beta)
    rate_sp_z = rotations.deg2rad(cmd[2])

    wdot_x = gains.kp_rate * (rate_sp_x - wx)
    wdot_y = gains.kp_rate * (rate_sp_y - wy)
    wdot_z = gains.kp_rate * (rate_sp_z - wz)

    Ctl = params.Ct * params.l
    mx = -params.Ixx * wdot_x / Ctl
    my = -params.Iyy * wdot_y / Ctl
    mz = -params.Izz * wdot_z / params.Cd
    base = pwm2krpm(cmd[3])
    mt = 4.0 * base * base

    s1 = (mt + mx + my + mz) / 4.0
    s2 = (mt + mx - my - mz) / 4.0
    s3 = (mt - mx - my + mz) / 4.0
    s4 = (mt - mx + my - mz) / 4.0
    s = jnp.stack([s1, s2, s3, s4])
    w = jnp.sqrt(jnp.maximum(s, 0.0))
    return jnp.clip(w, 0.0, W_MAX_KRPM)


def attitude_plant_step(params: QuadrotorParams, x: jax.Array,
                        cmd: jax.Array, dt, substeps: int = 10,
                        gains: AttitudeGains = AttitudeGains()):
    """Advance the attitude-loop plant one control period under a held
    cmd_vel command.  The inner cascade re-evaluates every RK4 substep
    (substeps=10 at dt=15 ms ~ a 667 Hz inner loop; the firmware runs
    500 Hz).  Returns (x_next, last rotor command [kRPM])."""
    sub_dt = dt / substeps

    def inner(xc, _):
        u = mix_cmd_vel(params, gains, xc, cmd)
        return rk4_step(dynamics, params, xc, u, sub_dt), u

    x_next, us = jax.lax.scan(inner, x, None, length=substeps)
    return x_next, us[-1]
