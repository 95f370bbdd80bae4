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
    rate time constants — the regime of the stock firmware cascade.

    kd_rate/tau_m model the two firmware details the round-2 envelope
    measurement named as missing (tests/test_estimator_fidelity.py):
      kd_rate [s]: rate-loop derivative term — the angular-acceleration
        damping the firmware's rate PID D term provides.  The demanded
        angular acceleration becomes
        kp_rate*(rate_sp - omega) - kd_rate*omega_dot.
      tau_m [s]: first-order motor lag (brushed coreless motors respond
        with tau ~ 10-25 ms); 0.0 = instantaneous rotors (the round-2
        model).  With tau_m > 0 the plant carries the actual rotor
        speeds as persistent state across control ticks
        (`attitude_plant_step` motor state).
    """

    kp_att: Any = 10.0
    kp_rate: Any = 40.0
    kd_rate: Any = 0.0
    tau_m: Any = 0.0


def mix_cmd_vel(params: QuadrotorParams, gains: AttitudeGains,
                x: jax.Array, cmd: jax.Array,
                omega_dot=None) -> jax.Array:
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

    # rate-loop D term: damp the measured angular acceleration (the
    # firmware rate PID's derivative action)
    dwx, dwy, dwz = ((0.0, 0.0, 0.0) if omega_dot is None
                     else (omega_dot[0], omega_dot[1], omega_dot[2]))
    wdot_x = gains.kp_rate * (rate_sp_x - wx) - gains.kd_rate * dwx
    wdot_y = gains.kp_rate * (rate_sp_y - wy) - gains.kd_rate * dwy
    wdot_z = gains.kp_rate * (rate_sp_z - wz) - gains.kd_rate * dwz

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


def init_motor_state(params: QuadrotorParams, x: jax.Array,
                     u0: jax.Array | None = None):
    """Motor-lag plant state: (actual rotor speeds [kRPM], previous body
    rates) — carried across control ticks by `attitude_plant_step`.
    u0 defaults to the hover speed."""
    if u0 is None:
        from crazyflie_nmpc_tpu.models.quadrotor import hover_control
        u0 = hover_control(params, x.dtype)
    return (jnp.broadcast_to(u0, (NU,)).astype(x.dtype), x[10:13])


def attitude_plant_step(params: QuadrotorParams, x: jax.Array,
                        cmd: jax.Array, dt, substeps: int = 10,
                        gains: AttitudeGains = AttitudeGains(),
                        motor=None):
    """Advance the attitude-loop plant one control period under a held
    cmd_vel command.  The inner cascade re-evaluates every RK4 substep
    (substeps=10 at dt=15 ms ~ a 667 Hz inner loop; the firmware runs
    500 Hz).

    motor: optional `init_motor_state` tuple (w_act, omega_prev).  With
    gains.tau_m > 0 the rotors respond first-order toward the mixer
    command (exact exponential update per substep) and the physics sees
    the ACTUAL speeds; omega_prev supplies the rate-D term's
    angular-acceleration estimate.  None initializes both from (hover,
    current rates) — callers that model motor lag must thread the state
    across ticks or the lag resets every period.

    Returns (x_next, last ACTUAL rotor speeds [kRPM], motor')."""
    sub_dt = dt / substeps
    if motor is None:
        motor = init_motor_state(params, x)

    with_lag = _nonzero(gains.tau_m)
    lag = jnp.exp(-sub_dt / gains.tau_m) if with_lag else 0.0

    def inner(carry, _):
        xc, w_act, omega_prev = carry
        omega_dot = (xc[10:13] - omega_prev) / sub_dt
        u_cmd = mix_cmd_vel(params, gains, xc, cmd, omega_dot=omega_dot)
        if with_lag:
            # first-order motor response, integrated exactly over the
            # substep; the physics sees the midpoint of the segment
            w_next = u_cmd + (w_act - u_cmd) * lag
            u_eff = jnp.clip(0.5 * (w_act + w_next), 0.0, W_MAX_KRPM)
        else:
            w_next = u_cmd
            u_eff = u_cmd
        x_next = rk4_step(dynamics, params, xc, u_eff, sub_dt)
        return (x_next, w_next, xc[10:13]), u_eff

    (x_next, w_act, omega_prev), us = jax.lax.scan(
        inner, (x, *motor), None, length=substeps)
    return x_next, us[-1], (w_act, omega_prev)


def _nonzero(v) -> bool:
    """Static check for a trace-free zero default (Python float 0.0)."""
    return not (isinstance(v, (int, float)) and v == 0.0)
