"""PID waypoint controller — the reference's non-NMPC fallback path.

Functional re-design of crazyflie_controller/src/pid.hpp:47-70 (PID with
clamped integrator and clamped output) and src/controller.cpp:135-213 (the
4-axis waypoint controller with its Idle/TakingOff/Automatic/Landing state
machine at 50 Hz).  Default gains are the reference's config/crazyflie2.yaml.

The error convention follows the reference: the goal pose is expressed in
the *body* frame (tf transform into the drone frame, controller.cpp:174-193)
and each PID drives value 0 toward that body-frame target coordinate.
Outputs are the cmd_vel contract (pitch/roll tilt commands, thrust PWM, yaw
rate).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.models import rotations

IDLE, AUTOMATIC, TAKING_OFF, LANDING = 0, 1, 2, 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PIDGains:
    """Per-axis gains/limits (pid.hpp ctor args).  Arrays of shape (4,) for
    the (x, y, z, yaw) axes; defaults = config/crazyflie2.yaml."""

    kp: Any
    kd: Any
    ki: Any
    min_output: Any
    max_output: Any
    integrator_min: Any
    integrator_max: Any


def default_gains(dtype=jnp.float32) -> PIDGains:
    a = lambda *v: jnp.asarray(v, dtype)
    return PIDGains(
        kp=a(40.0, -40.0, 5000.0, -200.0),
        kd=a(20.0, -20.0, 6000.0, -20.0),
        ki=a(2.0, -2.0, 3500.0, 0.0),
        min_output=a(-10.0, -10.0, 10000.0, -200.0),
        max_output=a(10.0, 10.0, 60000.0, 200.0),
        integrator_min=a(-0.1, -0.1, -1000.0, 0.0),
        integrator_max=a(0.1, 0.1, 1000.0, 0.0),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PIDState:
    """Carried controller state (integrators, previous errors, mode)."""

    integral: Any        # (4,)
    prev_error: Any      # (4,)
    mode: Any            # int32 state-machine mode
    thrust: Any          # takeoff thrust ramp value
    start_z: Any         # ground altitude captured at takeoff request


def init_pid(dtype=jnp.float32) -> PIDState:
    z4 = jnp.zeros((4,), dtype)
    return PIDState(integral=z4, prev_error=z4,
                    mode=jnp.int32(IDLE),
                    thrust=jnp.zeros((), dtype),
                    start_z=jnp.zeros((), dtype))


class PIDCommand(NamedTuple):
    pitch: Any      # linear.x
    roll: Any       # linear.y
    thrust: Any     # linear.z (PWM)
    yawrate: Any    # angular.z


def pid_update(gains: PIDGains, integral, prev_error, error, dt):
    """Vector PID update over the 4 axes (pid.hpp:47-70 semantics:
    trapezoid-free integral with clamping, derivative on error, clamped
    output)."""
    integral = jnp.clip(integral + error * dt,
                        gains.integrator_min, gains.integrator_max)
    d = jnp.where(dt > 0, (error - prev_error) / jnp.maximum(dt, 1e-9), 0.0)
    out = gains.kp * error + gains.kd * d + gains.ki * integral
    out = jnp.clip(out, gains.min_output, gains.max_output)
    return integral, error, out


def body_frame_goal(x: jax.Array, goal_pos: jax.Array, goal_yaw):
    """Goal position/yaw expressed in the drone body frame (the tf
    transformPose in controller.cpp:180-193)."""
    q = x[3:7]
    rel = goal_pos - x[0:3]
    rel_body = rotations.rotate_earth_to_body(q, rel)
    yaw_err = goal_yaw - rotations.quat_to_euler(q)[2]
    # wrap to [-pi, pi]
    yaw_err = jnp.arctan2(jnp.sin(yaw_err), jnp.cos(yaw_err))
    return rel_body, yaw_err


def takeoff(state: PIDState, current_z) -> PIDState:
    """Latch TakingOff mode (the takeoff service, controller.cpp:100-111)."""
    return dataclasses.replace(state, mode=jnp.int32(TAKING_OFF),
                               start_z=jnp.asarray(current_z,
                                                   state.thrust.dtype))


def land(state: PIDState) -> PIDState:
    return dataclasses.replace(state, mode=jnp.int32(LANDING))


def pid_step(gains: PIDGains, state: PIDState, x: jax.Array,
             goal_pos: jax.Array, goal_yaw, dt):
    """One 50 Hz controller tick.  Returns (new_state, PIDCommand).

    Mirrors controller.cpp:135-213: TakingOff ramps thrust 10000/s until
    z > start_z + 0.05 (or 50000), then seeds the Z integrator with
    thrust/ki and switches to Automatic; Landing drives the goal to
    start_z + 0.05 and idles on touchdown; Automatic runs the 4 PIDs on the
    body-frame goal error.
    """
    dtype = state.thrust.dtype
    rel_body, yaw_err = body_frame_goal(x, goal_pos, goal_yaw)
    z = x[2]

    # ---- Automatic / Landing shared control law
    goal_pos_landing = rel_body.at[2].add(state.start_z + 0.05 - goal_pos[2])
    is_landing = state.mode == LANDING
    err = jnp.concatenate([
        jnp.where(is_landing, goal_pos_landing, rel_body),
        jnp.where(is_landing, jnp.zeros((), dtype), yaw_err)[None],
    ])
    integral, prev_error, out = pid_update(
        gains, state.integral, state.prev_error, err, dt)
    auto_cmd = PIDCommand(pitch=out[0], roll=out[1], thrust=out[2],
                          yawrate=out[3])

    # ---- TakingOff ramp
    new_thrust = state.thrust + 10000.0 * dt
    took_off = (z > state.start_z + 0.05) | (new_thrust > 50000.0)
    ramp_cmd = PIDCommand(pitch=jnp.zeros((), dtype),
                          roll=jnp.zeros((), dtype),
                          thrust=new_thrust,
                          yawrate=jnp.zeros((), dtype))

    # ---- Landing touchdown -> Idle
    landed = is_landing & (z <= state.start_z + 0.05)

    mode = state.mode
    mode = jnp.where((mode == TAKING_OFF) & took_off, AUTOMATIC, mode)
    mode = jnp.where(landed, IDLE, mode)

    in_auto = (mode == AUTOMATIC) | (mode == LANDING)
    in_ramp = mode == TAKING_OFF

    # takeoff->automatic transition seeds the Z integrator (thrust/ki) and
    # resets the others (controller.cpp:143-150)
    seed = (state.mode == TAKING_OFF) & took_off
    ki_z = gains.ki[2]
    seeded_integral = jnp.zeros((4,), dtype).at[2].set(
        state.thrust / jnp.where(ki_z != 0, ki_z, 1.0))
    integral = jnp.where(seed, seeded_integral, integral)
    prev_error = jnp.where(seed, jnp.zeros((4,), dtype), prev_error)

    zero = jnp.zeros((), dtype)
    cmd = PIDCommand(
        pitch=jnp.where(in_auto, auto_cmd.pitch, zero),
        roll=jnp.where(in_auto, auto_cmd.roll, zero),
        thrust=jnp.where(in_auto, auto_cmd.thrust,
                         jnp.where(in_ramp, ramp_cmd.thrust, zero)),
        yawrate=jnp.where(in_auto, auto_cmd.yawrate, zero),
    )

    new_state = PIDState(
        integral=jnp.where(in_auto, integral, state.integral),
        prev_error=jnp.where(in_auto, prev_error, state.prev_error),
        mode=mode,
        thrust=jnp.where(in_ramp & ~took_off, new_thrust, zero),
        start_z=state.start_z,
    )
    return new_state, cmd
