"""Delay-compensating state estimator: sensor fusion + forward prediction.

The functional re-design of the reference's 66.6 Hz estimator node
(acados_estimator.cpp:521-634 `predictor()`):

  1. position          <- motion capture (eRaptor/vicon/vrpn bridge)
  2. attitude          <- onboard stabilizer Euler angles (deg), converted
                          via euler2quatern with qw >= 0
  3. world velocity    <- IIR low-pass differentiation of mocap position
  4. body velocity     <- R_earth->body(q) * v_world
  5. body rates        <- onboard gyro
  6. delay prediction  <- one ERK integration of length `delay` under the
                          last applied rotor command (the acados sim solver
                          call, :573-593)

Here steps 1-5 are `fuse()` and step 6 is `predict()`; `estimate()` chains
them.  All pure functions over an explicit EstimatorState pytree — the
reference's benignly-racy cross-thread floats (SURVEY.md section 5) become
values threaded through the tick.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.estimator.lpf import (
    VelocityLPFState,
    init_lpf,
    lpf_step,
)
from crazyflie_nmpc_tpu.models import rotations
from crazyflie_nmpc_tpu.models.quadrotor import (
    NU,
    NX,
    QuadrotorParams,
    dynamics,
)
from crazyflie_nmpc_tpu.ops.integrators import integrate


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EstimatorState:
    """Carried estimator state across ticks."""

    lpf: VelocityLPFState
    last_u: Any   # (nu,) last applied rotor command [kRPM] for prediction


def init_estimator(params: QuadrotorParams, p0: jax.Array) -> EstimatorState:
    uss = params.hover_speed().astype(p0.dtype)
    return EstimatorState(lpf=init_lpf(p0), last_u=jnp.full((NU,), uss))


def fuse(state: EstimatorState, mocap_pos: jax.Array,
         euler_rpy: jax.Array, gyro: jax.Array, dt):
    """Assemble the 13-state vector from raw sensor channels.

    Args:
      mocap_pos: (3,) world position [m].
      euler_rpy: (3,) stabilizer roll/pitch/yaw [rad] (the reference receives
        degrees on the wire and converts, acados_estimator.cpp:539-547).
      gyro: (3,) body rates [rad/s].
    Returns (new_state, x (13,)).
    """
    q = rotations.euler_to_quat(euler_rpy)
    new_lpf, v_world = lpf_step(state.lpf, mocap_pos, dt)
    v_body = rotations.rotate_earth_to_body(q, v_world)
    x = jnp.concatenate([mocap_pos, q, v_body, gyro])
    return EstimatorState(lpf=new_lpf, last_u=state.last_u), x


def predict(params: QuadrotorParams, x: jax.Array, u_last: jax.Array,
            delay, sim_steps: int = 1) -> jax.Array:
    """Propagate the fused state forward by the round-trip delay under the
    last applied control — the reference's acados sim solve with
    sim_in_set("T", delay) (acados_estimator.cpp:573-593)."""
    return integrate(dynamics, params, x, u_last, delay, sim_steps)


def estimate(params: QuadrotorParams, state: EstimatorState,
             mocap_pos, euler_rpy, gyro, dt, delay, sim_steps: int = 1):
    """Full estimator tick: fuse + delay-predict.

    Returns (new_state, x_hat (13,)) where x_hat approximates the state at
    t + delay — what the NMPC should solve from.
    """
    state, x = fuse(state, mocap_pos, euler_rpy, gyro, dt)
    x_hat = predict(params, x, state.last_u, delay, sim_steps)
    return state, x_hat


def notify_command(state: EstimatorState, u: jax.Array) -> EstimatorState:
    """Record the rotor command most recently sent to the vehicle (the
    /crazyflie/acados_motvel feedback loop, acados_estimator.cpp:245-258)."""
    return EstimatorState(lpf=state.lpf, last_u=u)
