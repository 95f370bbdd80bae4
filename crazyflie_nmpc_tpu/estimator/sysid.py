"""System-identification tooling — the measurements_vector workflow.

The reference dedicates a node + launch files to streaming raw assembled
state and motor commands for offline model fitting
(crazyflie_controller/src/measurements_vector.cpp — the estimator pipeline
WITHOUT the delay predictor — plus system_identification.launch /
thrust_identification.launch; this is how the krpm2pwm line
(acados_mpc.cpp:423) and the Ct/Cd coefficients were obtained).

Here: `assemble_measurements` runs the same fusion chain over whole logged
arrays in one scan, and the fitting helpers recover the physical constants
from flight logs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.estimator.lpf import init_lpf, lpf_step
from crazyflie_nmpc_tpu.models import rotations
from crazyflie_nmpc_tpu.models.quadrotor import QuadrotorParams


def assemble_measurements(positions, eulers, gyros, dt):
    """Batch meas-vector assembly: logged streams -> (T, 13) state stream.

    Args:
      positions (T, 3) mocap [m]; eulers (T, 3) roll/pitch/yaw [rad];
      gyros (T, 3) body rates [rad/s].
    Same math as measurements_vector.cpp:332-395 (quaternion from Euler,
    LPF world velocity, body-frame rotation) but vectorized in one scan.
    """
    positions = jnp.asarray(positions)
    eulers = jnp.asarray(eulers)
    gyros = jnp.asarray(gyros)

    quats = rotations.euler_to_quat(eulers)

    def step(lpf, p):
        lpf, v = lpf_step(lpf, p, dt)
        return lpf, v

    _, v_world = jax.lax.scan(step, init_lpf(positions[0]), positions)
    v_body = jax.vmap(rotations.rotate_earth_to_body)(quats, v_world)
    return jnp.concatenate([positions, quats, v_body, gyros], axis=1)


def fit_thrust_map(krpm, pwm):
    """Fit pwm = (krpm*1000 - b) / a by least squares.

    Recovers the reference's identified map (a=0.2685, b=4070.3,
    acados_mpc.cpp:421-425) from logged (motor kRPM, PWM) pairs.
    Returns (a, b).
    """
    krpm = np.asarray(krpm, dtype=np.float64)
    pwm = np.asarray(pwm, dtype=np.float64)
    # krpm*1000 = a*pwm + b
    A = np.stack([pwm, np.ones_like(pwm)], axis=1)
    a, b = np.linalg.lstsq(A, krpm * 1000.0, rcond=None)[0]
    return float(a), float(b)


def fit_thrust_coefficient(params: QuadrotorParams, hover_krpm):
    """Ct from observed steady hover speed: Ct = m g / (4 w_ss^2)."""
    w = float(np.mean(np.asarray(hover_krpm)))
    return float(params.mq * params.g0 / (4.0 * w * w))


def fit_drag_coefficient(params: QuadrotorParams, u_traj, wz_dot_traj,
                         wx=0.0, wy=0.0):
    """Cd from yaw-acceleration data: dwz = -Cd (w1^2-w2^2+w3^2-w4^2)/Izz
    (export_ode_model.py:97), least squares over logged samples."""
    u = np.asarray(u_traj, dtype=np.float64)
    mix = u[:, 0] ** 2 - u[:, 1] ** 2 + u[:, 2] ** 2 - u[:, 3] ** 2
    dwz = np.asarray(wz_dot_traj, dtype=np.float64)
    denom = float(np.dot(mix, mix))
    if denom < 1e-12:
        raise ValueError("no yaw-torque excitation in the data")
    return float(-np.dot(mix, dwz) * float(params.Izz) / denom)
