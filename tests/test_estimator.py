"""Estimator pipeline tests: LPF parity, fusion, delay prediction."""

import jax
import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu.estimator import (
    estimate,
    fuse,
    init_estimator,
    init_lpf,
    lpf_step,
    notify_command,
    predict,
)
from crazyflie_nmpc_tpu.models import (
    QuadrotorParams,
    dynamics,
    hover_control,
    hover_state,
    rotations,
)
from crazyflie_nmpc_tpu.ops.integrators import integrate, rollout

DT = 0.015


def reference_lpf_literal(positions, dt):
    """Literal reimplementation of the reference's 5-sample shifting-buffer
    filter (acados_estimator.cpp:356-412) in plain numpy, as ground truth."""
    q_s = [0.0] * 5
    dq_s = [0.0] * 5
    out = []
    elapsed = 0.0
    # the reference seeds the buffers with the first sample via its
    # callbacks; replicate by pre-filling with positions[0]
    q_s = [positions[0]] * 5
    for p in positions:
        q_s = q_s[1:] + [p]
        if elapsed > 1.0:
            dq = (0.3306 * dq_s[4] - 0.02732 * dq_s[3]
                  + 35.7 * q_s[4] - 35.7 * q_s[3])
        else:
            dq = (q_s[4] - q_s[3]) / dt
        dq_s = dq_s[1:] + [dq]
        out.append(dq)
        elapsed += dt
    return np.array(out)


def test_lpf_matches_reference_literal():
    rng = np.random.default_rng(0)
    T = 150  # spans the 1 s warmup boundary
    positions = np.cumsum(0.01 * rng.standard_normal(T))
    state = init_lpf(jnp.asarray(positions[0]))
    ours = []
    for p in positions:
        state, v = lpf_step(state, jnp.asarray(p), DT)
        ours.append(float(v))
    ref = reference_lpf_literal(list(positions), DT)
    np.testing.assert_allclose(np.array(ours), ref, rtol=1e-10, atol=1e-12)


# The reference IIR's DC gain is NOT unity: 35.7*0.015/(1-0.3306+0.02732)
# = 0.7686, i.e. the reference estimator systematically reports ~77% of the
# true steady velocity (coefficients from acados_estimator.cpp:364).  We
# replicate the behavior exactly (parity first); see estimator/lpf.py.
LPF_DC_GAIN = 35.7 * DT / (1.0 - 0.3306 + 0.02732)


def test_lpf_tracks_constant_velocity_with_reference_gain():
    """Steady motion: filter converges to DC_GAIN * true velocity (the
    reference's actual behavior, not unit gain)."""
    v_true = np.array([0.3, -0.2, 0.1])
    state = init_lpf(jnp.zeros(3))
    for k in range(400):  # 6 s
        state, v = lpf_step(state, jnp.asarray(v_true * (k + 1) * DT), DT)
    np.testing.assert_allclose(np.asarray(v), LPF_DC_GAIN * v_true,
                               rtol=1e-3)


def test_fuse_assembles_state():
    params = QuadrotorParams()
    est = init_estimator(params, jnp.zeros(3))
    rpy = jnp.array([0.02, -0.03, 0.1])
    gyro = jnp.array([0.1, 0.2, -0.3])
    pos = jnp.array([1.0, 2.0, 3.0])
    est, x = fuse(est, pos, rpy, gyro, DT)
    np.testing.assert_allclose(np.asarray(x[:3]), np.asarray(pos))
    np.testing.assert_allclose(np.asarray(x[10:]), np.asarray(gyro))
    # attitude roundtrip through the reference conversion pair
    np.testing.assert_allclose(
        np.asarray(rotations.euler_to_quat(rpy)), np.asarray(x[3:7]))
    assert float(x[3]) > 0  # qw >= 0 canonicalization


def test_predict_compensates_delay():
    """Predictor advances the state exactly like the plant under the same
    control (estimator and plant share the ODE)."""
    params = QuadrotorParams()
    x = hover_state(params, pos=(0.1, 0.2, 0.5)) + 0.01
    x = x.at[3:7].set(rotations.quat_normalize(x[3:7]))
    u = hover_control(params) + jnp.array([0.3, -0.2, 0.1, -0.1])
    delay = 0.06
    x_pred = predict(params, x, u, delay, sim_steps=4)
    x_true = integrate(dynamics, params, x, u, delay, num_steps=4)
    np.testing.assert_allclose(np.asarray(x_pred), np.asarray(x_true),
                               rtol=1e-12)


def test_estimator_closed_chain_on_synthetic_flight():
    """Feed the estimator synthetic mocap/attitude/gyro streams from a true
    rollout; after LPF warmup the delayed estimate must match the true state
    `delay` later to first order."""
    params = QuadrotorParams()
    key = jax.random.PRNGKey(1)
    x0 = hover_state(params, pos=(0.0, 0.0, 0.5))
    T = 220
    # torque-balanced thrust perturbations: the open-loop quadrotor is
    # attitude-unstable, so per-motor noise tumbles it within a second and
    # the test would measure divergence, not estimator quality.
    u_traj = (hover_control(params)
              + 0.2 * jax.random.normal(key, (T, 1)))
    u_traj = jnp.broadcast_to(u_traj, (T, 4))
    xs = rollout(dynamics, params, x0, u_traj, DT)

    est = init_estimator(params, xs[0, :3])
    delay_ticks = 4
    delay = delay_ticks * DT
    errs_pose, errs_vel = [], []
    tick = jax.jit(lambda e, xt, u: estimate(
        params, notify_command(e, u), xt[:3],
        rotations.quat_to_euler(xt[3:7]), xt[10:], DT, delay,
        sim_steps=delay_ticks))
    for k in range(T - delay_ticks):
        x_true = xs[k]
        est, x_hat = tick(est, x_true, u_traj[k])
        if k > 80:  # past LPF warmup
            truth = np.asarray(xs[k + delay_ticks])
            pred = np.asarray(x_hat)
            # pose/attitude/rates channels predict tightly
            errs_pose.append(np.max(np.abs(
                np.concatenate([pred[:7] - truth[:7],
                                pred[10:] - truth[10:]]))))
            # velocity carries the reference LPF's 0.7686 DC gain bias
            errs_vel.append(np.max(np.abs(pred[7:10]
                                          - LPF_DC_GAIN * truth[7:10])))
    assert np.median(errs_pose) < 0.02, np.median(errs_pose)
    assert np.median(errs_vel) < 0.05, np.median(errs_vel)
