"""PID waypoint controller tests (reference pid.hpp / controller.cpp parity).

The closed-loop test uses a grounded 1-D thrust plant: the real quadrotor
sits on the floor during the reference's takeoff thrust ramp (10000 PWM/s
from zero, controller.cpp:141-161) — without ground contact the ramp phase
free-falls, which is a property of the reference's design, not a bug here.
Attitude channels are exercised only for sign/convention (the reference's
pitch/roll outputs command the firmware's inner attitude loop, which is not
modelled)."""

import jax
import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu import pid as pidm
from crazyflie_nmpc_tpu.models import QuadrotorParams, dynamics, hover_state
from crazyflie_nmpc_tpu.ops.integrators import rk4_step
from crazyflie_nmpc_tpu.solver.outputs import pwm2krpm

DT = 0.02  # reference PID runs at 50 Hz (controller.cpp:254)


def grounded_step(params, x, krpm, dt):
    """Plant step with a floor at z=0 (no penetration, no pull-down)."""
    u = jnp.full((4,), krpm)
    x_next = rk4_step(dynamics, params, x, u, dt)
    on_ground = (x_next[2] <= 0.0) & (x_next[9] <= 0.0)
    x_next = jnp.where(on_ground,
                       x_next.at[2].set(0.0).at[9].set(0.0), x_next)
    return x_next


def fly(steps=1000, goal=(0.0, 0.0, 0.6)):
    params = QuadrotorParams()
    gains = pidm.default_gains(jnp.float32)
    st = pidm.init_pid()
    x = hover_state(params, pos=(0.0, 0.0, 0.0), dtype=jnp.float32)
    st = pidm.takeoff(st, x[2])
    goal = jnp.asarray(goal, jnp.float32)

    @jax.jit
    def tick(st, x):
        st, cmd = pidm.pid_step(gains, st, x, goal, 0.0, DT)
        krpm = jnp.clip(pwm2krpm(cmd.thrust), 0.0, 22.0)
        return st, grounded_step(params, x, krpm, DT)

    traj, modes = [], []
    for _ in range(steps):
        st, x = tick(st, x)
        traj.append(np.asarray(x))
        modes.append(int(st.mode))
    return st, np.stack(traj), np.array(modes), gains


def test_takeoff_to_automatic_transition():
    st, traj, modes, _ = fly(steps=600)
    assert modes[0] == pidm.TAKING_OFF
    assert pidm.AUTOMATIC in modes
    # transition happens once z clears start_z + 0.05 (or ramp cap)
    k = int(np.argmax(modes == pidm.AUTOMATIC))
    assert traj[k - 1, 2] > 0.04 or traj[k - 1, 2] == 0.0


def test_altitude_regulation():
    """Thrust-only plant: the z channel must climb toward the goal and hold
    near it (coarse: no attitude inner loop is modelled)."""
    st, traj, modes, _ = fly(steps=1500, goal=(0.0, 0.0, 0.6))
    z = traj[:, 2]
    assert z.max() > 0.3           # actually took off
    tail = z[-250:]
    assert 0.2 < tail.mean() < 1.2  # hovers in the goal's neighborhood
    assert np.abs(np.diff(tail)).max() < 0.05  # not oscillating wildly


def test_landing_reaches_ground_and_idles():
    params = QuadrotorParams()
    gains = pidm.default_gains(jnp.float32)
    st = pidm.init_pid()
    x = hover_state(params, pos=(0.0, 0.0, 0.0), dtype=jnp.float32)
    st = pidm.takeoff(st, x[2])
    goal = jnp.array([0.0, 0.0, 0.6], jnp.float32)
    @jax.jit
    def tick(st, x):
        st, cmd = pidm.pid_step(gains, st, x, goal, 0.0, DT)
        krpm = jnp.clip(pwm2krpm(cmd.thrust), 0.0, 22.0)
        return st, grounded_step(params, x, krpm, DT)

    for _ in range(900):
        st, x = tick(st, x)
    st = pidm.land(st)
    assert int(st.mode) == pidm.LANDING
    for _ in range(1500):
        st, cmd = pidm.pid_step(gains, st, x, goal, 0.0, DT)
        x = grounded_step(params, x, jnp.clip(pwm2krpm(cmd.thrust), 0, 22),
                          DT)
        if int(st.mode) == pidm.IDLE:
            break
    assert int(st.mode) == pidm.IDLE
    assert float(x[2]) < 0.1
    # Idle publishes zero command (controller.cpp:207-211)
    st, cmd = pidm.pid_step(gains, st, x, goal, 0.0, DT)
    assert float(cmd.thrust) == 0.0


def test_lateral_error_sign_convention():
    """Goal ahead (+x body) must command positive pitch; goal left (+y)
    must command negative... the reference's Y gains are negative
    (crazyflie2.yaml kp_y=-40), so +y error -> negative roll output."""
    params = QuadrotorParams()
    gains = pidm.default_gains(jnp.float32)
    st = pidm.init_pid()
    st = pidm.PIDState(integral=st.integral, prev_error=st.prev_error,
                       mode=jnp.int32(pidm.AUTOMATIC), thrust=st.thrust,
                       start_z=st.start_z)
    x = hover_state(params, pos=(0.0, 0.0, 0.5), dtype=jnp.float32)
    _, cmd = pidm.pid_step(gains, st, x, jnp.array([1.0, 0.0, 0.5]), 0.0, DT)
    assert float(cmd.pitch) > 0
    _, cmd = pidm.pid_step(gains, st, x, jnp.array([0.0, 1.0, 0.5]), 0.0, DT)
    assert float(cmd.roll) < 0


def test_integrator_clamped():
    gains = pidm.default_gains(jnp.float32)
    integral = jnp.zeros(4)
    prev = jnp.zeros(4)
    for _ in range(100):
        integral, prev, out = pidm.pid_update(
            gains, integral, prev, jnp.array([100.0, 100.0, 100.0, 100.0]),
            DT)
    assert np.all(np.asarray(integral) <= np.asarray(gains.integrator_max))
    assert np.all(np.asarray(out) <= np.asarray(gains.max_output))
    assert np.all(np.asarray(out) >= np.asarray(gains.min_output))
