"""RTI solver tests: fixed points, SQP convergence vs independent NLP solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crazyflie_nmpc_tpu.models import (
    NU,
    NX,
    QuadrotorParams,
    dynamics,
    hover_control,
    hover_state,
)
from crazyflie_nmpc_tpu.ops import ipm
from crazyflie_nmpc_tpu.ops.integrators import rk4_step, rollout
from crazyflie_nmpc_tpu.solver import (
    default_ocp,
    hover_yref,
    init_rti,
    rti_step,
    sqp_solve,
)
from crazyflie_nmpc_tpu.solver.rti import RTIState

CFG = ipm.IPMConfig(iters=15)


def spec64(N=50):
    return default_ocp(N=N, dtype=jnp.float64)


def test_hover_is_fixed_point():
    """At the hover equilibrium with hover reference, the RTI step is ~zero."""
    spec = spec64()
    x0 = hover_state(spec.params, pos=(0.0, 0.0, 0.5))
    yref, yref_e = hover_yref(spec, pos=(0.0, 0.0, 0.5))
    state = init_rti(spec, x0)
    new_state, out = rti_step(spec, state, x0, yref, yref_e, CFG)
    uss = float(spec.params.hover_speed())
    np.testing.assert_allclose(np.asarray(out.u0), uss, atol=1e-8)
    np.testing.assert_allclose(np.asarray(new_state.x_traj[:, 2]), 0.5,
                               atol=1e-8)


def test_rti_contracts_to_sqp_fixed_point():
    """Repeated RTI steps on a frozen problem converge (KKT -> 0)."""
    spec = spec64(N=20)
    x0 = hover_state(spec.params, pos=(0.1, -0.1, 0.3))
    yref, yref_e = hover_yref(spec, pos=(0.0, 0.0, 0.5))
    state = init_rti(spec, x0)
    _, kkts = sqp_solve(spec, state, x0, yref, yref_e, iters=60, config=CFG)
    kkts = np.asarray(kkts)
    assert kkts[-1] < 1e-10, kkts
    assert kkts[-1] < kkts[0] * 1e-9


def test_sqp_optimal_for_single_shooting_nlp():
    """Independent NLP ground truth: the converged SQP controls must zero
    the gradient of the *single-shooting* objective (plain rollout +
    jax.grad — a completely different computational path than the
    Riccati/IPM multiple-shooting solver), with controls strictly interior
    so no projection is involved."""
    N = 10
    spec = spec64(N=N)
    dt = float(spec.dt)
    params = spec.params
    x0 = hover_state(params, pos=(0.05, -0.05, 0.45))
    yref, yref_e = hover_yref(spec, pos=(0.0, 0.0, 0.5))

    state = init_rti(spec, x0)
    state, kkts = sqp_solve(spec, state, x0, yref, yref_e, iters=30,
                            config=CFG)
    assert float(kkts[-1]) < 1e-10

    q_diag = jnp.diag(spec.cost.W)[:NX]
    r_diag = jnp.diag(spec.cost.W)[NX:]
    qe_diag = jnp.diag(spec.cost.W_e)

    def objective_jax(u):
        xs = rollout(dynamics, params, x0, u, dt)
        stage_x = xs[:-1] - yref[:, :NX]
        stage_u = u - yref[:, NX:]
        term = xs[-1] - yref_e
        return (0.5 * jnp.sum(stage_x**2 * q_diag)
                + 0.5 * jnp.sum(stage_u**2 * r_diag)
                + 0.5 * jnp.sum(term**2 * qe_diag))

    u_sol = state.u_traj
    # strictly interior -> unconstrained stationarity applies
    assert float(u_sol.min()) > 0.5 and float(u_sol.max()) < 21.5
    grad = jax.grad(objective_jax)(u_sol)
    assert float(jnp.max(jnp.abs(grad))) < 1e-8
    # and it's a minimum, not a saddle: random feasible perturbations only
    # increase the objective
    f0 = float(objective_jax(u_sol))
    key = jax.random.PRNGKey(0)
    for i in range(3):
        du = 1e-2 * jax.random.normal(jax.random.fold_in(key, i),
                                      u_sol.shape)
        assert float(objective_jax(u_sol + du)) > f0


def test_rti_feedback_outputs():
    """u0/u1/x4 extraction matches the carried plan (acados_mpc.cpp:619-625)."""
    spec = spec64(N=10)
    x0 = hover_state(spec.params, pos=(0.0, 0.1, 0.4))
    yref, yref_e = hover_yref(spec)
    state = init_rti(spec, x0)
    new_state, out = rti_step(spec, state, x0, yref, yref_e, CFG)
    np.testing.assert_array_equal(np.asarray(out.u0),
                                  np.asarray(new_state.u_traj[0]))
    np.testing.assert_array_equal(np.asarray(out.u1),
                                  np.asarray(new_state.u_traj[1]))
    np.testing.assert_array_equal(np.asarray(out.x_at(4)),
                                  np.asarray(new_state.x_traj[4]))


def test_controls_respect_bounds():
    """Aggressive setpoint change -> controls saturate but stay in [0, 22]."""
    spec = spec64(N=20)
    x0 = hover_state(spec.params, pos=(0.0, 0.0, 0.0))
    yref, yref_e = hover_yref(spec, pos=(0.0, 0.0, 2.0))  # 2 m climb
    state = init_rti(spec, x0)
    step = jax.jit(lambda s: rti_step(spec, s, x0, yref, yref_e, CFG))
    for _ in range(3):
        state, out = step(state)
    u = np.asarray(state.u_traj)
    assert u.min() >= -1e-9
    assert u.max() <= 22.0 + 1e-9
    # the step demand should actually hit the upper bound
    assert u.max() > 21.0


def test_rti_jit_and_vmap():
    spec = spec64(N=10)
    yref, yref_e = hover_yref(spec)
    step = jax.jit(lambda s, x: rti_step(spec, s, x, yref, yref_e, CFG))

    B = 4
    key = jax.random.PRNGKey(0)
    x0s = jnp.stack([
        hover_state(spec.params) + 0.05 * jax.random.normal(
            jax.random.fold_in(key, i), (NX,)) for i in range(B)])
    states = jax.vmap(lambda x: init_rti(spec, x))(x0s)
    bstep = jax.jit(jax.vmap(lambda s, x: rti_step(
        spec, s, x, yref, yref_e, CFG)))
    new_states, outs = bstep(states, x0s)
    for i in range(B):
        si = jax.tree.map(lambda a: a[i], states)
        _, oi = step(si, x0s[i])
        np.testing.assert_allclose(np.asarray(outs.u0[i]),
                                   np.asarray(oi.u0), rtol=1e-9, atol=1e-11)


def test_as_rti_tightens_toward_sqp():
    """AS-RTI-C (extra preparation iterations at the predicted next state,
    arXiv:2403.07101) must track the converged-SQP control closer than
    plain RTI on an aggressive transient, and reduce to plain RTI when
    prep_iters = 0."""
    from crazyflie_nmpc_tpu.models import dynamics as dyn
    from crazyflie_nmpc_tpu.ops.integrators import rk4_step
    from crazyflie_nmpc_tpu.solver import as_rti_step, sqp_solve

    spec = spec64(N=20)
    yref, yref_e = hover_yref(spec, pos=(0.6, -0.4, 0.9))  # big setpoint jump
    x = hover_state(spec.params, pos=(0.0, 0.0, 0.3))

    plain = jax.jit(lambda s, x0: rti_step(spec, s, x0, yref, yref_e, CFG))
    adv = jax.jit(lambda s, x0, xp: as_rti_step(spec, s, x0, xp, yref,
                                                yref_e, CFG, prep_iters=1))
    truth = jax.jit(lambda x0: sqp_solve(spec, init_rti(spec, x0), x0,
                                         yref, yref_e, iters=25,
                                         config=CFG)[0].u_traj[0])
    plant = jax.jit(lambda x0, u: rk4_step(dyn, spec.params, x0, u,
                                           spec.dt))

    def closed_loop(prep_iters, ticks=25):
        st = init_rti(spec, x)
        xs, us = x, []
        for _ in range(ticks):
            if prep_iters == 0:
                st, out = plain(st, xs)
            else:
                x_pred = plant(xs, st.u_traj[0])
                st, out = adv(st, xs, x_pred)
            us.append((np.asarray(out.u0), np.asarray(truth(xs))))
            xs = plant(xs, out.u0)
        errs = [np.abs(a - b).max() for a, b in us]
        return float(np.max(errs[2:]))  # skip cold-start ticks

    err_rti = closed_loop(0)
    err_as1 = closed_loop(1)
    assert err_as1 <= err_rti + 1e-12, (err_as1, err_rti)
    assert err_as1 < 0.5 * err_rti or err_rti < 1e-6, \
        f"AS-RTI gave no improvement: {err_as1} vs {err_rti}"
