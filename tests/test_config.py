"""Config plane (utils/config.py) — the reference's four config mechanisms
as one typed dataclass tree, including the live-weight capability the
reference compiled out (SET_WEIGHTS=0, acados_mpc.cpp:110,596-602)."""

import jax
import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu.models import hover_state
from crazyflie_nmpc_tpu.solver import default_ocp, hover_yref, init_rti, rti_step
from crazyflie_nmpc_tpu.solver.ocp import default_cost
from crazyflie_nmpc_tpu.utils.config import (
    AppConfig,
    ControllerConfig,
    EstimatorConfig,
)


def test_round_trip_json(tmp_path):
    cfg = AppConfig(
        controller=ControllerConfig(tracking=True, setpoint=(1.0, 2.0, 3.0),
                                    ipm_iters=12),
        estimator=EstimatorConfig(delay=0.06),
    )
    p = tmp_path / "app.json"
    cfg.save(str(p))
    back = AppConfig.load(str(p))
    assert back.controller.tracking is True
    assert tuple(back.controller.setpoint) == (1.0, 2.0, 3.0)
    assert back.controller.ipm_iters == 12
    assert back.estimator.delay == 0.06
    assert back.controller.ipm().iters == 12


def test_defaults_match_reference():
    cfg = ControllerConfig()
    assert cfg.horizon == 50 and cfg.tf == 0.75
    assert cfg.q_diag[0] == 120.0 and cfg.r_diag == (0.06,) * 4
    assert cfg.wn_factor == 50.0
    est = EstimatorConfig()
    assert est.delay == 0.015 and abs(est.rate_hz - 66.6) < 1e-9


def test_live_weight_update_no_recompile():
    """Weight edits are traced data: changing Q must not retrace the jitted
    RTI step, and must change the solution — the dynamic_reconfigure panel
    semantics the reference intended."""
    spec = default_ocp(dtype=jnp.float64)
    x0 = hover_state(spec.params, pos=(0.3, 0.0, 0.2), dtype=jnp.float64)
    yref, yref_e = hover_yref(spec)
    state = init_rti(spec, x0)

    from crazyflie_nmpc_tpu.ops.ipm import IPMConfig

    traces = {"n": 0}

    @jax.jit
    def step(spec_, state_, x0_):
        traces["n"] += 1
        return rti_step(spec_, state_, x0_, yref, yref_e,
                        IPMConfig(iters=6))

    _, out_a = step(spec, state, x0)
    # crank the position weight 10x (the xq_cost panel knob)
    import dataclasses

    q10 = np.array([1200.0, 1000.0, 1000.0, 1e-3, 1e-3, 1e-3, 1e-3,
                    0.7, 1.0, 4.0, 1e-5, 1e-5, 10.0])
    spec_b = dataclasses.replace(spec, cost=default_cost(
        q_diag=q10, dtype=jnp.float64))
    _, out_b = step(spec_b, state, x0)

    assert traces["n"] == 1, "weight change retraced the solver"
    assert not np.allclose(np.asarray(out_a.u0), np.asarray(out_b.u0)), \
        "weight change had no effect on the solution"
