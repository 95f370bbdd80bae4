"""Serving-loop tests: deadline accounting + host-in-the-loop closed loop.

The scheduler/accounting core is exercised with a fake clock (pure host
logic, no solver); the end-to-end serving loop runs the real solver on a
short horizon with the plant in the loop — the reference's 66.6 Hz
estimator->solve->cmd_vel discipline (acados_estimator.cpp:642,
acados_mpc.cpp:644-670) in software.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from crazyflie_nmpc_tpu.models import dynamics, hover_state
from crazyflie_nmpc_tpu.ops.integrators import rk4_step
from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
from crazyflie_nmpc_tpu.runtime.serving import (
    ServeConfig,
    ServeReport,
    ServingLoop,
    TickScheduler,
    measure_transport_floor,
)
from crazyflie_nmpc_tpu.solver import default_ocp, hover_yref


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += max(s, 1e-4)

    def spend(self, s):
        self.t += s


def test_scheduler_absolute_anchoring():
    clk = FakeClock()
    sched = TickScheduler(0.015, clock=clk, sleep=clk.sleep)
    sched.start()
    # a slow tick must not shift later ticks' scheduled starts
    sched.wait_for_tick(0)
    clk.spend(0.040)  # tick 0 overruns by 2.5 periods
    t2 = sched.wait_for_tick(2)
    assert t2 == pytest.approx(0.040, abs=1e-9)  # already past: no wait
    t4 = sched.wait_for_tick(4)
    assert t4 == pytest.approx(4 * 0.015, abs=2e-3)  # back on schedule


def test_scheduler_counts_slips():
    clk = FakeClock()
    sched = TickScheduler(0.015, clock=clk, sleep=clk.sleep)
    sched.start()
    sched.wait_for_tick(0)
    clk.spend(0.015 + 0.010)  # next start slips by 10 ms > period/2
    sched.wait_for_tick(1)
    sched.wait_for_tick(2)  # on time again
    assert sched.slips == 1


def test_report_deadline_semantics():
    cfg = ServeConfig(rate_hz=100.0, budget_s=0.010, pipeline_depth=0)
    rep = ServeReport(config=cfg,
                      latency_s=np.array([0.004, 0.009, 0.011, 0.02]),
                      service_s=np.zeros(4), schedule_slips=0, ticks=4)
    assert rep.deadline_misses == 2
    # pipelined: deadline extends by depth periods (the plan-compensated
    # latency), so the same latencies may all be on time
    cfg2 = ServeConfig(rate_hz=100.0, budget_s=0.010, pipeline_depth=2)
    rep2 = ServeReport(config=cfg2, latency_s=rep.latency_s,
                       service_s=np.zeros(4), schedule_slips=0, ticks=4)
    assert rep2.deadline_misses == 0
    s = rep.summary()
    assert s["ticks"] == 4 and s["deadline_misses"] == 2


def _closed_loop_run(depth: int, n_ticks: int = 30, predict_gap=True):
    """Plant-in-the-loop serving on a short horizon; returns final |err|."""
    spec = default_ocp(N=16, dtype=jnp.float64)
    serve = ServeConfig(rate_hz=500.0, pipeline_depth=depth)
    loop = ServingLoop(spec, IPMConfig(iters=8), serve, batch=1,
                       use_fused=False, predict_gap=predict_gap)
    setpoint = (0.0, 0.0, 0.4)
    yref, yref_e = hover_yref(spec, pos=setpoint)

    x = hover_state(spec.params, pos=(0.15, -0.1, 0.2), dtype=jnp.float64)
    plant = {"x": x}
    dt = float(spec.dt)

    def source(k):
        return np.asarray(plant["x"])[None, :]

    applied = []

    def sink(k, cmd, u_apply):
        # actuation: apply the emission-aligned rotor command to the plant
        plant["x"] = rk4_step(dynamics, spec.params,
                              plant["x"], jnp.asarray(u_apply[0]), dt)
        applied.append(k)

    loop.warmup(source(0), yref, yref_e)
    loop.reset(source(0))
    rep = loop.run(n_ticks, source, sink, yref, yref_e)
    err = np.abs(np.asarray(plant["x"])[0:3] - np.asarray(setpoint))
    return rep, err, applied


def test_serving_closed_loop_sync():
    rep, err, applied = _closed_loop_run(depth=0)
    assert applied == list(range(30))          # every tick emitted, in order
    assert rep.latency_s.shape == (30,)
    assert err.max() < 0.02                    # converging toward setpoint


def test_serving_closed_loop_pipelined():
    """Depth-2 pipelined serving stays stable: the solve's anchor is
    predicted through the 2-tick gap under the in-flight pending commands
    (the reference's delay predictor, acados_estimator.cpp:573-593,
    upgraded from 'last command' to the exact pending buffer).  Without
    that prediction the rotor-level plant diverges within ~20 ticks from
    a 5 cm offset — stale anchoring compounds through the open-loop-
    unstable attitude dynamics."""
    rep, err, applied = _closed_loop_run(depth=2)
    assert applied == list(range(30))
    assert err.max() < 0.02
    # pipelined latency includes the depth: >= depth * period by design
    assert rep.latency_s.min() >= 2 * rep.config.period_s - 1e-3


def test_serving_pipelined_without_gap_prediction_diverges():
    """The ablation arm of the delay-compensation claim: depth-2 serving
    with predict_gap=False (solves anchored to the raw 2-tick-stale
    state, no pending-command prediction) must NOT converge on the
    rotor-level plant — anchor staleness compounds through the open-loop-
    unstable attitude dynamics — while the default (predicted) depth-2
    loop converges under identical conditions
    (test_serving_closed_loop_pipelined)."""
    rep, err, applied = _closed_loop_run(depth=2, predict_gap=False)
    worst = np.where(np.isfinite(err), err, np.inf).max()
    assert (not np.all(np.isfinite(err))) or worst > 0.05, err


def test_transport_floor_reports():
    d = measure_transport_floor(batch=4, n=10)
    assert d["platform"] == "cpu"
    assert 0.0 < d["p50_ms"] < 1e3


def test_short_horizon_guard():
    spec = default_ocp(N=4, dtype=jnp.float64)
    with pytest.raises(ValueError, match="N >= 5"):
        ServingLoop(spec, batch=1, use_fused=False)
