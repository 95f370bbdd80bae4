"""Benchmark: NMPC solves/s/chip at the reference problem size (N=50).

Prints ONE JSON line:
  {"metric": "nmpc_solves_per_s_n50", "value": ..., "unit": "solves/s",
   "vs_baseline": value / 10000, "serving": {...}}
(vs_baseline is against the BASELINE.json target of >= 10k solves/s/chip.)

The "serving" field carries the real-time serving decomposition
(docs/PERF.md methodology, driver-capturable): transport floor p50/p99,
device-resident solve latency, host-synced serving p50/p99 at the
reference's 66.6 Hz (acados_estimator.cpp:642) and at a
transport-sustainable rate, the on-host estimate (p50 - floor), and
deadline-miss/slip counters.  On a tunneled dev chip the host-synced
numbers are transport-bound; the floor makes them auditable.

Each "solve" is a full SQP-RTI iteration on the 13-state/4-input Crazyflie
OCP with N=50 shooting intervals: ERK4 linearization with forward
sensitivities at all 50 stages, Gauss-Newton QP assembly, and an 8-iteration
Mehrotra interior-point solve (Riccati-factorized), i.e. the same work the
reference's acados_solve() does per control tick (acados_mpc.cpp:611).
Secondary diagnostics (per-batch throughput sweep, single-solve latency)
go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the fused-kernel graph is expensive to compile
# on small hosts; repeated bench runs should only pay it once.  Keyed by
# CPU fingerprint — cross-host XLA:CPU AOT artifacts segfault on load.
from crazyflie_nmpc_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_rtt(probe_arr, n: int = 15) -> float:
    """Median wall time of a scalar value fetch with an empty pipeline —
    the host<->device round trip that drained timings must subtract."""
    tiny = jax.jit(jnp.max)
    float(tiny(probe_arr))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(tiny(probe_arr))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def measure_chained(step, states0, x0s, rtt, steps=20, rounds=5):
    """Drain-proof per-step time: chained steps ending in a scalar VALUE
    fetch, which is the only operation that provably drains the device
    pipeline (block_until_ready through a tunneled dev chip intermittently
    returns early — measured; docs/PERF.md "timing methodology").
    Subtracts the separately measured fetch RTT; median of `rounds`."""
    s = states0
    s, u0 = step(s, x0s)
    float(jnp.max(u0))                       # warm
    ds = []
    for _ in range(rounds):
        s = states0
        t0 = time.perf_counter()
        for _ in range(steps):
            s, u0 = step(s, x0s)
        float(jnp.max(u0))                   # drain
        ds.append((time.perf_counter() - t0 - rtt) / steps)
    ds.sort()
    return ds[len(ds) // 2]


def main():
    from crazyflie_nmpc_tpu.models import hover_state
    from crazyflie_nmpc_tpu.ops import ipm
    from crazyflie_nmpc_tpu.solver import (
        default_ocp,
        hover_yref,
        init_rti,
    )
    from crazyflie_nmpc_tpu.solver.rti_batched import (
        rti_step_batched,
        to_batch_last,
    )

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    on_tpu = dev.platform == "tpu"

    spec = default_ocp(N=50, dtype=jnp.float32)
    cfg = ipm.IPMConfig(iters=8)
    yref, yref_e = hover_yref(spec)

    def make_batch(B):
        key = jax.random.PRNGKey(0)
        x0s = (hover_state(spec.params, dtype=jnp.float32)[None, :]
               + 0.05 * jax.random.normal(key, (B, 13), jnp.float32))
        states = jax.vmap(lambda x: init_rti(spec, x))(x0s)
        # serving loop carries kernel-layout (batch-last) state: chained
        # steps then skip two large layout transposes per tick
        return to_batch_last(states), x0s

    def make_step(block_b, interpret, stages_per_step=25, ipm_cfg=None,
                  condense=2):
        # stages_per_step=25: two grid steps per sweep at N=50 — the VMEM
        # sweet spot measured on v5e (see PROGRESS notes / probe sweeps).
        # condense=2: block-2 partial condensing (the reference's own
        # PARTIAL_CONDENSING_HPIPM structure) — measured +16% throughput
        # from the halved Riccati depth; exact same QP solution (pinned by
        # tests/test_pallas_kernels.py::test_ipm_fast_condensed_matches_ipm)
        @jax.jit
        def step(states, x0s):
            new_states, outs = rti_step_batched(
                spec, states, x0s, yref, yref_e, ipm_cfg or cfg,
                block_b=block_b, stages_per_step=stages_per_step,
                interpret=interpret, condense=condense,
                layout="batch_last")
            return new_states, outs.u0
        return step

    rtt = None
    best = 0.0
    sweep = [1024, 2048, 4096, 8192] if on_tpu else [8]
    for B in sweep:
        step = make_step(block_b=min(128, B), interpret=not on_tpu)
        states, x0s = make_batch(B)
        if rtt is None:
            rtt = fetch_rtt(x0s) if on_tpu else 0.0
            log(f"scalar-fetch RTT: {rtt * 1e3:.2f} ms (subtracted from "
                f"drained timings)")
        t0 = time.perf_counter()
        states, u0 = step(states, x0s)
        jax.block_until_ready(u0)
        log(f"B={B}: compile+first {time.perf_counter() - t0:.2f}s")
        # steady state: chained steps, drain-proof (see measure_chained)
        dt = measure_chained(step, states, x0s, rtt,
                             steps=20 if on_tpu else 3,
                             rounds=5 if on_tpu else 1)
        rate = B / dt
        log(f"B={B}: {dt * 1e3:.2f} ms/step -> {rate:,.0f} solves/s")
        best = max(best, rate)

    # accuracy-equivalent faster operating point (docs/PERF.md: Gondzio
    # 6+1k matches the default's worst-tick accuracy at ~3% more
    # throughput); diagnostic only — the headline stays work-comparable
    # with the reference's acados_solve
    certified = None
    if on_tpu:
        cfg_g = ipm.IPMConfig(iters=6, gondzio_correctors=1)
        step_g = make_step(block_b=128, interpret=False, ipm_cfg=cfg_g)
        states_g, x0s_g = make_batch(4096)
        dt = measure_chained(step_g, states_g, x0s_g, rtt)
        log(f"gondzio 6+1k operating point: {dt * 1e3:.2f} ms/step -> "
            f"{4096 / dt:,.0f} solves/s (equal worst-tick accuracy)")

        # CERTIFIED operating points: the configs the <1e-4 oracle parity
        # is proven at — iters=8 + per-lane escalation to 16
        # (tests/test_certification.py, 0.3 m saturating + helix) and to
        # 32 (the 1.5 m bang-bang study, tools/bangbang_cert.py: 0 ticks
        # over 1e-4 vs the exact active-set oracle).  escalate_mu_tol=0
        # forces the escalation sub-solve (capacity=256 lanes) on EVERY
        # step instead of being cond-skipped once lanes converge — the
        # WORST-case per-step cost, not the average; the batch saturates
        # the input bound (0.3 m offsets) so the work is representative.
        key = jax.random.PRNGKey(1)
        x0c = (hover_state(spec.params, dtype=jnp.float32)[None, :]
               + 0.05 * jax.random.normal(key, (4096, 13), jnp.float32))
        x0c = x0c.at[:, 0].add(0.3)    # saturating transient, every lane
        # both certified configs reported, keyed by escalation depth
        # (ADVICE r3: a single scalar silently meant only escalate=32)
        certified = {}
        for esc in (16, 32):
            cfg_c = ipm.IPMConfig(iters=8, escalate_iters=esc,
                                  escalate_capacity=256,
                                  escalate_mu_tol=0.0)
            step_c = make_step(block_b=128, interpret=False, ipm_cfg=cfg_c)
            states_c = to_batch_last(
                jax.vmap(lambda x: init_rti(spec, x))(x0c))
            dt = measure_chained(step_c, states_c, x0c, rtt)
            certified[f"esc{esc}"] = round(4096 / dt, 1)
            log(f"certified operating point (8 + escalate{esc}, "
                f"worst-case, saturating batch): {dt * 1e3:.2f} ms/step "
                f"-> {4096 / dt:,.0f} solves/s")

    # feedback latency at small batch (the latency-oriented compiled path;
    # reference real-time budget is 15 ms/solve, target < 10 ms).  The
    # warm-started RTI QP needs fewer barrier iterations than a cold solve.
    B_lat = 128 if on_tpu else 8
    step = make_step(block_b=B_lat, interpret=not on_tpu,
                     ipm_cfg=ipm.IPMConfig(iters=5))
    states, x0s = make_batch(B_lat)
    lat = []
    states, u0 = step(states, x0s)
    jax.block_until_ready(u0)
    for _ in range(50):
        t0 = time.perf_counter()
        s2, u0 = step(states, x0s)
        jax.block_until_ready(u0)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    # device-resident feedback latency: chained steps, drain-proof
    # (the synced numbers above include the host<->device round-trip,
    # which on a tunneled dev chip is ~25 ms of pure transport)
    dt_dev = measure_chained(step, states, x0s, rtt or 0.0,
                             steps=30 if on_tpu else 3,
                             rounds=5 if on_tpu else 1)
    log(f"RTI feedback latency (B={B_lat}): device-resident "
        f"{dt_dev * 1e3:.2f} ms/step; host-synced p50={lat[25] * 1e3:.3f} "
        f"ms p99={lat[-1] * 1e3:.3f} ms (budget: 15 ms, target < 10 ms)")

    serving = None
    if on_tpu:
        try:
            serving = serving_decomposition(spec, yref, yref_e, dt_dev)
        except Exception as e:  # never let the serving probe kill the bench
            log(f"serving decomposition failed: {type(e).__name__}: {e}")
            serving = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "nmpc_solves_per_s_n50",
        "value": round(best, 1),
        "unit": "solves/s",
        "vs_baseline": round(best / 10000.0, 4),
        # keyed by escalation config; esc32 is the bang-bang-certified
        # worst-case operating point (tools/bangbang_cert.py)
        "certified_solves_per_s": certified,
        "serving": serving,
    }))


def serving_decomposition(spec, yref, yref_e, dt_dev,
                          sync_s: float = 12.0, sustained_s: float = 15.0):
    """Driver-capturable real-time serving numbers (docs/PERF.md).

    Runs the actual `runtime.serving.ServingLoop` (66.6 Hz absolute-time
    schedule, per-tick deadline accounting — the reference's timer
    discipline, acados_estimator.cpp:642) against a host-side simulated
    plant pinned to the CPU backend, plus the transport floor that makes
    tunnel-hosted numbers auditable.
    """
    import numpy as np

    from crazyflie_nmpc_tpu.models import dynamics, hover_state
    from crazyflie_nmpc_tpu.ops import ipm
    from crazyflie_nmpc_tpu.ops.integrators import rk4_step
    from crazyflie_nmpc_tpu.runtime.serving import (
        ServeConfig,
        ServingLoop,
        measure_transport_floor,
    )

    floor = measure_transport_floor(batch=1, n=120)
    log(f"[serving] transport floor p50={floor['p50_ms']:.3f} ms "
        f"p99={floor['p99_ms']:.3f} ms")

    cpu = jax.local_devices(backend="cpu")[0]
    dt = float(spec.dt)
    setpoint = (0.0, 0.0, 0.5)

    def make_plant(batch):
        x0 = hover_state(spec.params, pos=(0.2, -0.15, 0.3),
                         dtype=jnp.float32)
        xb = jax.device_put(jnp.broadcast_to(x0, (batch,) + x0.shape), cpu)
        plant = {"x": xb}
        pstep = jax.jit(jax.vmap(
            lambda x, u: rk4_step(dynamics, spec.params, x, u, dt)))
        pstep(plant["x"],
              jax.device_put(jnp.zeros((batch, 4), jnp.float32), cpu))

        def source(k):
            return np.asarray(plant["x"])

        def sink(k, cmd, u_apply):
            plant["x"] = pstep(plant["x"], jax.device_put(u_apply, cpu))

        return plant, source, sink

    def serve(rate_hz, seconds):
        loop = ServingLoop(spec, ipm.IPMConfig(iters=8),
                           ServeConfig(rate_hz=rate_hz, pipeline_depth=0),
                           batch=1)
        plant, source, sink = make_plant(1)
        loop.warmup(source(0), yref, yref_e)
        loop.reset(source(0))
        rep = loop.run(int(seconds * rate_hz), source, sink, yref, yref_e)
        s = rep.summary()
        err = float(np.abs(np.asarray(plant["x"])[0, 0:3]
                           - np.asarray(setpoint)).max())
        out = dict(rate_hz=round(rate_hz, 2), ticks=s["ticks"],
                   p50_ms=round(s["p50_ms"], 3), p99_ms=round(s["p99_ms"], 3),
                   deadline_misses=s["deadline_misses"],
                   schedule_slips=s["schedule_slips"],
                   final_pos_err_m=round(err, 4))
        log(f"[serving] {rate_hz:.1f} Hz x {s['ticks']} ticks: "
            f"p50={s['p50_ms']:.3f} ms p99={s['p99_ms']:.3f} ms "
            f"misses={s['deadline_misses']} slips={s['schedule_slips']} "
            f"final err={err:.4f} m")
        return out

    sync = serve(66.6, sync_s)
    # a rate the measured transport can sustain (a PCIe-local TPU sustains
    # 66.6 Hz; through the tunnel the floor itself exceeds the period)
    sustain_hz = min(66.6, 1e3 / (1.3 * (floor["p99_ms"] + 10.0)))
    sustained = sync if abs(sustain_hz - 66.6) < 1e-9 else serve(
        sustain_hz, sustained_s)

    on_host = max(sync["p50_ms"] - floor["p50_ms"], 0.0)
    log(f"[serving] on-host estimate (p50 - floor): {on_host:.3f} ms "
        f"(target < 10 ms)")
    return dict(
        transport_floor_p50_ms=round(floor["p50_ms"], 3),
        transport_floor_p99_ms=round(floor["p99_ms"], 3),
        device_resident_solve_ms=round(dt_dev * 1e3, 3),
        sync_66hz=sync,
        sustained=sustained,
        on_host_estimate_ms=round(on_host, 3),
    )


if __name__ == "__main__":
    main()
