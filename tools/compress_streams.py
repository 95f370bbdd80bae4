"""Compressed (bf16) HBM streams for the IPM iteration — adjudication.

VERDICT r4 item 1: the round-4 speed-of-light study measured
`corrector_sweep_c2` AT its HBM streaming floor and `kkt_sweep_c2` with a
0.74 ms bandwidth floor out of a 1.377 ms launch ("fewer bytes is the
only lever", docs/PERF.md), while docs/ARCHITECTURE.md §6 rejected bf16
on a rationale those measurements refuted.  This tool re-adjudicates by
MEASUREMENT, using the machinery the repo already owns:

  perf    (TPU)  full-RTI-step throughput and per-launch kernel times
                 for the four stream configs (none / gains / ab / both),
                 against the halved-byte bandwidth model.
  cert    (TPU + numpy-f64 oracle)  closed-loop bang-bang study
                 (tools/bangbang_cert.py regime: 1.5 m jump) with the
                 REAL compiled compressed kernels, every solve certified
                 against the exact active-set oracle
                 (tests/_reference_rti.py).  The uncompressed fused f32
                 path runs as the baseline so compression-induced error
                 is separable from the f32 floor.
  flight  (TPU)  trajectory-level divergence (tools/
                 default_iters_flightcheck.py metric): closed-loop paths
                 of each compressed config vs the uncompressed fused
                 path — max divergence, final error, realized LQ cost.

Stream configs (IPMConfig fields; ops/pallas/condensed_kernels.py note):
  gains  K/L/Pc written bf16 by the kkt sweep, re-read bf16 by the
         corrector (exact QP data; inexact-Newton corrector).
  ab     condensed Abar/Bbar/cbar stored bf16, Abar deviation-coded
         (perturbs the QP itself).

Run on a TPU host:
    python tools/compress_streams.py perf  [--batch 4096]
    python tools/compress_streams.py cert  [--steps 150 --jump 1.5
                                            --check-every 1]
    python tools/compress_streams.py flight [--steps 400]
Results land in docs/PERF.md "Compressed streams, adjudicated".
"""

import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

_RTT = None


def _rtt():
    global _RTT
    if _RTT is None:
        probe = jnp.ones((1024,), jnp.float32)
        tiny = jax.jit(jnp.max)
        float(tiny(probe))
        ts = []
        for _ in range(15):
            t0 = time.perf_counter()
            float(tiny(probe))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
        print(f"scalar-fetch RTT: {_RTT * 1e3:.2f} ms (min, subtracted)")
    return _RTT


def _drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.max(jnp.abs(leaf).astype(jnp.float32)))


CONFIGS = [
    ("none", dict()),
    ("gains", dict(compress_gains=True)),
    ("ab", dict(compress_ab=True)),
    ("both", dict(compress_gains=True, compress_ab=True)),
]


def _setup(B, dtype=jnp.float32):
    from crazyflie_nmpc_tpu.models import hover_state
    from crazyflie_nmpc_tpu.solver import default_ocp, hover_yref, init_rti
    from crazyflie_nmpc_tpu.solver.rti_batched import to_batch_last

    spec = default_ocp(dtype=dtype)
    yref, yref_e = hover_yref(spec)
    key = jax.random.PRNGKey(0)
    x0s = (hover_state(spec.params, dtype=dtype)[None, :]
           + 0.05 * jax.random.normal(key, (B, 13), dtype))
    states = to_batch_last(jax.vmap(lambda x: init_rti(spec, x))(x0s))
    return spec, yref, yref_e, x0s, states


def _step_fn(spec, yref, yref_e, cfg, sps=25):
    from crazyflie_nmpc_tpu.solver.rti_batched import rti_step_batched

    @jax.jit
    def f(s, x):
        return rti_step_batched(spec, s, x, yref, yref_e, cfg,
                                block_b=128, stages_per_step=sps,
                                layout="batch_last")
    return f


def _time_step(f, states, x0s, iters=15, rounds=5):
    rtt = _rtt()
    s, out = f(states, x0s)
    _drain(out.u0)
    ds = []
    for _ in range(rounds):
        s = states
        t0 = time.perf_counter()
        for _ in range(iters):
            s, out = f(s, x0s)
        _drain(out.u0)
        ds.append((time.perf_counter() - t0 - rtt) / iters)
    ds.sort()
    return ds[len(ds) // 2] * 1e3


# ---------------------------------------------------------------------------
# perf
# ---------------------------------------------------------------------------

def _bytes_model(M, B, gains_half, ab_half):
    """Analytic bytes/launch from the BlockSpec layouts (cf.
    tools/ipm_iter_sol.kkt_bytes), with the compressed streams halved."""
    f = 4.0
    h = 2.0
    ab = h if ab_half else f
    gn = h if gains_half else f
    both = 2 * (169 + 104 + 13)        # A/B/c, two phases
    kkt_in = 169 + 52 + 16 + 13 + 8 + 8
    kkt_out_g = 104 + 36 + 13          # K/L/Pc
    kkt_out_f = 8 + 13 + 8 + 13        # kff, dx, du, dxT-ish consts
    kkt = (both * ab + kkt_in * f + kkt_out_g * gn + kkt_out_f * f)
    corr_in = 13 + 8                   # qx, ru
    corr_g = 104 + 36 + 13             # K/L/Pc (K once — VMEM-parked)
    corr_out = 13 + 8 + 13
    # corrector streams A/B both phases, c forward-only
    corr = ((2 * (169 + 104) + 13) * ab + corr_in * f + corr_g * gn
            + corr_out * f)
    return kkt * M * B, corr * M * B


def run_perf(args):
    from crazyflie_nmpc_tpu.ops import ipm

    B = args.batch
    spec, yref, yref_e, x0s, states = _setup(B)
    M = spec.N // 2

    print(f"\n=== full RTI step (N=50, iters=8, B={B}) ===")
    results = {}
    for name, kw in CONFIGS:
        cfg = ipm.IPMConfig(iters=8, **kw)
        t = _time_step(_step_fn(spec, yref, yref_e, cfg), states, x0s)
        results[name] = t
        print(f"  {name:<6} {t:8.3f} ms/step -> {B / t * 1e3:10,.0f} "
              f"solves/s  ({results['none'] / t - 1:+.1%} vs none)")

    print(f"\n=== byte model (M={M}, B={B}) ===")
    for name, kw in CONFIGS:
        kb, cb = _bytes_model(M, B, kw.get("compress_gains", False),
                              kw.get("compress_ab", False))
        print(f"  {name:<6} kkt {kb / 1e6:7.1f} MB  corrector "
              f"{cb / 1e6:7.1f} MB")

    # B-sweep at the sweet spot for the winning config
    print("\n=== B-sweep, both-compressed vs none ===")
    for Bs in (1024, 2048, 4096):
        spec2, yref2, yref_e2, x0s2, states2 = _setup(Bs)
        for name in ("none", "both"):
            kw = dict(CONFIGS)[name]
            cfg = ipm.IPMConfig(iters=8, **kw)
            t = _time_step(_step_fn(spec2, yref2, yref_e2, cfg),
                           states2, x0s2)
            print(f"  B={Bs:<5} {name:<6} {t:7.3f} ms -> "
                  f"{Bs / t * 1e3:10,.0f} solves/s")


# ---------------------------------------------------------------------------
# closed-loop drivers (shared by cert and flight)
# ---------------------------------------------------------------------------

def _closed_loop(cfg, steps, jump, collect_traj=False):
    """Closed loop with the COMPILED fused batched path (B=128 identical
    lanes; lane 0 drives a shared-nothing numpy-f64 plant).  Returns
    per-tick records for oracle checks and/or the flown trajectory."""
    import _reference_rti as oracle

    from crazyflie_nmpc_tpu.solver import init_rti
    from crazyflie_nmpc_tpu.solver.rti_batched import to_batch_last

    B = 128
    spec, yref, yref_e, _, _ = _setup(B)
    dt = float(spec.tf) / spec.N
    step = _step_fn(spec, yref, yref_e, cfg)

    from crazyflie_nmpc_tpu.models import hover_state
    x = np.asarray(hover_state(spec.params, dtype=jnp.float32), np.float64)
    x[0] = jump
    states = to_batch_last(jax.vmap(lambda x0: init_rti(spec, x0))(
        jnp.broadcast_to(jnp.asarray(x, jnp.float32)[None], (B, 13))))

    recs = []
    xs, us = [x.copy()], []
    for t in range(steps):
        # batch-last (N+1, 13, B) / (N, 4, B): lane 0 slice is stage-major
        prev_x_traj = np.asarray(states.x_traj[..., 0], np.float64)
        prev_u_traj = np.asarray(states.u_traj[..., 0], np.float64)
        states, out = step(states, jnp.broadcast_to(
            jnp.asarray(x, jnp.float32)[None], (B, 13)))
        u_plan = np.asarray(out.u_plan[..., 0], np.float64)   # (N, 4)
        x_plan = np.asarray(out.x_plan[..., 0], np.float64)   # (N+1, 13)
        recs.append(dict(t=t, prev_x=prev_x_traj, prev_u=prev_u_traj,
                         x0=x.copy(), u_plan=u_plan, x_plan=x_plan))
        u0 = u_plan[0]
        x = oracle.rk4(x, u0, dt)
        if collect_traj:
            xs.append(x.copy())
            us.append(u0.copy())
    if collect_traj:
        return spec, recs, np.stack(xs), np.stack(us)
    return spec, recs


def run_cert(args):
    import _reference_rti as oracle

    from crazyflie_nmpc_tpu.ops import ipm

    def qp_objective(H, g, z):
        return 0.5 * z @ H @ z + g @ z

    cert_configs = [(n, ipm.IPMConfig(iters=8, **kw)) for n, kw in CONFIGS]
    cert_configs.append(("both+esc32", ipm.IPMConfig(
        iters=8, compress_gains=True, compress_ab=True,
        escalate_iters=32, escalate_capacity=128)))

    for label, cfg in cert_configs:
        spec, recs = _closed_loop(cfg, args.steps, args.jump)
        dt = float(spec.tf) / spec.N
        yref, yref_e = (np.asarray(a) for a in
                        __import__("crazyflie_nmpc_tpu.solver",
                                   fromlist=["hover_yref"]
                                   ).hover_yref(spec))
        u0e, pe, og = [], [], []
        checked = skipped = 0
        for r in recs[::args.check_every]:
            H, g, E, d, lb, ub, nz = oracle.build_dense_qp(
                r["prev_x"], r["prev_u"], r["x0"], yref, yref_e, dt)
            off = (spec.N + 1) * oracle.NX
            try:
                z_ref = oracle.solve_qp_active_set(H, g, E, d, lb, ub, off)
            except RuntimeError:
                skipped += 1
                continue
            checked += 1
            u_ref = r["prev_u"] + z_ref[off:].reshape(spec.N, 4)
            z_sol = np.concatenate([
                (r["x_plan"] - r["prev_x"]).ravel(),
                (r["u_plan"] - r["prev_u"]).ravel()])
            u0e.append(np.abs(r["u_plan"][0] - u_ref[0]).max())
            pe.append(np.abs(r["u_plan"] - u_ref).max())
            og.append(qp_objective(H, g, z_sol)
                      - qp_objective(H, g, z_ref))
        u0e, pe, og = np.array(u0e), np.array(pe), np.array(og)
        print(f"\n[{label}] {args.steps} ticks, checked {checked} "
              f"({skipped} oracle-degenerate skipped)")
        print(f"  u0 err:   max {u0e.max():.3e}  "
              f"p99 {np.percentile(u0e, 99):.3e}  "
              f"ticks>1e-4: {int((u0e > 1e-4).sum())}  "
              f"ticks>1e-2: {int((u0e > 1e-2).sum())}")
        print(f"  plan err: max {pe.max():.3e}  obj gap max {og.max():.3e}")


def run_flight(args):
    from crazyflie_nmpc_tpu.ops import ipm

    for jump in (0.5, 1.5):
        base = None
        print(f"\n=== flight divergence, {jump} m transient, "
              f"{args.steps} ticks ===")
        for name, kw in CONFIGS:
            cfg = ipm.IPMConfig(iters=8, **kw)
            spec, recs, xs, us = _closed_loop(cfg, args.steps, jump,
                                              collect_traj=True)
            # realized LQ tracking cost around the hover point
            q = np.array([120.0, 100.0, 100.0, 1e-3, 1e-3, 1e-3, 1e-3,
                          0.7, 1.0, 4.0, 1e-5, 1e-5, 10.0])
            tgt = np.zeros(13)
            tgt[2] = 0.5              # hover_yref default setpoint
            tgt[3] = 1.0
            uss = 15.7777
            lq = float(np.sum(q * (xs - tgt) ** 2)
                       + np.sum(0.06 * (us - uss) ** 2))
            if name == "none":
                base = (xs, us, lq)
                print(f"  {name:<6} final err "
                      f"{np.abs(xs[-1, :3] - tgt[:3]).max():.2e} m, "
                      f"LQ cost {lq:.4f}")
                continue
            dtraj = np.abs(xs[:, :3] - base[0][:, :3]).max()
            du0 = np.abs(us - base[1]).max()
            print(f"  {name:<6} max u0 div {du0:.3f} kRPM, max traj div "
                  f"{dtraj:.2e} m, final div "
                  f"{np.abs(xs[-1, :3] - base[0][-1, :3]).max():.2e} m, "
                  f"LQ rel diff {(lq - base[2]) / base[2]:+.2%}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["perf", "cert", "flight"])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--jump", type=float, default=1.5)
    ap.add_argument("--check-every", type=int, default=1)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}")
    if args.mode == "perf":
        run_perf(args)
    elif args.mode == "cert":
        run_cert(args)
    else:
        if args.steps == 150:
            args.steps = 400
        run_flight(args)


if __name__ == "__main__":
    main()
