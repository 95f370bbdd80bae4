"""Reduced-order VDE sensitivities — adjudication (round 5).

The fixed-cost speed-of-light study (tools/fixed_cost_sol.py) measured
the ERK4 matrix-VDE arithmetic at 56-64% of the `prep_condense2` launch
— the single largest remaining fixed-cost term after the iteration-side
wins.  `prep_vde_order=2` (ops/pallas/prep_kernel._vde_stage_o2) keeps
the exact ERK4 state propagation (the defect c, and so the converged
trajectory, are unchanged) but builds A/B from one midpoint Jacobian:

    A ~= I + dt J(x2) + dt^2/2 J(x2)^2,   B ~= dt (G + dt/2 J(x2) G)

i.e. an INEXACT-Jacobian Gauss-Newton: each tick's QP shifts by the
O(dt^3) sensitivity truncation (3rd-order scaling pinned in
tests/test_pallas_kernels.py).  Like the compressed-stream knobs, it is
adjudicated by MEASUREMENT with the same three instruments:

    perf    (TPU)  full-RTI-step throughput, order 4 vs 2
    cert    (TPU + numpy-f64 oracle)  closed-loop bang-bang study with
            every solve certified against the exact active-set oracle
            (the oracle builds ITS QP from the exact linearization, so
            this measures the full inexact-Jacobian effect)
    flight  (TPU)  trajectory-level divergence vs the order-4 path

Run on a TPU host:
    python tools/vde_order_sol.py perf   [--batch 4096]
    python tools/vde_order_sol.py cert   [--steps 150 --jump 1.5]
    python tools/vde_order_sol.py flight [--steps 400]
Results land in docs/PERF.md "Fixed-cost speed of light".
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


ORDERS = (4, 2)


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


def _step_fn(spec, yref, yref_e, order, iters=8, sps=25):
    from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
    from crazyflie_nmpc_tpu.solver.rti_batched import rti_step_batched

    @jax.jit
    def f(s, x):
        return rti_step_batched(spec, s, x, yref, yref_e,
                                IPMConfig(iters=iters), block_b=128,
                                stages_per_step=sps, layout="batch_last",
                                prep_vde_order=order)
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


def run_perf(args):
    B = args.batch
    spec, yref, yref_e, x0s, states = _setup(B)
    print(f"\n=== full RTI step (N=50, iters=8, B={B}) ===")
    base = None
    for order in ORDERS:
        t = _time_step(_step_fn(spec, yref, yref_e, order), states, x0s)
        if base is None:
            base = t
        print(f"  vde_order={order}  {t:8.3f} ms/step -> "
              f"{B / t * 1e3:10,.0f} solves/s  ({base / t - 1:+.1%})")


def _closed_loop(order, steps, jump, collect_traj=False):
    import _reference_rti as oracle

    from crazyflie_nmpc_tpu.models import hover_state
    from crazyflie_nmpc_tpu.solver import init_rti
    from crazyflie_nmpc_tpu.solver.rti_batched import to_batch_last

    B = 128
    spec, yref, yref_e, _, _ = _setup(B)
    dt = float(spec.tf) / spec.N
    step = _step_fn(spec, yref, yref_e, order)

    x = np.asarray(hover_state(spec.params, dtype=jnp.float32), np.float64)
    x[0] = jump
    states = to_batch_last(jax.vmap(lambda x0: init_rti(spec, x0))(
        jnp.broadcast_to(jnp.asarray(x, jnp.float32)[None], (B, 13))))

    recs = []
    xs, us = [x.copy()], []
    for t in range(steps):
        prev_x = np.asarray(states.x_traj[..., 0], np.float64)
        prev_u = np.asarray(states.u_traj[..., 0], np.float64)
        states, out = step(states, jnp.broadcast_to(
            jnp.asarray(x, jnp.float32)[None], (B, 13)))
        u_plan = np.asarray(out.u_plan[..., 0], np.float64)
        x_plan = np.asarray(out.x_plan[..., 0], np.float64)
        recs.append(dict(t=t, prev_x=prev_x, prev_u=prev_u, x0=x.copy(),
                         u_plan=u_plan, x_plan=x_plan))
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

    for order in ORDERS:
        spec, recs = _closed_loop(order, args.steps, args.jump)
        dt = float(spec.tf) / spec.N
        yref, yref_e = (np.asarray(a) for a in
                        __import__("crazyflie_nmpc_tpu.solver",
                                   fromlist=["hover_yref"]
                                   ).hover_yref(spec))
        u0e, pe = [], []
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
            u0e.append(np.abs(r["u_plan"][0] - u_ref[0]).max())
            pe.append(np.abs(r["u_plan"] - u_ref).max())
        u0e, pe = np.array(u0e), np.array(pe)
        print(f"\n[vde_order={order}] {args.steps} ticks, checked "
              f"{checked} ({skipped} oracle-degenerate skipped)")
        print(f"  u0 err vs exact-Jacobian oracle: max {u0e.max():.3e}  "
              f"p99 {np.percentile(u0e, 99):.3e}  "
              f"ticks>1e-4: {int((u0e > 1e-4).sum())}  "
              f"ticks>1e-2: {int((u0e > 1e-2).sum())}")
        print(f"  plan err: max {pe.max():.3e}")


def run_flight(args):
    for jump in (0.5, 1.5):
        base = None
        print(f"\n=== flight divergence, {jump} m transient, "
              f"{args.steps} ticks ===")
        for order in ORDERS:
            spec, recs, xs, us = _closed_loop(order, args.steps, jump,
                                              collect_traj=True)
            q = np.array([120.0, 100.0, 100.0, 1e-3, 1e-3, 1e-3, 1e-3,
                          0.7, 1.0, 4.0, 1e-5, 1e-5, 10.0])
            tgt = np.zeros(13)
            tgt[2] = 0.5
            tgt[3] = 1.0
            uss = 15.7777
            lq = float(np.sum(q * (xs - tgt) ** 2)
                       + np.sum(0.06 * (us - uss) ** 2))
            if order == 4:
                base = (xs, us, lq)
                print(f"  order=4 final err "
                      f"{np.abs(xs[-1, :3] - tgt[:3]).max():.2e} m, "
                      f"LQ cost {lq:.4f}")
                continue
            dtraj = np.abs(xs[:, :3] - base[0][:, :3]).max()
            du0 = np.abs(us - base[1]).max()
            print(f"  order={order} max u0 div {du0:.3f} kRPM, max traj "
                  f"div {dtraj:.2e} m, final div "
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
