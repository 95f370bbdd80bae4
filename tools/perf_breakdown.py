"""Hot-path timing breakdown on the TPU (chained, in-context data).

Measures at the production spec (N=50, c2 condensing, B=4096):
  * full RTI step at iters in {0, 1, 8}: the fixed cost outside the IPM
    loop is the iters=0 point; the slope is the true per-iteration cost
  * prep_sweep alone and prep+condense2 (fixed-cost split)
  * kernel-only chained loops (kkt_sweep_c2 / corrector_sweep_c2) on the
    REAL condensed data, so kernel time vs XLA-glue share is measured on
    the distribution the solver actually runs.

Run: python tools/perf_breakdown.py  [--batch 4096]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


_RTT = None


def _rtt():
    """Scalar-fetch round trip (drain-proof timing subtracts it —
    block_until_ready through the tunneled dev chip intermittently
    returns early; docs/PERF.md 'timing methodology')."""
    global _RTT
    if _RTT is None:
        import jax.numpy as jnp
        probe = jnp.ones((1024,), jnp.float32)
        tiny = jax.jit(jnp.max)
        float(tiny(probe))
        ts = []
        for _ in range(15):
            t0 = time.perf_counter()
            float(tiny(probe))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        _RTT = ts[len(ts) // 2]
        print(f"scalar-fetch RTT: {_RTT*1e3:.2f} ms (subtracted)")
    return _RTT


def _drain(out):
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.max(jnp.abs(leaf).astype(jnp.float32)))


def timeit(fn, *args, iters=20, warmup=3, rounds=5):
    """Drain-proof: each round ends in a scalar VALUE fetch; the fetch
    RTT is subtracted; median of rounds."""
    rtt = _rtt()
    for _ in range(warmup):
        out = fn(*args)
    _drain(out)
    ds = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _drain(out)
        ds.append((time.perf_counter() - t0 - rtt) / iters)
    ds.sort()
    return ds[len(ds) // 2] * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--sps", type=int, default=10,
                    help="stages_per_step request (c2 uses sps//2)")
    args = ap.parse_args()

    from crazyflie_nmpc_tpu.models import NX, hover_state
    from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
    from crazyflie_nmpc_tpu.ops.pallas import condensed_kernels as ck
    from crazyflie_nmpc_tpu.solver import default_ocp, hover_yref, init_rti
    from crazyflie_nmpc_tpu.solver.rti_batched import (
        rti_step_batched, to_batch_last)

    B = args.batch
    print(f"device: {jax.devices()[0].device_kind}, B={B}")
    spec = default_ocp(dtype=jnp.float32)
    yref, yref_e = hover_yref(spec)
    key = jax.random.PRNGKey(0)
    x0s = (hover_state(spec.params, dtype=jnp.float32)[None, :]
           + 0.05 * jax.random.normal(key, (B, NX), jnp.float32))
    states = to_batch_last(jax.vmap(lambda x: init_rti(spec, x))(x0s))

    def step_fn(iters):
        cfg = IPMConfig(iters=iters)
        return jax.jit(lambda s, x: rti_step_batched(
            spec, s, x, yref, yref_e, cfg, block_b=128,
            stages_per_step=args.sps, layout="batch_last"))

    def timeit_chained_step(f, iters=20, rounds=5):
        """Chained (each step consumes the previous state) + drained."""
        rtt = _rtt()
        s, out = f(states, x0s)
        _drain(out)
        ds = []
        for _ in range(rounds):
            s = states
            t0 = time.perf_counter()
            for _ in range(iters):
                s, out = f(s, x0s)
            _drain(out)
            ds.append((time.perf_counter() - t0 - rtt) / iters)
        ds.sort()
        return ds[len(ds) // 2] * 1e3

    ts = {}
    for it in (0, 1, 8):
        ts[it] = timeit_chained_step(step_fn(it))
        print(f"full step, iters={it}: {ts[it]:.3f} ms")
    per_iter = (ts[8] - ts[1]) / 7.0
    print(f"-> per-IPM-iteration: {per_iter:.3f} ms; fixed (iters=0 "
          f"point): {ts[0]:.3f} ms; first-iter extra: "
          f"{ts[1] - ts[0] - per_iter:.3f} ms")
    print(f"-> solves/s at iters=8: {B / ts[8] * 1e3:,.0f}")

    # ---- fixed-cost split: prep alone, prep+condense2 (real data) ------
    from crazyflie_nmpc_tpu.ops.pallas import prep_kernel as pk

    q_diag = jnp.diagonal(spec.cost.W)[:NX].astype(jnp.float32)
    r_diag = jnp.diagonal(spec.cost.W)[NX:].astype(jnp.float32)
    yref_bl = jnp.broadcast_to(yref[:, :, None].astype(jnp.float32),
                               (spec.N, 17, B))
    par = spec.params
    ptile = jnp.stack([jnp.broadcast_to(jnp.asarray(v, jnp.float32), (B,))
                       for v in (par.g0, par.mq, par.Ixx, par.Iyy, par.Izz,
                                 par.Cd, par.Ct, par.l, spec.dt)])
    tile = lambda v, n: jnp.broadcast_to(
        jnp.asarray(v, jnp.float32).reshape(n, 1), (n, B))

    @jax.jit
    def prep_only(x_bl, u_bl):
        return pk.prep_sweep(x_bl, u_bl, yref_bl, tile(q_diag, NX),
                             tile(r_diag, 4),
                             tile(jnp.broadcast_to(spec.lbu, (4,)), 4),
                             tile(jnp.broadcast_to(spec.ubu, (4,)), 4),
                             ptile, block_b=128, stages_per_step=5)

    @jax.jit
    def prep_cond(x_bl, u_bl):
        A, Bm, c, qx, ru, lb, ub = prep_only(x_bl, u_bl)
        qxx = jnp.broadcast_to(q_diag[None, :, None], (spec.N, NX, B))
        return ck.condense2(A, Bm, c, qxx, qx, ru, block_b=128)

    t_prep = timeit(prep_only, states.x_traj, states.u_traj, iters=10)
    t_pc = timeit(prep_cond, states.x_traj, states.u_traj, iters=10)
    print(f"prep_sweep: {t_prep:.3f} ms; prep+condense2: {t_pc:.3f} ms "
          f"-> condense2 in context: {t_pc - t_prep:.3f} ms")

    # ---- kernel-only chains on REAL condensed data ----------------------
    A, Bm, c, qx50, ru50, lb, ub = jax.block_until_ready(
        prep_only(states.x_traj, states.u_traj))
    qxx = jnp.broadcast_to(q_diag[None, :, None], (spec.N, NX, B))
    cnd = jax.block_until_ready(jax.jit(
        lambda: ck.condense2(A, Bm, c, qxx, qx50, ru50, block_b=128))())
    M = spec.N // 2
    ruu_c = jnp.broadcast_to(r_diag[None, :, None],
                             (spec.N, 4, B)).reshape(M, 8, B) + 1.0
    pT = jnp.broadcast_to(jnp.diagonal(spec.cost.W_e).astype(jnp.float32)
                          [:, None], (NX, B))
    p_term = 0.01 * jax.random.normal(key, (NX, B), jnp.float32)
    dx0 = 0.01 * jax.random.normal(key, (NX, B), jnp.float32)
    sps_c2 = max(1, args.sps // 2)
    kw = dict(block_b=128, stages_per_step=sps_c2)

    @jax.jit
    def chain_kkt(ru_):
        def body(r, _):
            K, kff, L, Pc, dxs, dus = ck.kkt_sweep_c2(
                cnd["Abar"], cnd["Bbar"], cnd["cbar"], cnd["Qbar"],
                cnd["S1T"], cnd["R00"], cnd["qbar"], ruu_c, r, pT,
                p_term, dx0, **kw)
            return r + 1e-6 * dus, None
        r, _ = jax.lax.scan(body, ru_, None, length=8)
        return r

    @jax.jit
    def chain_corr(ru_):
        K, kff, L, Pc, dxs, dus = ck.kkt_sweep_c2(
            cnd["Abar"], cnd["Bbar"], cnd["cbar"], cnd["Qbar"],
            cnd["S1T"], cnd["R00"], cnd["qbar"], ruu_c, ru_, pT,
            p_term, dx0, **kw)

        def body(r, _):
            dxs2, dus2 = ck.corrector_sweep_c2(
                cnd["Abar"], cnd["Bbar"], cnd["cbar"], cnd["qbar"], r,
                K, L, Pc, p_term, dx0, **kw)
            return r + 1e-6 * dus2, None
        r, _ = jax.lax.scan(body, ru_, None, length=8)
        return r

    ru_c0 = cnd["rbar"]
    t_kkt8 = timeit(chain_kkt, ru_c0, iters=5)
    t_corr8 = timeit(chain_corr, ru_c0, iters=5)
    t_kkt = (t_kkt8 - 0.0) / 8
    t_corr = (t_corr8 - t_kkt) / 8
    print(f"kkt_sweep_c2 chained x8: {t_kkt8:.3f} ms -> {t_kkt:.3f}/launch")
    print(f"kkt + 8 correctors: {t_corr8:.3f} ms -> ~{t_corr:.3f}/launch")
    print(f"-> XLA glue per iteration ~ {per_iter - t_kkt - t_corr:.3f} ms")


if __name__ == "__main__":
    main()
