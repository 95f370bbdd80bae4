"""Speed-of-light study for the RTI FIXED COST (VERDICT r4 item 2).

The per-step fixed cost — everything outside the 8 IPM iterations —
was measured at 1.84 ms in round 3 (iters-slope intercept at B=4096),
~11% of the step and the growing share after every iteration-side win.
It decomposes as:

    prep_condense2   ONE Pallas launch: ERK4 + closed-form matrix VDE +
                     QP assembly + block-2 condensing (the RTI
                     preparation phase, generate_c_code.py:140-147)
    expand2          ONE Pallas launch: recover the eliminated odd
                     states through their dynamics rows (post-solve)
    glue             XLA between launches: slack/dual initialization,
                     initial residuals, trajectory update, u0/u1/x4
                     output extraction, kkt reduction

This tool gives that fixed cost the same treatment the iteration got in
round 4 (tools/ipm_iter_sol.py):

  1. measured: iters-slope fixed point (t8/t1 chained, drain-proof) and
     standalone chained launches for prep_condense2 and expand2;
  2. BANDWIDTH bounds: analytic bytes/launch from the BlockSpec layouts
     against the measured HBM stream bandwidth;
  3. OP-DELETION ablation of prep_condense2 (ablate= groups in
     ops/pallas/prep_kernel.py): "vde" (ERK4+VDE arithmetic), "cond"
     (condensed-dynamics products), "cost" (condensed-cost products) —
     each group replaced by a same-shape copy; the delta is its
     marginal cost, and all-three-ablated is the pure streaming floor
     measured in vivo (cross-check of the byte model).

Speed-of-light = bandwidth bound (the kernels are VPU elementwise +
small broadcast-FMA products; the iteration study showed the issue rate
is not binding at these shapes).  Run on a TPU host:

    python tools/fixed_cost_sol.py [--batch 4096]

Results land in docs/PERF.md "Fixed-cost speed of light".
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

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


def timeit(fn, *args, iters=10, warmup=2, rounds=5):
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


def measure_hbm_bw(mb: int = 256, passes: int = 8):
    """Chained elementwise pass over an mb-MB f32 array (read+write per
    pass).  Returns GB/s (cf. tools/ipm_iter_sol.py)."""
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def chain(x):
        def body(y, _):
            return y * 1.0000001 + 1e-12, None
        y, _ = jax.lax.scan(body, x, None, length=passes)
        return y

    t_ms = timeit(chain, x, iters=5)
    per_pass = t_ms / passes
    gbs = (2 * n * 4) / (per_pass * 1e-3) / 1e9
    print(f"HBM stream: {per_pass:.3f} ms per {2 * mb} MB pass "
          f"-> {gbs:.0f} GB/s")
    return gbs


# ---------------------------------------------------------------------------
# analytic byte models (from the BlockSpec layouts)
# ---------------------------------------------------------------------------

def prep_c2_bytes(M, B, dtype_bytes=4):
    """Per-launch HBM<->VMEM bytes of prep_condense2: per stage PAIR it
    streams the raw trajectory slices in (x/x_next twice, u, yref) and
    writes the condensed QP data + expansion data + full-horizon
    c/lb/ub out."""
    per_pair_in = 2 * 13 + 2 * 13 + 2 * 4 + 2 * 17          # x, xn, u, yref
    per_pair_out = (169 + 104 + 13 + 169 + 52 + 16 + 13 + 8  # condensed QP
                    + 169 + 52                               # Ae, Be
                    + 2 * 13 + 2 * 4 + 2 * 4)                # c, lb, ub
    return (per_pair_in + per_pair_out) * M * B * dtype_bytes


def expand2_bytes(M, B, dtype_bytes=4):
    """Per-launch bytes of expand2 (even_only=True): Ae/Be + full c +
    condensed solution in, odd states out."""
    per_stage = 169 + 52 + 2 * 13 + 13 + 4 + 13
    return per_stage * M * B * dtype_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()
    B = args.batch
    print(f"device: {jax.devices()[0].device_kind}, B={B}")

    from crazyflie_nmpc_tpu.models import NX, hover_state
    from crazyflie_nmpc_tpu.ops import ipm
    from crazyflie_nmpc_tpu.ops.pallas import condensed_kernels as ck
    from crazyflie_nmpc_tpu.ops.pallas import prep_kernel as pk
    from crazyflie_nmpc_tpu.solver import default_ocp, hover_yref, init_rti
    from crazyflie_nmpc_tpu.solver.rti_batched import (
        rti_step_batched,
        to_batch_last,
    )

    spec = default_ocp(dtype=jnp.float32)
    N, M = spec.N, spec.N // 2
    yref, yref_e = hover_yref(spec)
    key = jax.random.PRNGKey(0)
    x0s = (hover_state(spec.params, dtype=jnp.float32)[None, :]
           + 0.05 * jax.random.normal(key, (B, NX), jnp.float32))
    states = to_batch_last(jax.vmap(lambda x: init_rti(spec, x))(x0s))
    x_bl, u_bl = states.x_traj, states.u_traj

    # ---- 1. the fixed point from the iters slope ------------------------
    def full_step(iters):
        cfg = ipm.IPMConfig(iters=iters)

        @jax.jit
        def f(s, x):
            return rti_step_batched(spec, s, x, yref, yref_e, cfg,
                                    block_b=128, stages_per_step=25,
                                    layout="batch_last")
        return f

    def time_step(f, iters=15, rounds=5):
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

    t8 = time_step(full_step(8))
    t1 = time_step(full_step(1))
    slope = (t8 - t1) / 7.0
    fixed = t1 - slope
    print(f"\nfull step: iters=8 {t8:.3f} ms, iters=1 {t1:.3f} ms -> "
          f"per-iteration {slope:.3f} ms, FIXED COST {fixed:.3f} ms "
          f"({fixed / t8 * 100:.1f}% of the step)")

    # ---- 2. prep_condense2 standalone + ablations -----------------------
    q_diag = jnp.diagonal(spec.cost.W)[:NX].astype(jnp.float32)
    r_diag = jnp.diagonal(spec.cost.W)[NX:].astype(jnp.float32)
    yref_bl = jnp.broadcast_to(yref[:, :, None].astype(jnp.float32),
                               (N, 17, B))
    par = spec.params
    ptile = jnp.stack([jnp.broadcast_to(jnp.asarray(v, jnp.float32), (B,))
                       for v in (par.g0, par.mq, par.Ixx, par.Iyy, par.Izz,
                                 par.Cd, par.Ct, par.l, spec.dt)])
    tile = lambda v, n: jnp.broadcast_to(
        jnp.asarray(v, jnp.float32).reshape(n, 1), (n, B))
    qd, rd = tile(q_diag, NX), tile(r_diag, 4)
    lb_t = tile(jnp.broadcast_to(spec.lbu, (4,)), 4)
    ub_t = tile(jnp.broadcast_to(spec.ubu, (4,)), 4)

    def chain_prep(ablate):
        @jax.jit
        def f(u):
            def body(u, _):
                cnd, Ae, Be, c, lb, ub = pk.prep_condense2(
                    x_bl, u, yref_bl, qd, rd, lb_t, ub_t, ptile,
                    block_b=128, pairs_per_step=5, ablate=ablate)
                return u + 1e-6 * cnd["rbar"].reshape(N, 4, B), None
            u, _ = jax.lax.scan(body, u, None, length=8)
            return u
        return f

    t_prep = timeit(chain_prep(frozenset()), u_bl, iters=5) / 8
    print(f"\nprep_condense2 per launch (chained): {t_prep:.3f} ms")

    def safe_time(mk, tag, base):
        for attempt in range(3):
            try:
                t = timeit(mk(), u_bl, iters=5) / 8
                print(f"  -{tag:<14} {t:.3f} ms  (group cost ~ "
                      f"{base - t:+.3f} ms, "
                      f"{(base - t) / base * 100:+.1f}%)")
                return t
            except Exception as e:
                print(f"  -{tag:<14} attempt {attempt}: "
                      f"{type(e).__name__} (tunnel) — retrying")
                time.sleep(5)
        print(f"  -{tag:<14} FAILED after retries")
        return None

    print("=== prep_condense2 op-deletion ablation (delta vs full) ===")
    t_stream = None
    for tag in ["vde", "cond", "cost", "vde+cond+cost"]:
        ab = frozenset(tag.split("+"))
        t = safe_time(lambda ab=ab: chain_prep(ab), tag, t_prep)
        if tag == "vde+cond+cost":
            t_stream = t

    # ---- 3. expand2 standalone -----------------------------------------
    cnd, Ae, Be, c_full, lb, ub = jax.block_until_ready(jax.jit(
        lambda: pk.prep_condense2(x_bl, u_bl, yref_bl, qd, rd, lb_t,
                                  ub_t, ptile, block_b=128,
                                  pairs_per_step=5))())
    dx_even = 0.01 * jax.random.normal(key, (M, NX, B), jnp.float32)
    du0 = 0.01 * jax.random.normal(key, (M, 4, B), jnp.float32)

    @jax.jit
    def chain_expand(d):
        def body(d, _):
            dxo = ck.expand2(Ae, Be, c_full, d, du0, block_b=128,
                             stages_per_step=5, even_only=True)
            return d + 1e-6 * dxo, None
        d, _ = jax.lax.scan(body, d, None, length=8)
        return d

    t_exp = timeit(chain_expand, dx_even, iters=5) / 8
    print(f"\nexpand2 per launch (chained): {t_exp:.3f} ms")

    glue = fixed - t_prep - t_exp
    print(f"inter-launch glue (fixed - prep - expand): {glue:.3f} ms")

    # ---- 4. bounds ------------------------------------------------------
    bw = measure_hbm_bw()
    pb, eb = prep_c2_bytes(M, B), expand2_bytes(M, B)
    t_prep_bw = pb / (bw * 1e9) * 1e3
    t_exp_bw = eb / (bw * 1e9) * 1e3

    print(f"\n=== fixed-cost speed-of-light table (M={M}, B={B}, f32) ===")
    print(f"{'piece':<18}{'bytes/launch':>14}{'BW bound':>10}"
          f"{'measured':>10}{'gap':>7}")
    for name, byts, tbw, tm in [
        ("prep_condense2", pb, t_prep_bw, t_prep),
        ("expand2", eb, t_exp_bw, t_exp),
    ]:
        print(f"{name:<18}{byts / 1e6:>11.1f} MB{tbw:>9.3f}ms"
              f"{tm:>9.3f}ms{tm / tbw:>7.2f}")
    if t_stream is not None:
        print(f"in-vivo streaming floor (all compute ablated): "
              f"{t_stream:.3f} ms vs byte-model bound {t_prep_bw:.3f} ms")
    print(f"glue (XLA between launches): {glue:.3f} ms of "
          f"{fixed:.3f} ms fixed")


if __name__ == "__main__":
    main()
