"""Speed-of-light study for the IPM iteration kernels (VERDICT r4 item 3).

The per-RTI-step hot path is 8 x (kkt_sweep_c2 + corrector_sweep_c2 +
XLA glue) = ~89% of solve time.  This tool produces, on real TPU
hardware, the same evidence the diagonal sweep got in round 2:

  1. measured per-launch times of both kernels on REAL condensed data
     (chained, drain-proof — docs/PERF.md timing methodology);
  2. a BANDWIDTH bound: analytic bytes streamed HBM<->VMEM per launch
     (from the BlockSpec layouts, incl. the two-phase A/B/c re-stream)
     against the MEASURED stream bandwidth of this chip;
  3. an ISSUE-RATE bound: a resident-data replay microkernel runs the
     exact backward-stage arithmetic (same _mm/_chol_n/_cho_solve ops,
     same shapes) from VMEM with no HBM traffic — its per-stage time x
     stage count is the pure-compute floor for this code on this VPU;
     a bare broadcast-FMA matmul microkernel calibrates the primitive
     rate the stage arithmetic is built from;
  4. an OP-DELETION ablation of both kernels (ablate= sets in
     condensed_kernels): re-time with each op replaced by a same-shape
     copy; the delta is that op's marginal cost.

Speed-of-light = max(bandwidth bound, issue bound); the gap to measured
is scheduling/overlap loss.  Run on a TPU host:

    python tools/ipm_iter_sol.py [--batch 4096] [--sps 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

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
        ts.sort()
        _RTT = ts[len(ts) // 2]
        print(f"scalar-fetch RTT: {_RTT * 1e3:.2f} ms (subtracted)")
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


# ---------------------------------------------------------------------------
# measured stream bandwidth (the denominator of the BW bound)
# ---------------------------------------------------------------------------

def measure_hbm_bw(mb: int = 256, passes: int = 8):
    """Chained elementwise pass over an mb-MB f32 array: each pass reads
    + writes the array once -> 2*size bytes.  Returns GB/s."""
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
# issue-rate microkernels (resident data, no HBM streaming in the loop)
# ---------------------------------------------------------------------------

def measure_fma_rate(block_b=128, reps=512, unroll=16):
    """Bare broadcast-FMA 13x13 @ 13x13 matmul (_mm) on resident VMEM
    data: the primitive the sweeps are built from.  The inner `unroll`
    matmuls are trace-time unrolled (like the real kernels' stage loops)
    so Mosaic can software-pipeline — a fori_loop around a single matmul
    measures loop-carry serialization, not issue rate (first attempt
    measured 1495 ns/matmul that way; unrolled is the honest number).
    Returns ns per matmul (2197 MACs x block_b lanes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from crazyflie_nmpc_tpu.ops.pallas.riccati_kernels import NX, _mm

    def kern(a_ref, b_ref, o_ref):
        b = b_ref[...]

        def body(i, c):
            for _ in range(unroll):
                c = _mm(c, b, NX, NX, NX) * 7.6e-4 + b
            return c

        o_ref[...] = jax.lax.fori_loop(0, reps // unroll, body, a_ref[...])

    a = jnp.broadcast_to(
        jnp.eye(NX, dtype=jnp.float32)[:, :, None], (NX, NX, block_b))
    bm = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                 (NX, NX, block_b), jnp.float32)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NX, NX, block_b), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b))
    t_ms = timeit(f, a, bm, iters=10)
    ns_per_mm = t_ms * 1e6 / reps
    macs = NX * NX * NX * block_b
    print(f"broadcast-FMA 13x13x13 matmul (resident, bb={block_b}): "
          f"{ns_per_mm:.1f} ns -> {macs / (ns_per_mm * 1e-9) / 1e12:.2f} "
          f"T MAC/s")
    return ns_per_mm


def measure_stage_replay(block_b=128, reps=60):
    """The EXACT backward-stage arithmetic of _kkt_c2_kernel (same ops,
    same shapes, same primitives) replayed on resident VMEM data.
    Per-stage time x M = the pure-compute floor of the backward phase."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from crazyflie_nmpc_tpu.ops.pallas.condensed_kernels import (
        NLC,
        NUC,
        _chol_n,
        _cho_solve_n,
        _cho_solve_n_vec,
    )
    from crazyflie_nmpc_tpu.ops.pallas.riccati_kernels import (
        NX,
        _add_diag,
        _mm,
        _mtm,
        _mtv,
        _mv,
    )

    def kern(A_ref, B_ref, c_ref, Q_ref, S1T_ref, R00_ref, qx_ref,
             ruu_ref, ru_ref, P0_ref, p0_ref, P_out, p_out):
        A, Bm, c = A_ref[...], B_ref[...], c_ref[...]
        S1T, R00 = S1T_ref[...], R00_ref[...]
        qx, ruu, ru = qx_ref[...], ruu_ref[...], ru_ref[...]
        Q = Q_ref[...]

        def body(i, carry):
            P, p = carry
            PA = _mm(P, A, NX, NX, NX)
            PB = _mm(P, Bm, NX, NX, NUC)
            Pc = _mv(P, c, NX, NX)
            m = p + Pc
            BtPB = _mtm(Bm, PB, NX, NUC, NUC)
            z44 = jnp.zeros_like(R00)
            R00p = jnp.concatenate([
                jnp.concatenate([R00, z44], axis=1),
                jnp.concatenate([z44, z44], axis=1)], axis=0)
            Quu = _add_diag(BtPB + R00p, ruu, NUC)
            SxT = jnp.concatenate([S1T, jnp.zeros_like(S1T)], axis=0)
            Qux = SxT + _mtm(Bm, PA, NX, NUC, NX)
            Qu = ru + _mtv(Bm, m, NX, NUC)
            L = _chol_n(Quu, NUC)
            K = -_cho_solve_n(L, Qux, NUC, NX)
            kff = -_cho_solve_n_vec(L, Qu, NUC)
            APA = _mtm(A, PA, NX, NX, NX)
            QK = _mtm(Qux, K, NUC, NX, NX)
            P_new = Q + APA + QK
            P_new = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
            p_new = qx + _mtv(A, m, NX, NX) + _mtv(K, Qu, NUC, NX)
            return P_new, p_new

        def body4(i, carry):
            # 4 stages trace-time unrolled per loop step (the real kernel
            # unrolls ms stages) so the measurement includes cross-stage
            # software pipelining, not fori_loop carry serialization
            for _ in range(4):
                carry = body(i, carry)
            return carry

        P, p = jax.lax.fori_loop(
            0, reps // 4, body4, (P0_ref[...], p0_ref[...]))
        P_out[...] = P
        p_out[...] = p

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 11)
    bb = block_b
    mk = lambda k, sh, s=0.05: s * jax.random.normal(k, sh, jnp.float32)
    A = (jnp.broadcast_to(jnp.eye(NX, dtype=jnp.float32)[:, :, None],
                          (NX, NX, bb)) + mk(ks[0], (NX, NX, bb)))
    Bm = mk(ks[1], (NX, NUC, bb))
    c = mk(ks[2], (NX, bb))
    Q = jnp.broadcast_to(
        jnp.eye(NX, dtype=jnp.float32)[:, :, None], (NX, NX, bb))
    S1T = mk(ks[3], (4, NX, bb))
    R00 = 0.1 * jnp.broadcast_to(
        jnp.eye(4, dtype=jnp.float32)[:, :, None], (4, 4, bb))
    qx = mk(ks[4], (NX, bb))
    ruu = 1.0 + 0.1 * jax.random.uniform(ks[5], (NUC, bb), jnp.float32)
    ru = mk(ks[6], (NUC, bb))
    P0 = Q
    p0 = mk(ks[7], (NX, bb))
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((NX, NX, bb), jnp.float32),
                   jax.ShapeDtypeStruct((NX, bb), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    )(*a))
    t_ms = timeit(f, A, Bm, c, Q, S1T, R00, qx, ruu, ru, P0, p0, iters=10)
    us_per_stage = t_ms * 1e3 / reps
    print(f"resident backward-stage replay (bb={bb}): "
          f"{us_per_stage:.2f} us/stage")
    return us_per_stage


# ---------------------------------------------------------------------------
# analytic byte models (from the BlockSpec layouts)
# ---------------------------------------------------------------------------

def kkt_bytes(M, B, dtype_bytes=4):
    """Per-launch HBM<->VMEM bytes of kkt_sweep_c2.  A/B/c stream through
    BOTH phases (the `both` index maps re-fetch them stage block by stage
    block in each phase); backward-only inputs and outputs stream once;
    const blocks are fetched once per batch block."""
    per_stage = (
        2 * (13 * 13 + 13 * 8 + 13)      # A, B, c x two phases
        + 13 * 13 + 4 * 13 + 4 * 4       # Qbar, S1T, R00
        + 13 + 8 + 8                     # qx, ruu_shift, ru
        + 8 * 13 + 8 + 36 + 13           # outputs K, kff, L, Pc
        + 13 + 8                         # outputs dx, du
    )
    const = 3 * 13 + 13                  # pT, p_term, dx0 + dxT out
    return (M * per_stage + const) * B * dtype_bytes


def corr_bytes(M, B, dtype_bytes=4):
    """Per-launch bytes of corrector_sweep_c2 (K streams once since the
    round-4 K_all VMEM cache; it was 12% of bytes as a `both` spec)."""
    per_stage = (
        2 * (13 * 13 + 13 * 8)           # A, B x two phases
        + 13                             # c (forward)
        + 13 + 8                         # qx, ru
        + 8 * 13 + 36 + 13               # K (backward only), L, Pc
        + 13 + 8                         # outputs dx, du
    )
    const = 2 * 13 + 13
    return (M * per_stage + const) * B * dtype_bytes


# MACs per condensed stage (counted from the kernel body)
KKT_MACS_PER_STAGE = (2197 + 1352 + 169        # PA, PB, Pc
                      + 832 + 1352 + 104       # BtPB, Qux, Qu
                      + 120 + 728 + 112        # chol, solve K, solve kff
                      + 2197 + 1352            # APA, QK
                      + 169 + 104              # p_new matvecs
                      + 380)                   # forward phase
CORR_MACS_PER_STAGE = 104 + 112 + 169 + 104 + 380


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--sps", type=int, default=10)
    ap.add_argument("--kkt-ops", default="",
                    help="comma list of kkt ablations to run (default all)")
    args = ap.parse_args()
    B = args.batch
    print(f"device: {jax.devices()[0].device_kind}, B={B}")

    from crazyflie_nmpc_tpu.models import NX, hover_state
    from crazyflie_nmpc_tpu.ops.pallas import condensed_kernels as ck
    from crazyflie_nmpc_tpu.ops.pallas import prep_kernel as pk
    from crazyflie_nmpc_tpu.solver import default_ocp, hover_yref, init_rti
    from crazyflie_nmpc_tpu.solver.rti_batched import to_batch_last

    spec = default_ocp(dtype=jnp.float32)
    yref, yref_e = hover_yref(spec)
    key = jax.random.PRNGKey(0)
    x0s = (hover_state(spec.params, dtype=jnp.float32)[None, :]
           + 0.05 * jax.random.normal(key, (B, NX), jnp.float32))
    states = to_batch_last(jax.vmap(lambda x: init_rti(spec, x))(x0s))

    # ---- real condensed data (same as perf_breakdown) -------------------
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

    def chain_kkt(ablate):
        @jax.jit
        def f(ru_):
            def body(r, _):
                K, kff, L, Pc, dxs, dus = ck.kkt_sweep_c2(
                    cnd["Abar"], cnd["Bbar"], cnd["cbar"], cnd["Qbar"],
                    cnd["S1T"], cnd["R00"], cnd["qbar"], ruu_c, r, pT,
                    p_term, dx0, ablate=ablate, **kw)
                return r + 1e-6 * dus, None
            r, _ = jax.lax.scan(body, ru_, None, length=8)
            return r
        return f

    # factorization once, then chained correctors (isolates the corrector)
    Kf, kfff, Lf, Pcf, _, _ = jax.block_until_ready(jax.jit(
        lambda: ck.kkt_sweep_c2(
            cnd["Abar"], cnd["Bbar"], cnd["cbar"], cnd["Qbar"],
            cnd["S1T"], cnd["R00"], cnd["qbar"], ruu_c, cnd["rbar"], pT,
            p_term, dx0, **kw))())

    def chain_corr(ablate):
        @jax.jit
        def f(ru_):
            def body(r, _):
                dxs2, dus2 = ck.corrector_sweep_c2(
                    cnd["Abar"], cnd["Bbar"], cnd["cbar"], cnd["qbar"],
                    r, Kf, Lf, Pcf, p_term, dx0, ablate=ablate, **kw)
                return r + 1e-6 * dus2, None
            r, _ = jax.lax.scan(body, ru_, None, length=8)
            return r
        return f

    ru0 = cnd["rbar"]
    t_kkt = timeit(chain_kkt(frozenset()), ru0, iters=5) / 8
    t_corr = timeit(chain_corr(frozenset()), ru0, iters=5) / 8
    print(f"\nmeasured per launch: kkt_sweep_c2 {t_kkt:.3f} ms, "
          f"corrector_sweep_c2 {t_corr:.3f} ms "
          f"(iteration = {t_kkt + t_corr:.3f} + glue)")

    # ---- split-launch comparison (windowed = bwd/fwd as two kernels) ----
    @jax.jit
    def chain_win(ru_):
        def body(r, _):
            K2, kf2, L2, Pc2, dxs2, dus2 = ck.kkt_sweep_c2_win(
                cnd["Abar"], cnd["Bbar"], cnd["cbar"], cnd["Qbar"],
                cnd["S1T"], cnd["R00"], cnd["qbar"], ruu_c, r, pT,
                p_term, dx0, **kw)
            return r + 1e-6 * dus2, None
        r, _ = jax.lax.scan(body, ru_, None, length=8)
        return r

    t_win = timeit(chain_win, ru0, iters=5) / 8
    print(f"windowed split launches (bwd+fwd through HBM): {t_win:.3f} ms"
          f" ({t_win - t_kkt:+.3f} vs fused — the gain-round-trip price)")

    # ---- FULL-STEP check: does the split-launch advantage survive in
    # context (kkt + corrector windowed, 8 iterations, real RTI glue)?
    from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
    from crazyflie_nmpc_tpu.solver.rti_batched import rti_step_batched

    def full_step(windowed):
        @jax.jit
        def f(s, x):
            return rti_step_batched(spec, s, x, yref, yref_e,
                                    IPMConfig(iters=8), block_b=128,
                                    stages_per_step=args.sps,
                                    layout="batch_last",
                                    windowed=windowed)
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

    for wlabel, w in [("default (in-VMEM fused)", None),
                      ("windowed split", True)]:
        t = time_step(full_step(w))
        print(f"FULL RTI step, {wlabel}: {t:.3f} ms "
              f"-> {B / t * 1e3:,.0f} solves/s")

    # ---- bounds ---------------------------------------------------------
    bw = measure_hbm_bw()
    ns_mm = measure_fma_rate()
    us_stage = measure_stage_replay()

    kb, cb = kkt_bytes(M, B), corr_bytes(M, B)
    t_kkt_bw = kb / (bw * 1e9) * 1e3
    t_corr_bw = cb / (bw * 1e9) * 1e3
    # issue bound: resident replay per stage x M condensed stages,
    # scaled to the full batch (replay runs one 128-lane block; the chip
    # runs B/128 blocks sequentially per grid)
    t_kkt_issue = us_stage * M * (B / 128) / 1e3
    mac_rate = (13 ** 3 * 128) / (ns_mm * 1e-9)      # MAC/s at the
    t_corr_issue = (CORR_MACS_PER_STAGE * M * B) / mac_rate * 1e3

    print(f"\n=== speed-of-light table (M={M}, B={B}, f32) ===")
    print(f"{'kernel':<22}{'bytes/launch':>14}{'BW bound':>10}"
          f"{'issue bound':>12}{'SoL=max':>10}{'measured':>10}{'gap':>7}")
    for name, byts, tbw, tis, tm in [
        ("kkt_sweep_c2", kb, t_kkt_bw, t_kkt_issue, t_kkt),
        ("corrector_sweep_c2", cb, t_corr_bw, t_corr_issue, t_corr),
    ]:
        sol = max(tbw, tis)
        print(f"{name:<22}{byts / 1e6:>11.1f} MB{tbw:>9.3f}ms"
              f"{tis:>11.3f}ms{sol:>9.3f}ms{tm:>9.3f}ms{tm / sol:>7.2f}")

    # ---- op-deletion ablations -----------------------------------------
    # each variant is a fresh remote compile through the tunnel; transient
    # RPC failures must not kill the whole study
    def safe_time(mk, tag, base):
        for attempt in range(3):
            try:
                t = timeit(mk(), ru0, iters=5) / 8
                print(f"  -{tag:<6} {t:.3f} ms  (op cost ~ "
                      f"{base - t:+.3f} ms, "
                      f"{(base - t) / base * 100:+.1f}%)")
                return t
            except Exception as e:
                print(f"  -{tag:<6} attempt {attempt}: "
                      f"{type(e).__name__} (tunnel) — retrying")
                time.sleep(5)
        print(f"  -{tag:<6} FAILED after retries")
        return None

    print("\n=== kkt_sweep_c2 op-deletion ablation (delta vs full) ===")
    for op in args.kkt_ops.split(",") if args.kkt_ops else [
            "PA", "PB", "Pc", "BtPB", "Qux", "chol", "APA", "QK",
            "sym", "fwd"]:
        safe_time(lambda op=op: chain_kkt(frozenset([op])), op, t_kkt)

    print("\n=== corrector_sweep_c2 op-deletion ablation ===")
    for op in ["Qu", "solve", "pnew", "fwd"]:
        safe_time(lambda op=op: chain_corr(frozenset([op])), op, t_corr)


if __name__ == "__main__":
    main()
