"""Latency crossover: sequential Riccati vs associative-scan (pscan).

`ops.riccati_pscan` evaluates the backward cost-to-go in O(log N) depth
(Särkkä & García-Fernández parallel LQT) — the sequential recursion
(`ops.riccati`, and the fused Pallas sweeps) is O(N) depth.  The scan
pays ~4x the FLOPs per stage, so it can only win where DEPTH dominates:
single-problem (B=1) latency at long horizons.

MEASURED VERDICT (round 3, one v5e chip): the crossover does not exist —
sequential wins at every N in 50..3200 (0.42-0.61x ratio; table in
docs/PERF.md "Associative-scan Riccati").  The module is demoted to
research status on that basis.

Timing methodology: drain-proof chained loops (docs/PERF.md).  Each
timed round is a lax.scan whose carry taints A and c (so the backward
pass cannot be hoisted out of the loop) and ends in a scalar VALUE
fetch; the separately measured fetch RTT is subtracted; median of 5.

Run: python tools/pscan_crossover.py [--horizons 50 200 800 3200]
"""

import argparse
import sys
import time
import warnings

sys.path.insert(0, ".")
warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp
import numpy as np


def make_lq(N, nx=13, nu=4, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    A = (0.9 * jax.random.normal(ks[0], (N, nx, nx), dtype)
         / float(np.sqrt(nx)) + 0.5 * jnp.eye(nx, dtype=dtype))
    B = jax.random.normal(ks[1], (N, nx, nu), dtype)
    c = 0.1 * jax.random.normal(ks[2], (N, nx), dtype)
    qxx = 0.2 + jax.random.uniform(ks[3], (N, nx), dtype)
    ruu = 0.2 + jax.random.uniform(ks[4], (N, nu), dtype)
    return dict(A=A, B=B, c=c,
                Qxx=jax.vmap(jnp.diag)(qxx),
                qx=jax.random.normal(ks[5], (N, nx), dtype),
                Ruu=jax.vmap(jnp.diag)(ruu),
                ru=jax.random.normal(ks[6], (N, nu), dtype),
                S=jnp.zeros((N, nu, nx), dtype),
                P_term=jnp.diag(0.2 + jax.random.uniform(ks[7], (nx,),
                                                         dtype)),
                p_term=jnp.zeros((nx,), dtype),
                dx0=jax.random.normal(jax.random.PRNGKey(99), (nx,),
                                      dtype))


def fetch_rtt(n=15):
    probe = jnp.ones((1024,), jnp.float32)
    tiny = jax.jit(jnp.max)
    float(tiny(probe))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(tiny(probe))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def timed(solver, lq, rtt, chain=30, rounds=5):
    @jax.jit
    def run(t0):
        def body(t, _):
            l = dict(lq)
            l["A"] = lq["A"] * (1.0 + 1e-7 * t)   # taint: nothing hoists
            l["c"] = lq["c"] + 1e-7 * t
            dx, du = solver(**l)[:2]
            return jnp.max(jnp.abs(dx)) * 1e-6, ()
        t, _ = jax.lax.scan(body, t0, None, length=chain)
        return t

    float(run(jnp.float32(0.0)))                  # compile + warm
    ds = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(run(jnp.float32(0.0)))              # value fetch = drain
        ds.append((time.perf_counter() - t0 - rtt) / chain)
    ds.sort()
    return ds[len(ds) // 2] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", type=int, nargs="+",
                    default=[50, 200, 800, 3200])
    args = ap.parse_args()

    from crazyflie_nmpc_tpu.ops import riccati, riccati_pscan

    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)} ({dev.platform})")
    rtt = fetch_rtt()
    print(f"scalar-fetch RTT: {rtt*1e3:.2f} ms (subtracted)")

    print(f"{'N':>6} {'seq ms':>10} {'pscan ms':>10} {'seq/pscan':>9}")
    for N in args.horizons:
        lq = make_lq(N)
        t_seq = timed(riccati.solve_lq, lq, rtt)
        t_par = timed(riccati_pscan.solve_lq_pscan, lq, rtt)
        print(f"{N:>6} {t_seq:>10.3f} {t_par:>10.3f} "
              f"{t_seq / t_par:>8.2f}x")


if __name__ == "__main__":
    main()
