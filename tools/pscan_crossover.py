"""Latency crossover: sequential Riccati vs associative-scan (pscan).

`ops.riccati_pscan` evaluates the backward cost-to-go in O(log N) depth
(Särkkä & García-Fernández parallel LQT) — the sequential recursion
(`ops.riccati`, and the fused Pallas sweeps) is O(N) depth.  The scan
pays ~4x the FLOPs per stage (dense 13x13 solves/products per combine
level), so it can only win where DEPTH dominates: single-problem (B=1)
latency at long horizons.  This tool measures both sides of that trade
on the real chip so the integration decision is data, not doctrine:

  * latency (B=1): riccati.solve_lq (XLA scan) vs riccati_pscan.solve_lq_pscan
  * throughput context: the fused Pallas sweep path at B=128 for the
    same horizons (what production actually runs)

Run: python tools/pscan_crossover.py [--horizons 50 100 200 400 800]
Results table lives in docs/PERF.md ("Associative-scan Riccati").
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def make_lq(key, N, nx=13, nu=4, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    import numpy as np
    A = (0.9 * jax.random.normal(ks[0], (N, nx, nx), dtype)
         / float(np.sqrt(nx)) + 0.5 * jnp.eye(nx, dtype=dtype))
    B = jax.random.normal(ks[1], (N, nx, nu), dtype)
    c = 0.1 * jax.random.normal(ks[2], (N, nx), dtype)
    qxx = 0.2 + jax.random.uniform(ks[3], (N, nx), dtype)
    ruu = 0.2 + jax.random.uniform(ks[4], (N, nu), dtype)
    qx = jax.random.normal(ks[5], (N, nx), dtype)
    ru = jax.random.normal(ks[6], (N, nu), dtype)
    pT = 0.2 + jax.random.uniform(ks[7], (nx,), dtype)
    return dict(A=A, B=B, c=c,
                Qxx=jax.vmap(jnp.diag)(qxx), qx=qx,
                Ruu=jax.vmap(jnp.diag)(ruu), ru=ru,
                S=jnp.zeros((N, nu, nx), dtype),
                P_term=jnp.diag(pT), p_term=jnp.zeros((nx,), dtype),
                dx0=jax.random.normal(jax.random.PRNGKey(99), (nx,), dtype))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", type=int, nargs="+",
                    default=[50, 100, 200, 400, 800, 1600])
    args = ap.parse_args()

    from crazyflie_nmpc_tpu.ops import riccati, riccati_pscan

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind if hasattr(dev, 'device_kind') else dev}"
          f" ({dev.platform})")

    seq = jax.jit(lambda lq: riccati.solve_lq(**lq))
    par = jax.jit(lambda lq: riccati_pscan.solve_lq_pscan(**lq))

    print(f"{'N':>6} {'seq ms':>10} {'pscan ms':>10} {'speedup':>8}")
    for N in args.horizons:
        lq = make_lq(jax.random.PRNGKey(0), N)
        t_seq = timeit(seq, lq, iters=30)
        t_par = timeit(par, lq, iters=30)
        print(f"{N:>6} {t_seq:>10.3f} {t_par:>10.3f} {t_seq / t_par:>8.2f}x")


if __name__ == "__main__":
    main()
