"""Riccati LQ solver vs dense KKT ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crazyflie_nmpc_tpu.ops import riccati


def random_lq(key, N=8, nx=5, nu=3, dtype=jnp.float64):
    ks = jax.random.split(key, 12)
    A = 0.9 * jax.random.normal(ks[0], (N, nx, nx), dtype) / np.sqrt(nx)
    A = A + jnp.eye(nx, dtype=dtype) * 0.5
    B = jax.random.normal(ks[1], (N, nx, nu), dtype)
    c = 0.1 * jax.random.normal(ks[2], (N, nx), dtype)
    Mq = jax.random.normal(ks[3], (N, nx, nx), dtype)
    Qxx = Mq @ jnp.swapaxes(Mq, -1, -2) + 0.5 * jnp.eye(nx, dtype=dtype)
    Mr = jax.random.normal(ks[4], (N, nu, nu), dtype)
    Ruu = Mr @ jnp.swapaxes(Mr, -1, -2) + 0.5 * jnp.eye(nu, dtype=dtype)
    S = 0.1 * jax.random.normal(ks[5], (N, nu, nx), dtype)
    qx = jax.random.normal(ks[6], (N, nx), dtype)
    ru = jax.random.normal(ks[7], (N, nu), dtype)
    Mp = jax.random.normal(ks[8], (nx, nx), dtype)
    P = Mp @ Mp.T + 0.5 * jnp.eye(nx, dtype=dtype)
    p = jax.random.normal(ks[9], (nx,), dtype)
    dx0 = jax.random.normal(ks[10], (nx,), dtype)
    return dict(A=A, B=B, c=c, Qxx=Qxx, qx=qx, Ruu=Ruu, ru=ru, S=S,
                P_term=P, p_term=p, dx0=dx0)


def dense_kkt_solve(lq):
    """Independent ground truth: assemble and solve the dense KKT system
    in numpy (variables z = [dx_0, du_0, ..., du_{N-1}, dx_N], multipliers
    for dynamics + fixed dx_0)."""
    A, B, c = map(np.asarray, (lq["A"], lq["B"], lq["c"]))
    Qxx, qx = np.asarray(lq["Qxx"]), np.asarray(lq["qx"])
    Ruu, ru = np.asarray(lq["Ruu"]), np.asarray(lq["ru"])
    S, P, p = np.asarray(lq["S"]), np.asarray(lq["P_term"]), np.asarray(lq["p_term"])
    dx0 = np.asarray(lq["dx0"])
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]

    nz = (N + 1) * nx + N * nu

    def ix(k):  # dx_k offset
        return k * (nx + nu)

    def iu(k):  # du_k offset
        return k * (nx + nu) + nx

    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N):
        H[ix(k):ix(k) + nx, ix(k):ix(k) + nx] += Qxx[k]
        H[iu(k):iu(k) + nu, iu(k):iu(k) + nu] += Ruu[k]
        H[iu(k):iu(k) + nu, ix(k):ix(k) + nx] += S[k]
        H[ix(k):ix(k) + nx, iu(k):iu(k) + nu] += S[k].T
        g[ix(k):ix(k) + nx] += qx[k]
        g[iu(k):iu(k) + nu] += ru[k]
    H[ix(N):ix(N) + nx, ix(N):ix(N) + nx] += P
    g[ix(N):ix(N) + nx] += p

    ne = (N + 1) * nx
    E = np.zeros((ne, nz))
    e = np.zeros(ne)
    E[0:nx, 0:nx] = np.eye(nx)
    e[0:nx] = dx0
    for k in range(N):
        r = (k + 1) * nx
        E[r:r + nx, ix(k + 1):ix(k + 1) + nx] = np.eye(nx)
        E[r:r + nx, ix(k):ix(k) + nx] = -A[k]
        E[r:r + nx, iu(k):iu(k) + nu] = -B[k]
        e[r:r + nx] = c[k]

    KKT = np.block([[H, E.T], [E, np.zeros((ne, ne))]])
    rhs = np.concatenate([-g, e])
    sol = np.linalg.solve(KKT, rhs)
    z = sol[:nz]
    dx = np.stack([z[ix(k):ix(k) + nx] for k in range(N + 1)])
    du = np.stack([z[iu(k):iu(k) + nu] for k in range(N)])
    return dx, du


@pytest.mark.parametrize("seed", [0, 1])
def test_riccati_matches_dense_kkt(seed):
    lq = random_lq(jax.random.PRNGKey(seed))
    dx, du = riccati.solve_lq(**lq)
    dx_ref, du_ref = dense_kkt_solve(lq)
    np.testing.assert_allclose(np.asarray(dx), dx_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(du), du_ref, rtol=1e-8, atol=1e-9)


def test_riccati_dynamics_feasible():
    lq = random_lq(jax.random.PRNGKey(2))
    dx, du = riccati.solve_lq(**lq)
    lhs = np.asarray(dx[1:])
    rhs = np.asarray(
        jnp.einsum("kij,kj->ki", lq["A"], dx[:-1])
        + jnp.einsum("kij,kj->ki", lq["B"], du) + lq["c"])
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dx[0]), np.asarray(lq["dx0"]),
                               rtol=1e-12)


def test_riccati_vmap_batches():
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    lqs = [random_lq(k) for k in keys]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *lqs)
    dxb, dub = jax.vmap(lambda lq: riccati.solve_lq(**lq))(batched)
    for i, lq in enumerate(lqs):
        dx, du = riccati.solve_lq(**lq)
        np.testing.assert_allclose(np.asarray(dxb[i]), np.asarray(dx),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(dub[i]), np.asarray(du),
                                   rtol=1e-10)


def test_backward_vector_reuses_factorization():
    """Two RHS against one factorization == two full solves."""
    lq = random_lq(jax.random.PRNGKey(4))
    factors = riccati.factorize(lq["A"], lq["B"], lq["Qxx"], lq["Ruu"],
                                lq["S"], lq["P_term"])
    for scale in (1.0, 2.5):
        k_ff, _ = riccati.backward_vector(
            factors, lq["A"], lq["B"], scale * lq["qx"], scale * lq["ru"],
            lq["c"], scale * lq["p_term"])
        dx, du = riccati.forward_rollout(factors, k_ff, lq["A"], lq["B"],
                                         lq["c"], lq["dx0"])
        lq2 = dict(lq, qx=scale * lq["qx"], ru=scale * lq["ru"],
                   p_term=scale * lq["p_term"])
        dx_ref, du_ref = riccati.solve_lq(**lq2)
        np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                                   rtol=1e-10, atol=1e-12)


# ---------------- associative-scan (log-depth) Riccati ---------------------

def test_pscan_cost_to_go_matches_sequential():
    """Parallel-scan cost-to-go == sequential Riccati recursion."""
    from crazyflie_nmpc_tpu.ops import riccati_pscan

    lq = random_lq(jax.random.PRNGKey(21), N=12, nx=7, nu=3)
    fr = riccati.factorize(lq["A"], lq["B"], lq["Qxx"], lq["Ruu"], lq["S"],
                           lq["P_term"])
    kff_ref, p_ref = riccati.backward_vector(
        fr, lq["A"], lq["B"], lq["qx"], lq["ru"], lq["c"], lq["p_term"])
    P, p = riccati_pscan.cost_to_go_pscan(
        lq["A"], lq["B"], lq["c"], lq["Qxx"], lq["qx"], lq["Ruu"],
        lq["ru"], lq["S"], lq["P_term"], lq["p_term"])
    np.testing.assert_allclose(np.asarray(P), np.asarray(fr.P),
                               rtol=1e-9, atol=1e-9)
    # p from backward_vector: compare the full affine cost-to-go sequence
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               rtol=1e-9, atol=1e-9)


def test_pscan_solve_matches_sequential_and_kkt():
    """Full log-depth LQ solve == sequential solve == dense KKT truth."""
    from crazyflie_nmpc_tpu.ops import riccati_pscan

    for seed, N in [(22, 8), (23, 16)]:
        lq = random_lq(jax.random.PRNGKey(seed), N=N, nx=6, nu=2)
        dx_ref, du_ref = riccati.solve_lq(**lq)
        dx, du = riccati_pscan.solve_lq_pscan(
            lq["A"], lq["B"], lq["c"], lq["Qxx"], lq["qx"], lq["Ruu"],
            lq["ru"], lq["S"], lq["P_term"], lq["p_term"], lq["dx0"])
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                                   rtol=1e-8, atol=1e-9)


def test_pscan_factors_match():
    from crazyflie_nmpc_tpu.ops import riccati_pscan

    lq = random_lq(jax.random.PRNGKey(24), N=10, nx=5, nu=3)
    fr_ref = riccati.factorize(lq["A"], lq["B"], lq["Qxx"], lq["Ruu"],
                               lq["S"], lq["P_term"])
    fr = riccati_pscan.factors_pscan(lq["A"], lq["B"], lq["Qxx"],
                                     lq["Ruu"], lq["S"], lq["P_term"])
    np.testing.assert_allclose(np.asarray(fr.P), np.asarray(fr_ref.P),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(fr.K), np.asarray(fr_ref.K),
                               rtol=1e-8, atol=1e-9)
