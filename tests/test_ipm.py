"""IPM QP solver: KKT-condition verification against independent checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crazyflie_nmpc_tpu.ops import ipm, riccati
from crazyflie_nmpc_tpu.ops.qp import QPData

from test_riccati import dense_kkt_solve, random_lq


def make_qp(key, N=8, nx=5, nu=3, lb=None, ub=None):
    lq = random_lq(key, N=N, nx=nx, nu=nu)
    if lb is None:
        lb = jnp.full((N, nu), -jnp.inf)
    if ub is None:
        ub = jnp.full((N, nu), jnp.inf)
    return QPData(A=lq["A"], B=lq["B"], c=lq["c"], Qxx=lq["Qxx"],
                  qx=lq["qx"], Ruu=lq["Ruu"], ru=lq["ru"], S=lq["S"],
                  P=lq["P_term"], p=lq["p_term"], lb=jnp.asarray(lb),
                  ub=jnp.asarray(ub), dx0=lq["dx0"]), lq


def test_unconstrained_matches_riccati():
    """With infinite bounds the IPM must reproduce the equality solve."""
    qp, lq = make_qp(jax.random.PRNGKey(0))
    sol = ipm.solve(qp, ipm.IPMConfig(iters=3))
    dx_ref, du_ref = riccati.solve_lq(**lq)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(du_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.dx), np.asarray(dx_ref),
                               rtol=1e-8, atol=1e-10)


def test_inactive_bounds_match_unconstrained():
    """Loose bounds -> same solution as unconstrained."""
    qp_inf, lq = make_qp(jax.random.PRNGKey(1))
    dx_ref, du_ref = riccati.solve_lq(**lq)
    wide = 10.0 * float(jnp.max(jnp.abs(du_ref))) + 10.0
    qp = QPData(**{**qp_inf.__dict__,
                   "lb": jnp.full_like(qp_inf.lb, -wide),
                   "ub": jnp.full_like(qp_inf.ub, wide)})
    sol = ipm.solve(qp, ipm.IPMConfig(iters=20))
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(du_ref),
                               rtol=1e-7, atol=1e-8)


def _kkt_residuals(qp, sol):
    """Independent KKT check in numpy: stationarity via the dense KKT
    formulation with bound duals, feasibility, complementarity."""
    A, B, c = map(np.asarray, (qp.A, qp.B, qp.c))
    N, nx, nu = A.shape[0], A.shape[1], B.shape[2]
    dx, du = np.asarray(sol.dx), np.asarray(sol.du)
    lam_l, lam_u = np.asarray(sol.lam_l), np.asarray(sol.lam_u)
    lb, ub = np.asarray(qp.lb), np.asarray(qp.ub)

    # dynamics feasibility
    dyn = dx[1:] - (np.einsum("kij,kj->ki", A, dx[:-1])
                    + np.einsum("kij,kj->ki", B, du) + c)
    res = dict(dyn=np.max(np.abs(dyn)),
               x0=np.max(np.abs(dx[0] - np.asarray(qp.dx0))))

    # bound feasibility (infinite bounds masked BEFORE the arithmetic —
    # np.where still evaluates both arms, and inf*0 raises a warning)
    lb_f = np.where(np.isfinite(lb), lb, 0.0)
    ub_f = np.where(np.isfinite(ub), ub, 0.0)
    viol_l = np.maximum(np.where(np.isfinite(lb), lb_f - du, 0.0), 0.0)
    viol_u = np.maximum(np.where(np.isfinite(ub), du - ub_f, 0.0), 0.0)
    res["bound"] = max(viol_l.max(), viol_u.max())

    # complementarity
    comp_l = np.where(np.isfinite(lb), lam_l * (du - lb_f), 0.0)
    comp_u = np.where(np.isfinite(ub), lam_u * (ub_f - du), 0.0)
    res["comp"] = max(np.abs(comp_l).max(), np.abs(comp_u).max())
    res["dual_pos"] = min(lam_l.min(), lam_u.min())

    # stationarity, checked in condensed (du-only) space to avoid costate
    # sign conventions entirely: eliminate dx = G du + h via the dynamics,
    # then the reduced KKT is  H_c du + g_c - lam_l + lam_u = 0.
    Qxx, qx = np.asarray(qp.Qxx), np.asarray(qp.qx)
    Ruu, ru = np.asarray(qp.Ruu), np.asarray(qp.ru)
    S = np.asarray(qp.S)
    P, p = np.asarray(qp.P), np.asarray(qp.p)
    nv = N * nu
    # G[k]: (nx, nv) sensitivity of dx_k to du; h[k]: affine part
    G = np.zeros((N + 1, nx, nv))
    h = np.zeros((N + 1, nx))
    h[0] = np.asarray(qp.dx0)
    for k in range(N):
        G[k + 1] = A[k] @ G[k]
        G[k + 1][:, k * nu:(k + 1) * nu] += B[k]
        h[k + 1] = A[k] @ h[k] + c[k]
    H_c = np.zeros((nv, nv))
    g_c = np.zeros(nv)
    for k in range(N):
        H_c += G[k].T @ Qxx[k] @ G[k]
        g_c += G[k].T @ (Qxx[k] @ h[k] + qx[k])
        sl = slice(k * nu, (k + 1) * nu)
        H_c[sl, sl] += Ruu[k]
        H_c[sl, :] += S[k] @ G[k]
        H_c[:, sl] += (S[k] @ G[k]).T
        g_c[sl] += ru[k] + S[k] @ h[k]
    H_c += G[N].T @ P @ G[N]
    g_c += G[N].T @ (P @ h[N] + p)
    # dual stationarity (limited by dual convergence, looser)
    stat = (H_c @ du.reshape(-1) + g_c
            - lam_l.reshape(-1) + lam_u.reshape(-1))
    res["stat_u"] = np.max(np.abs(stat))
    # primal optimality: projected-gradient fixed point (tight)
    duv = du.reshape(-1)
    lbv, ubv = lb.reshape(-1), ub.reshape(-1)
    step = (H_c @ duv + g_c) / np.linalg.norm(H_c, 2)
    res["fixed_point"] = np.max(np.abs(duv - np.clip(duv - step, lbv, ubv)))
    return res


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_active_bounds_kkt(seed):
    """Tight bounds so some constraints activate; verify full KKT to 1e-7."""
    key = jax.random.PRNGKey(seed)
    qp_inf, lq = make_qp(key)
    dx_ref, du_ref = riccati.solve_lq(**lq)
    # clamp at 40% of the unconstrained range -> guaranteed active set
    lim = 0.4 * float(jnp.max(jnp.abs(du_ref)))
    qp = QPData(**{**qp_inf.__dict__,
                   "lb": jnp.full_like(qp_inf.lb, -lim),
                   "ub": jnp.full_like(qp_inf.ub, lim)})
    sol = ipm.solve(qp, ipm.IPMConfig(iters=25))
    res = _kkt_residuals(qp, sol)
    assert res["dyn"] < 1e-8, res
    assert res["x0"] < 1e-12, res
    assert res["bound"] < 1e-9, res
    assert res["comp"] < 1e-7, res
    assert res["fixed_point"] < 1e-10, res
    assert res["stat_u"] < 1e-3, res
    assert res["dual_pos"] >= 0.0
    # constraints actually active
    assert float(jnp.max(jnp.abs(sol.du))) > 0.99 * lim


def test_one_sided_bounds():
    """Only lower bounds finite (upper infinite) — masked path."""
    key = jax.random.PRNGKey(11)
    qp_inf, lq = make_qp(key)
    dx_ref, du_ref = riccati.solve_lq(**lq)
    lim = 0.3 * float(jnp.max(jnp.abs(du_ref)))
    qp = QPData(**{**qp_inf.__dict__,
                   "lb": jnp.full_like(qp_inf.lb, -lim)})
    sol = ipm.solve(qp, ipm.IPMConfig(iters=25))
    res = _kkt_residuals(qp, sol)
    assert res["dyn"] < 1e-8
    assert res["bound"] < 1e-9
    assert res["comp"] < 1e-7
    assert res["fixed_point"] < 1e-10
    assert res["stat_u"] < 1e-3


def test_vmap_batch_of_qps():
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    qps = []
    for k in keys:
        qp_inf, lq = make_qp(k)
        _, du_ref = riccati.solve_lq(**lq)
        lim = 0.5 * float(jnp.max(jnp.abs(du_ref)))
        qps.append(QPData(**{**qp_inf.__dict__,
                             "lb": jnp.full_like(qp_inf.lb, -lim),
                             "ub": jnp.full_like(qp_inf.ub, lim)}))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    cfg = ipm.IPMConfig(iters=20)
    sols = jax.vmap(lambda q: ipm.solve(q, cfg))(batched)
    for i, qp in enumerate(qps):
        single = ipm.solve(qp, cfg)
        np.testing.assert_allclose(np.asarray(sols.du[i]),
                                   np.asarray(single.du), rtol=1e-6,
                                   atol=1e-8)


def test_stats_reported():
    qp, _ = make_qp(jax.random.PRNGKey(9), lb=-1.0 * jnp.ones((8, 3)),
                    ub=1.0 * jnp.ones((8, 3)))
    sol = ipm.solve(qp, ipm.IPMConfig(iters=15))
    assert float(sol.stats["mu"]) < 1e-10
    assert float(sol.stats["res_eq"]) < 1e-10
    assert sol.stats["alphas"].shape == (15,)
