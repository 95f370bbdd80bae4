"""Pallas kernel parity vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crazyflie_nmpc_tpu.ops import ipm, ipm_fast, riccati
from crazyflie_nmpc_tpu.ops.pallas import riccati_kernels as rk
from crazyflie_nmpc_tpu.ops.qp import QPData

from test_ipm import make_qp
from test_riccati import random_lq

B = 8
N = 10
NXD, NUD = 13, 4
KERN = dict(block_b=B, stages_per_step=5, interpret=True)


def batch_lq(key):
    keys = jax.random.split(key, B)
    lqs = [random_lq(k, N=N, nx=NXD, nu=NUD, dtype=jnp.float32)
           for k in keys]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs).astype(jnp.float32),
                           *lqs)
    return batched


def bl(x):
    return jnp.moveaxis(x, 0, -1)


def test_backward_forward_match_sequential():
    lq = batch_lq(jax.random.PRNGKey(0))
    fr = jax.vmap(riccati.factorize)(lq["A"], lq["B"], lq["Qxx"], lq["Ruu"],
                                     lq["S"], lq["P_term"])
    kf_ref, _ = jax.vmap(riccati.backward_vector)(
        fr, lq["A"], lq["B"], lq["qx"], lq["ru"], lq["c"], lq["p_term"])
    dx_ref, du_ref = jax.vmap(riccati.forward_rollout)(
        fr, kf_ref, lq["A"], lq["B"], lq["c"], lq["dx0"])

    K, kff, L, Pn = rk.backward_sweep(
        bl(lq["A"]), bl(lq["B"]), bl(lq["c"]), bl(lq["Qxx"]), bl(lq["qx"]),
        bl(lq["Ruu"]), bl(lq["ru"]), bl(lq["S"]), bl(lq["P_term"]),
        bl(lq["p_term"]), **KERN)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(K, -1, 0)),
                               np.asarray(fr.K), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(Pn, -1, 0)),
                               np.asarray(fr.P[:, 1:]), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(kff, -1, 0)),
                               np.asarray(kf_ref), rtol=2e-4, atol=2e-4)

    dx, du = rk.forward_sweep(bl(lq["A"]), bl(lq["B"]), bl(lq["c"]), K, kff,
                              bl(lq["dx0"]), **KERN)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(du, -1, 0)),
                               np.asarray(du_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(dx, -1, 0)),
                               np.asarray(dx_ref), rtol=2e-4, atol=2e-4)


def test_vector_sweep_second_rhs():
    lq = batch_lq(jax.random.PRNGKey(1))
    fr = jax.vmap(riccati.factorize)(lq["A"], lq["B"], lq["Qxx"], lq["Ruu"],
                                     lq["S"], lq["P_term"])
    kf2_ref, _ = jax.vmap(riccati.backward_vector)(
        fr, lq["A"], lq["B"], 2.0 * lq["qx"], -0.5 * lq["ru"], lq["c"],
        0.3 * lq["p_term"])

    K, kff, L, Pn = rk.backward_sweep(
        bl(lq["A"]), bl(lq["B"]), bl(lq["c"]), bl(lq["Qxx"]), bl(lq["qx"]),
        bl(lq["Ruu"]), bl(lq["ru"]), bl(lq["S"]), bl(lq["P_term"]),
        bl(lq["p_term"]), **KERN)
    kff2 = rk.backward_vector_sweep(
        bl(lq["A"]), bl(lq["B"]), bl(lq["c"]), bl(2.0 * lq["qx"]),
        bl(-0.5 * lq["ru"]), K, L, Pn, bl(0.3 * lq["p_term"]), **KERN)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(kff2, -1, 0)),
                               np.asarray(kf2_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bounded", [False, True])
def test_ipm_fast_matches_ipm(bounded):
    """Full fast-IPM vs reference IPM on a batch of bounded QPs."""
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    qps = []
    for k in keys:
        qp_inf, lq = make_qp(k, N=N, nx=NXD, nu=NUD)
        if bounded:
            _, du_ref = riccati.solve_lq(**lq)
            lim = 0.5 * float(jnp.max(jnp.abs(du_ref)))
            qp_inf = QPData(**{**qp_inf.__dict__,
                               "lb": jnp.full_like(qp_inf.lb, -lim),
                               "ub": jnp.full_like(qp_inf.ub, lim)})
        qps.append(qp_inf)
    batched = jax.tree.map(
        lambda *xs: jnp.stack(xs).astype(jnp.float32), *qps)

    cfg = ipm.IPMConfig(iters=8)
    ref = jax.vmap(lambda q: ipm.solve(q, cfg))(batched)
    fast = ipm_fast.solve_batched(ipm_fast.from_qpdata(batched), cfg,
                                  **KERN)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(fast.du, -1, 0)),
                               np.asarray(ref.du), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(fast.dx, -1, 0)),
                               np.asarray(ref.dx), rtol=5e-3, atol=5e-4)


def test_rti_step_batched_matches_rti_step():
    from crazyflie_nmpc_tpu.models import hover_state, NX
    from crazyflie_nmpc_tpu.solver import (
        default_ocp,
        hover_yref,
        init_rti,
        rti_step,
    )
    from crazyflie_nmpc_tpu.solver.rti_batched import rti_step_batched

    spec = default_ocp(N=10, dtype=jnp.float32)
    yref, yref_e = hover_yref(spec)
    key = jax.random.PRNGKey(3)
    x0s = (hover_state(spec.params, dtype=jnp.float32)[None, :]
           + 0.03 * jax.random.normal(key, (B, NX), jnp.float32))
    states = jax.vmap(lambda x: init_rti(spec, x))(x0s)
    cfg = ipm.IPMConfig(iters=6)

    new_b, out_b = rti_step_batched(spec, states, x0s, yref, yref_e, cfg,
                                    block_b=B, stages_per_step=5,
                                    interpret=True)
    for i in range(0, B, 3):
        si = jax.tree.map(lambda a: a[i], states)
        _, oi = rti_step(spec, si, x0s[i], yref, yref_e, cfg)
        np.testing.assert_allclose(np.asarray(out_b.u0[i]),
                                   np.asarray(oi.u0), rtol=1e-3, atol=1e-3)
