"""Partial condensing: reduced solve must match the full-horizon solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crazyflie_nmpc_tpu.ops import condensing, ipm, riccati
from crazyflie_nmpc_tpu.ops.qp import QPData

from test_ipm import make_qp

CFG = ipm.IPMConfig(iters=20)


@pytest.mark.parametrize("block", [1, 2, 4, 8])
def test_condensed_unconstrained_matches_riccati(block):
    qp, lq = make_qp(jax.random.PRNGKey(0), N=8)
    dx_ref, du_ref = riccati.solve_lq(**lq)
    sol = condensing.solve_partial(qp, block, CFG)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(du_ref),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.dx), np.asarray(dx_ref),
                               rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("block", [2, 4])
def test_condensed_constrained_matches_full_ipm(block):
    qp_inf, lq = make_qp(jax.random.PRNGKey(3), N=8)
    _, du_ref = riccati.solve_lq(**lq)
    lim = 0.4 * float(jnp.max(jnp.abs(du_ref)))
    qp = QPData(**{**qp_inf.__dict__,
                   "lb": jnp.full_like(qp_inf.lb, -lim),
                   "ub": jnp.full_like(qp_inf.ub, lim)})
    sol_full = ipm.solve(qp, CFG)
    sol_cond = condensing.solve_partial(qp, block, CFG)
    np.testing.assert_allclose(np.asarray(sol_cond.du),
                               np.asarray(sol_full.du), rtol=1e-6, atol=1e-8)
    # expansion must satisfy the original dynamics exactly
    dyn = (np.asarray(sol_cond.dx[1:])
           - np.einsum("kij,kj->ki", np.asarray(qp.A),
                       np.asarray(sol_cond.dx[:-1]))
           - np.einsum("kij,kj->ki", np.asarray(qp.B),
                       np.asarray(sol_cond.du))
           - np.asarray(qp.c))
    assert np.max(np.abs(dyn)) < 1e-10
    # bounds respected after expansion
    assert np.asarray(sol_cond.du).max() <= lim + 1e-9
    assert np.asarray(sol_cond.du).min() >= -lim - 1e-9
