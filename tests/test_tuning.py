"""Differentiable MPC: jax.grad through the full closed loop.

The whole pipeline (ERK4 plant -> RTI -> fixed-iteration IPM -> delay
pipeline) is pure traced JAX, so a flight-quality objective is
differentiable w.r.t. the OCP cost weights — the capability the
reference's (dead) dynamic_reconfigure weight panel gestured at
(crazyflie_params.cfg:12-36; SET_WEIGHTS=0 bug acados_mpc.cpp:110).
"""

import functools
import os
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu import solver
from crazyflie_nmpc_tpu.models import hover_state
from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
from crazyflie_nmpc_tpu.runtime import tuning
from crazyflie_nmpc_tpu.runtime.closed_loop import (
    LoopConfig,
    hover_regulation,
)


_IN_SUBPROC = os.environ.get("CFTPU_TUNING_SUBPROC") == "1"


def _isolated(fn):
    """Run the test body in a fresh interpreter (pytest re-invocation).

    The scan-transpose graphs in these grad-through-the-solver tests are
    the largest XLA compiles in the suite; under full-suite memory
    pressure on small hosts the in-process compile can SIGSEGV (observed:
    exit 139 inside the remat transpose after ~160 green tests, while the
    same test passes in isolation).  A fresh process compiles the same
    graph comfortably and hits the persistent compilation cache on repeat
    runs.  Same isolation idea as test_distributed.py's worker pattern.
    """

    @functools.wraps(fn)
    def wrapper():
        if _IN_SUBPROC:
            return fn()
        env = dict(os.environ, CFTPU_TUNING_SUBPROC="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{os.path.abspath(__file__)}::{fn.__name__}",
             "-x", "-q", "-p", "no:cacheprovider"],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (
            f"{fn.__name__} failed in isolated subprocess "
            f"(rc={r.returncode}):\n{r.stdout[-4000:]}\n{r.stderr[-2000:]}")

    return wrapper


def _detuned_spec():
    """The reference OCP with position weights 100x too small (a plausibly
    mis-tuned controller), short horizon to keep the test light."""
    q = np.array([1.2, 1.0, 1.0, 1e-3, 1e-3, 1e-3, 1e-3,
                  0.7, 1.0, 4.0, 1e-5, 1e-5, 10.0])
    spec = solver.default_ocp(N=15, tf=0.225, dtype=jnp.float64)
    w = jnp.concatenate([jnp.asarray(q), jnp.full((4,), 0.06)])
    return tuning.spec_with_diag_cost(spec, w, 50.0 * jnp.asarray(q))


def test_gradient_flows_through_solver():
    """d(objective)/d(log W) through plant+RTI+IPM is finite and nonzero."""
    spec = _detuned_spec()
    x0 = hover_state(spec.params, dtype=jnp.float64).at[0].set(0.4)
    cfg = LoopConfig(ipm=IPMConfig(iters=5))
    obj = tuning.hover_objective()

    def loss(logw):
        s = tuning.spec_with_diag_cost(
            spec, jnp.exp(logw), jnp.diagonal(spec.cost.W_e))
        return obj(hover_regulation(s, x0, steps=20, config=cfg))

    g = jax.grad(loss)(jnp.log(jnp.diagonal(spec.cost.W)))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 1e-6  # the solver is not a constant
    # increasing the x-position weight from the de-tuned value must REDUCE
    # the physical position-error objective: negative gradient
    assert g[0] < 0.0, g


def test_tune_diagonal_cost_improves_hover():
    spec = _detuned_spec()
    x0 = hover_state(spec.params, dtype=jnp.float64
                     ).at[0].set(0.4).at[1].set(-0.3)
    cfg = LoopConfig(ipm=IPMConfig(iters=5))
    roll = lambda s: hover_regulation(s, x0, steps=30, config=cfg)
    obj = tuning.hover_objective()

    res = tuning.tune_diagonal_cost(spec, roll, obj, iters=8, lr=0.15)
    first, best = float(res.losses[0]), float(obj(roll(res.spec)))
    assert best < 0.6 * first, (first, best)  # >= 40% objective reduction
    # tuned position weights moved up from the de-tuned start
    assert float(res.w_diag[0]) > 1.2
    assert np.all(np.asarray(res.w_diag) > 0)  # log-space: positive


@_isolated
def test_remat_gradients_match():
    """LoopConfig(remat=True) recomputes ticks in the backward pass; the
    gradient must match the stored-activations gradient exactly while
    enabling long-horizon tuning memory."""
    spec = _detuned_spec()
    x0 = hover_state(spec.params, dtype=jnp.float64).at[0].set(0.4)
    obj = tuning.hover_objective()

    def loss(logw, remat):
        s = tuning.spec_with_diag_cost(
            spec, jnp.exp(logw), jnp.diagonal(spec.cost.W_e))
        cfg = LoopConfig(ipm=IPMConfig(iters=4), remat=remat)
        return obj(hover_regulation(s, x0, steps=12, config=cfg))

    logw = jnp.log(jnp.diagonal(spec.cost.W))
    g_plain = jax.grad(lambda t: loss(t, False))(logw)
    g_remat = jax.grad(lambda t: loss(t, True))(logw)
    np.testing.assert_allclose(np.asarray(g_remat), np.asarray(g_plain),
                               rtol=1e-9, atol=1e-12)
