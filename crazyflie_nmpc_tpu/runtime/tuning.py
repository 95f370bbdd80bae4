"""Differentiable MPC: gradient-based auto-tuning of the OCP cost.

A capability the reference architecture cannot offer: its weights live in a
dynamic_reconfigure GUI panel and are tuned by a human watching the drone
(crazyflie_params.cfg:12-36 — and the panel was dead anyway, SET_WEIGHTS=0
compiled the update out, acados_mpc.cpp:110,596-602).  Here the entire
closed loop — ERK4 plant, RTI solver, fixed-iteration IPM, delay pipeline —
is one pure traced JAX function, so `jax.grad` differentiates a scalar
flight-quality objective **through the solver** with respect to the cost
weights, and a few dozen Adam steps replace the human.

Works for any diagonal LLS cost spec (the quadrotor and the cart-pole
alike): weights are parameterized in log-space (positivity by
construction), the meta-objective is measured in physical units (position
error, control effort) so the tuned weights cannot cheat by rescaling
themselves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.solver.ocp import OCPSpec


class TuneResult(NamedTuple):
    spec: Any        # OCPSpec with the tuned cost
    losses: Any      # (iters+1,) objective per iteration (incl. initial)
    w_diag: Any      # (ny,) tuned stage weight diagonal
    we_diag: Any     # (nx_e,) tuned terminal weight diagonal


def spec_with_diag_cost(spec: OCPSpec, w_diag, we_diag) -> OCPSpec:
    """Rebuild the spec with new diagonal W / W_e (selectors unchanged)."""
    cost = dataclasses.replace(spec.cost, W=jnp.diag(w_diag),
                               W_e=jnp.diag(we_diag))
    return dataclasses.replace(spec, cost=cost)


def tune_diagonal_cost(spec: OCPSpec,
                       rollout: Callable[[OCPSpec], Any],
                       objective: Callable[[Any], jax.Array],
                       iters: int = 30, lr: float = 0.1) -> TuneResult:
    """Tune log-diagonal cost weights by Adam on a closed-loop objective.

    Args:
      rollout: spec -> anything (typically `runtime.closed_loop.simulate`
        output); must be differentiable w.r.t. the spec's cost leaves.
      objective: rollout output -> scalar loss in physical units.
      iters / lr: Adam steps and learning rate on log-weights.

    Returns TuneResult with the BEST-seen weights (not necessarily the
    last iterate); `losses[0]` is the untuned objective so callers can
    assert improvement.
    """
    import optax

    # floor zero diagonal entries: log(0) = -inf would give nan gradients
    # that poison every weight through Adam; exp(log(floor)) ~ 1e-12 keeps
    # an unpenalized channel effectively unpenalized while staying tunable
    floor = 1e-12
    w0 = jnp.maximum(jnp.diagonal(spec.cost.W), floor)
    we0 = jnp.maximum(jnp.diagonal(spec.cost.W_e), floor)
    theta0 = (jnp.log(w0), jnp.log(we0))

    def loss_fn(theta):
        s = spec_with_diag_cost(spec, jnp.exp(theta[0]), jnp.exp(theta[1]))
        return objective(rollout(s))

    opt = optax.adam(lr)
    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))
    # forward-only graph for the final readback: compiling the full
    # differentiated closed loop a second time would ~double compile cost
    loss_only = jax.jit(loss_fn)

    @jax.jit
    def step(theta, opt_state):
        val, g = value_and_grad(theta)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(theta, updates), opt_state, val

    theta = theta0
    opt_state = opt.init(theta)
    losses = []
    best_theta, best_val = theta0, jnp.inf
    for _ in range(iters):
        new_theta, opt_state, val = step(theta, opt_state)
        # `val` is the objective at `theta` (before the update); keep the
        # best iterate seen — Adam on this landscape can overshoot late
        if float(val) < float(best_val):
            best_theta, best_val = theta, val
        theta = new_theta
        losses.append(val)
    # losses[0] is the untuned objective; append the final iterate's.
    final = loss_only(theta)
    if float(final) < float(best_val):
        best_theta = theta
    losses = jnp.stack(losses + [final])
    w, we = jnp.exp(best_theta[0]), jnp.exp(best_theta[1])
    return TuneResult(spec=spec_with_diag_cost(spec, w, we),
                      losses=losses, w_diag=w, we_diag=we)


def hover_objective(setpoint=(0.0, 0.0, 0.5), u_weight: float = 1e-5,
                    settle_weight: float = 4.0):
    """Physical-units flight-quality objective for a hover LoopResult:
    mean squared position error + control-effort penalty + extra weight on
    the late-trajectory (settling) error."""
    sp = jnp.asarray(setpoint)

    def obj(res):
        pos_err = jnp.sum((res.x[:, :3] - sp) ** 2, axis=1)
        T = pos_err.shape[0]
        tail = pos_err[int(0.6 * T):]
        du = jnp.diff(res.u, axis=0)
        return (jnp.mean(pos_err) + settle_weight * jnp.mean(tail)
                + u_weight * jnp.mean(jnp.sum(du ** 2, axis=1)))

    return obj
