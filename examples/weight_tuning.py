"""Differentiable MPC: auto-tune the OCP weights by gradient descent.

The reference tunes its 17 cost weights with a dynamic_reconfigure GUI and
a human watching the drone (crazyflie_params.cfg:12-36).  Because this
framework's whole closed loop is one pure traced JAX function, the tuning
loop is just Adam on `jax.grad(objective ∘ simulate)` — the gradient flows
through the plant, the RTI solver, and the fixed-iteration IPM.

Run: python examples/weight_tuning.py   (CPU, a few minutes)
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu import solver
from crazyflie_nmpc_tpu.models import hover_state
from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
from crazyflie_nmpc_tpu.runtime import (
    LoopConfig,
    hover_regulation,
    tune_diagonal_cost,
    hover_objective,
)
from crazyflie_nmpc_tpu.runtime.tuning import spec_with_diag_cost
from crazyflie_nmpc_tpu.utils.cache import setup_compilation_cache


def main():
    setup_compilation_cache()
    # start from a plausibly mis-tuned controller: position weights 100x
    # smaller than the reference's identified values
    q = np.array([1.2, 1.0, 1.0, 1e-3, 1e-3, 1e-3, 1e-3,
                  0.7, 1.0, 4.0, 1e-5, 1e-5, 10.0])
    spec = solver.default_ocp(N=20, tf=0.3, dtype=jnp.float64)
    spec = spec_with_diag_cost(
        spec, jnp.concatenate([jnp.asarray(q), jnp.full((4,), 0.06)]),
        50.0 * jnp.asarray(q))

    x0 = hover_state(spec.params, dtype=jnp.float64
                     ).at[0].set(0.4).at[1].set(-0.3)
    cfg = LoopConfig(ipm=IPMConfig(iters=6))
    rollout = lambda s: hover_regulation(s, x0, steps=45, config=cfg)

    res = tune_diagonal_cost(spec, rollout, hover_objective(),
                             iters=20, lr=0.15)
    losses = np.asarray(res.losses)
    print("objective per Adam step:")
    for i, v in enumerate(losses):
        print(f"  {i:3d}  {v:.5f}" + ("  (untuned)" if i == 0 else ""))
    print(f"tuned stage weights (pos): "
          f"{np.round(np.asarray(res.w_diag[:3]), 3)}  "
          f"(r): {np.round(np.asarray(res.w_diag[13:]), 4)}")
    best = losses.min()
    print(f"improvement: {100 * (1 - best / losses[0]):.1f}% "
          f"({losses[0]:.4f} -> {best:.4f})")


if __name__ == "__main__":
    main()
