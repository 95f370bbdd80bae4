"""Pendulum-on-cart swing-up — a second model family through the engine.

Demonstrates the generic model path (OCPSpec.f): the classic cart-pole
swings up from hanging to upright using the unmodified RTI/SQP machinery
(the same capability the reference gets from acados_template accepting any
CasADi ODE, generate_c_code.py:36).

Run: python examples/cartpole_swing_up.py  (CPU, ~30 s incl. compile)
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu.models import (
    cartpole_dynamics,
    cartpole_ocp,
    downward_state,
)
from crazyflie_nmpc_tpu.ops.integrators import rk4_step
from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
from crazyflie_nmpc_tpu.solver.rti import init_rti, sqp_solve
from crazyflie_nmpc_tpu.utils.cache import setup_compilation_cache


def main():
    setup_compilation_cache()
    spec = cartpole_ocp()
    yref = jnp.zeros((spec.N, 5), jnp.float64)
    yref_e = jnp.zeros((4,), jnp.float64)
    cfg = IPMConfig(iters=12)

    x = downward_state(jnp.float64)
    st = init_rti(spec, x)
    # converged swing-up plan for the first problem, then 3 SQP
    # iterations per tick (AS-RTI-D regime — this transient is too
    # nonlinear for 1-iteration RTI, see solver/rti.py robustness note)
    st, kkts = sqp_solve(spec, st, x, yref, yref_e, iters=60, config=cfg)
    print(f"initial plan: KKT {float(kkts[-1]):.2e}, "
          f"terminal theta {float(st.x_traj[-1, 1]):+.4f} rad")

    @jax.jit
    def tick(st, x):
        st, _ = sqp_solve(spec, st, x, yref, yref_e, iters=3, config=cfg)
        u0 = st.u_traj[0]
        return st, rk4_step(cartpole_dynamics, spec.params, x, u0,
                            spec.dt), u0

    for k in range(140):
        st, x, u0 = tick(st, x)
        if k % 20 == 0:
            p, th = float(x[0]), float(x[1])
            print(f"t={k * float(spec.dt):5.2f}s  p={p:+7.3f} m  "
                  f"theta={th:+7.3f} rad  F={float(u0[0]):+7.2f} N")
    xf = np.asarray(x)
    print(f"final state: p={xf[0]:+.5f} theta={xf[1]:+.5f} "
          f"v={xf[2]:+.5f} dtheta={xf[3]:+.5f}")
    assert abs(xf[1]) < 1e-3, "did not reach upright"
    print("swing-up complete: pole upright, cart centered.")


if __name__ == "__main__":
    main()
