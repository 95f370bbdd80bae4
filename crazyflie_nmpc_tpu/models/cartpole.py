"""Pendulum-on-cart model — the second model family through the same engine.

The reference's model layer is generic by construction: any CasADi ODE
becomes an `AcadosModel` and flows through generate_c_code.py:36-157 into
the same SQP-RTI solver the quadrotor uses (the pendulum-on-cart is the
acados project's own flagship example of exactly that path).  Here the
equivalent capability is `OCPSpec.f`: any JAX callable `f(params, x, u)`
slots into `solver.rti.rti_step` with jacfwd linearization — this module
is the proof, and `tests/test_cartpole.py` swings the pendulum up with the
unmodified RTI machinery.

4 states: cart position p [m], pole angle theta [rad] (0 = upright),
cart velocity v, pole angular rate dtheta.  1 control: horizontal force
F [N] on the cart.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

CP_NX = 4
CP_NU = 1
CP_NY = CP_NX + CP_NU

STATE_NAMES = ("p", "theta", "v", "dtheta")
CONTROL_NAMES = ("F",)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CartpoleParams:
    """Physical parameters (classic benchmark values).  All fields are
    pytree leaves — (B,)-shaped arrays batch the model under vmap."""

    g0: Any = 9.81    # [m/s^2]
    M: Any = 1.0      # [kg] cart mass
    m: Any = 0.1      # [kg] pole point mass
    l: Any = 0.8      # [m] pole length (pivot to mass)

    def hover_speed(self):
        """Steady-state input (zero force at the upright equilibrium) —
        same warm-start role as the quadrotor's hover speed."""
        return jnp.asarray(0.0)


def cartpole_dynamics(params: CartpoleParams, x: jax.Array,
                      u: jax.Array) -> jax.Array:
    """xdot = f(params, x, u): frictionless pendulum on a cart.

    Lagrangian dynamics with theta measured from the upright position;
    written as last-axis column algebra so vmap lands batch on the VPU
    lanes (same convention as models/quadrotor.py).
    """
    theta = x[..., 1]
    v = x[..., 2]
    dtheta = x[..., 3]
    F = u[..., 0]

    s, c = jnp.sin(theta), jnp.cos(theta)
    denom = params.M + params.m * s * s
    dv = (F + params.m * s * (params.l * dtheta * dtheta
                              - params.g0 * c)) / denom
    ddtheta = (-F * c
               - params.m * params.l * dtheta * dtheta * s * c
               + (params.M + params.m) * params.g0 * s) / (params.l * denom)
    return jnp.stack([v, dtheta, dv, ddtheta], axis=-1)


def upright_state(dtype=jnp.float32) -> jax.Array:
    return jnp.zeros((CP_NX,), dtype)


def downward_state(dtype=jnp.float32) -> jax.Array:
    """Pole hanging straight down — the swing-up initial condition."""
    return jnp.array([0.0, jnp.pi, 0.0, 0.0], dtype)


def cartpole_ocp(params: CartpoleParams | None = None, N: int = 40,
                 tf: float = 2.0, f_max: float = 80.0,
                 q_diag=(1e1, 1e1, 1e-1, 1e-2), r_diag=(1e-3,),
                 terminal_factor: float = 50.0, dtype=jnp.float64):
    """An `OCPSpec` for cart-pole swing-up through the generic RTI path.

    Same LLS cost structure as the quadrotor OCP (W = blkdiag(Q, R),
    W_e = terminal_factor * Q, selector Vx/Vu) with a force box |F| <= f_max
    — i.e. the exact shape generate_c_code.py:62-136 builds, for a
    different model.
    """
    from crazyflie_nmpc_tpu.solver.ocp import OCPSpec, diagonal_lls_cost

    params = params or CartpoleParams()
    cost = diagonal_lls_cost(q_diag, r_diag, terminal_factor, dtype)
    return OCPSpec(
        params=params,
        cost=cost,
        lbu=jnp.full((CP_NU,), -f_max, dtype),
        ubu=jnp.full((CP_NU,), f_max, dtype),
        tf=jnp.asarray(tf, dtype),
        N=N,
        f=cartpole_dynamics,
        u_ss=jnp.zeros((CP_NU,), dtype),
    )
