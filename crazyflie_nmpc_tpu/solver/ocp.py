"""OCP specification: dims, cost, bounds — the reference problem as data.

Replaces the reference's codegen-time problem description
(crazyflie_controller/scripts/crazyflie_full_model/generate_c_code.py:36-147):
instead of rendering C sources, the spec is a pytree consumed by traced JAX
functions.  `default_ocp()` reproduces the exact reference problem: N=50,
Tf=0.75 s, W=blkdiag(Q,R) with the reference diagonals, W_e=50Q, input box
[0, 22] kRPM.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu.models.quadrotor import (
    NU,
    NX,
    NY,
    QuadrotorParams,
    W_MAX_KRPM,
    W_MIN_KRPM,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CostSpec:
    """Linear-least-squares tracking cost |Vx x + Vu u - yref|^2_W.

    Mirrors acados' LINEAR_LS cost module configured in
    generate_c_code.py:62-129 (W, Vx, Vu, W_e, Vx_e).
    """

    W: Any     # (ny, ny)
    Vx: Any    # (ny, nx)
    Vu: Any    # (ny, nu)
    W_e: Any   # (nx_e, nx_e)
    Vx_e: Any  # (nx_e, nx)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OCPSpec:
    """Full optimal-control-problem spec for the RTI solver.

    N and sim_steps are static (shape-determining); everything else is traced
    data, so weights/bounds/params can be changed at runtime without
    recompilation — the capability the reference *intended* with its
    dynamic_reconfigure weight panel but compiled out (SET_WEIGHTS=0,
    acados_mpc.cpp:110,596-602).
    """

    params: QuadrotorParams
    cost: CostSpec
    lbu: Any   # (nu,) absolute lower input bound [kRPM]
    ubu: Any   # (nu,) absolute upper input bound [kRPM]
    tf: Any    # horizon length [s]
    N: int = dataclasses.field(default=50, metadata=dict(static=True))
    sim_steps: int = dataclasses.field(default=1, metadata=dict(static=True))
    # the ODE xdot = f(params, x, u).  The reference's model layer is
    # user-pluggable (any CasADi AcadosModel through generate_c_code.py:36);
    # here any JAX callable slots into the same generic RTI machinery.
    # None selects the Crazyflie quadrotor (models/quadrotor.py).  The fused
    # batch-last kernels (rti_batched/ipm_fast) remain quadrotor-specialized.
    f: Any = dataclasses.field(default=None, metadata=dict(static=True))
    # steady-state input used to seed the RTI warm start; None selects the
    # quadrotor hover speed (params.hover_speed() broadcast to (nu,)).
    u_ss: Any = None

    def ode(self):
        """The model ODE (f or the quadrotor default)."""
        if self.f is not None:
            return self.f
        from crazyflie_nmpc_tpu.models.quadrotor import dynamics
        return dynamics

    def steady_input(self, dtype):
        """(nu,) warm-start input: u_ss, or hover speed on all rotors."""
        import jax.numpy as _jnp

        if self.u_ss is not None:
            return _jnp.asarray(self.u_ss, dtype)
        nu = self.lbu.shape[0]
        return _jnp.full((nu,), self.params.hover_speed()).astype(dtype)

    @property
    def dt(self):
        return self.tf / self.N


# Reference stage weight diagonals (generate_c_code.py:62-84).
Q_DIAG_REF = np.array([120.0, 100.0, 100.0,          # position
                       1e-3, 1e-3, 1e-3, 1e-3,        # quaternion
                       7e-1, 1.0, 4.0,                 # body velocity
                       1e-5, 1e-5, 10.0])              # body rates
R_DIAG_REF = np.array([0.06, 0.06, 0.06, 0.06])       # rotor speeds
WN_FACTOR_REF = 50.0                                   # W_e = 50 Q (:109)


def diagonal_lls_cost(q_diag, r_diag, terminal_factor=WN_FACTOR_REF,
                      dtype=jnp.float32) -> CostSpec:
    """Diagonal LLS cost for any model dims: W = blkdiag(Q, R),
    W_e = terminal_factor * Q, selector Vx/Vu — the exact structure
    generate_c_code.py:62-129 builds, with nx/nu inferred from the
    diagonals."""
    q_diag = jnp.asarray(q_diag, dtype)
    r_diag = jnp.asarray(r_diag, dtype)
    nx, nu = q_diag.shape[0], r_diag.shape[0]
    ny = nx + nu
    W = jnp.diag(jnp.concatenate([q_diag, r_diag]))
    Vx = jnp.zeros((ny, nx), dtype).at[:nx, :].set(jnp.eye(nx, dtype=dtype))
    Vu = jnp.zeros((ny, nu), dtype).at[nx:, :].set(jnp.eye(nu, dtype=dtype))
    W_e = jnp.diag(terminal_factor * q_diag)
    Vx_e = jnp.eye(nx, dtype=dtype)
    return CostSpec(W=W, Vx=Vx, Vu=Vu, W_e=W_e, Vx_e=Vx_e)


def default_cost(q_diag=Q_DIAG_REF, r_diag=R_DIAG_REF,
                 terminal_factor=WN_FACTOR_REF, dtype=jnp.float32) -> CostSpec:
    """The reference cost: W = blkdiag(Q, R), W_e = 50 Q, selector Vx/Vu."""
    return diagonal_lls_cost(q_diag, r_diag, terminal_factor, dtype)


def default_ocp(params: QuadrotorParams | None = None, N: int = 50,
                tf: float = 0.75, sim_steps: int = 1,
                dtype=jnp.float32) -> OCPSpec:
    """The exact reference OCP (generate_c_code.py:41-147)."""
    params = params or QuadrotorParams()
    return OCPSpec(
        params=params,
        cost=default_cost(dtype=dtype),
        lbu=jnp.full((NU,), W_MIN_KRPM, dtype),
        ubu=jnp.full((NU,), W_MAX_KRPM, dtype),
        tf=jnp.asarray(tf, dtype),
        N=N,
        sim_steps=sim_steps,
    )


def hover_yref(spec: OCPSpec, pos=(0.0, 0.0, 0.5)):
    """Regulation reference: hover at `pos` with identity attitude and
    steady-state rotor speed (generate_c_code.py:128-129; the Regulation
    policy fill, acados_mpc.cpp:432-456).

    Returns (yref (N, 17), yref_e (13,)).
    """
    dtype = spec.lbu.dtype
    uss = spec.params.hover_speed()
    y = jnp.zeros((NY,), dtype)
    y = y.at[0].set(pos[0]).at[1].set(pos[1]).at[2].set(pos[2])
    y = y.at[3].set(1.0)
    y = y.at[NX:].set(uss)
    yref = jnp.broadcast_to(y, (spec.N, NY))
    return yref, y[:NX]
