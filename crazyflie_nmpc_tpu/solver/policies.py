"""Reference-generation policies: Regulation / Tracking / Position_Hold.

Functional re-design of the reference's policy switch + trajectory playhead
(acados_mpc.cpp:140-144, 427-516): the mutable node state (`policy`, `iter`)
becomes an explicit `PolicyState` pytree, and the per-tick yref fill becomes
a pure function gathering N+1 rows — jit/vmap-able so a swarm of drones can
each run their own policy/playhead in one batched call.

Semantics preserved from the reference:
  * Regulation: constant setpoint (xq,yq,zq, identity attitude, hover u).
  * Tracking: window [playhead, playhead+N] of the precomputed 17-column
    trajectory; playhead advances by one row per tick; when fewer than N
    rows remain (`iter >= N_STEPS - N`) the policy latches to Position_Hold.
  * Position_Hold: last trajectory row's position, identity attitude,
    hover input (acados_mpc.cpp:490-514).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.models.quadrotor import NX, NY
from crazyflie_nmpc_tpu.solver.ocp import OCPSpec

REGULATION = 0
TRACKING = 1
POSITION_HOLD = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PolicyState:
    """Carried policy state (mode latch + trajectory playhead + setpoint)."""

    mode: Any       # int32 scalar: REGULATION / TRACKING / POSITION_HOLD
    playhead: Any   # int32 scalar: row index into the trajectory table
    setpoint: Any   # (3,) regulation position target (reference layout),
    #                 or a full (ny,) reference row for custom-model specs


def regulation_state(setpoint=(0.0, 0.0, 0.5)) -> PolicyState:
    return PolicyState(mode=jnp.int32(REGULATION), playhead=jnp.int32(0),
                       setpoint=jnp.asarray(setpoint))


def tracking_state(setpoint=(0.0, 0.0, 0.5)) -> PolicyState:
    return PolicyState(mode=jnp.int32(TRACKING), playhead=jnp.int32(0),
                       setpoint=jnp.asarray(setpoint))


def _quad_row(pos, uss, dtype):
    """Reference regulation row: position, identity attitude, zero
    velocities/rates, hover input (acados_mpc.cpp:432-456)."""
    y = jnp.zeros((NY,), dtype)
    return y.at[0:3].set(pos).at[3].set(1.0).at[NX:].set(uss)


def make_yref(spec: OCPSpec, state: PolicyState, traj_table: jax.Array):
    """Produce the (N+1, ny) reference window and the advanced PolicyState.

    Args:
      traj_table: (T, ny) precomputed trajectory (for the reference layout,
        rows = [x(13); u(4)] on the 15 ms grid — the traj/*.txt format).
        For pure regulation pass a (1, ny) dummy table.

    Layout dispatch (static, at trace time): built-in quadrotor specs
    (`spec.f is None` — the explicit custom-model marker) use the
    reference's row construction (position + identity attitude + hover
    input) from a (3,) setpoint; custom-model specs (OCPSpec.f set) must
    pass a full (ny,) setpoint, used verbatim — so a custom model that
    happens to share the 13/4 dims never silently gets quaternion-w
    identity rows.

    Returns (yref (N, ny), yref_e (nx,), new_state).
    """
    n_steps = traj_table.shape[0]
    ny = spec.cost.W.shape[0]
    nx = spec.cost.Vx_e.shape[1]
    dtype = traj_table.dtype
    uss = spec.steady_input(dtype)
    quad_layout = spec.f is None

    # Tracking window: rows playhead..playhead+N, clamped gather so reading
    # past the end repeats the final row (only reachable transiently).
    idx = jnp.clip(state.playhead + jnp.arange(spec.N + 1), 0, n_steps - 1)
    window = traj_table[idx]

    sp = state.setpoint.astype(dtype)
    if sp.shape[-1] == ny:
        reg_row = sp
    elif quad_layout:
        reg_row = _quad_row(sp, uss, dtype)
    else:
        raise ValueError(
            f"PolicyState.setpoint must be a full (ny={ny},) reference row "
            f"for non-reference cost layouts (got shape {sp.shape})")
    reg = jnp.broadcast_to(reg_row, (spec.N + 1, ny))
    if quad_layout:
        # reference Position_Hold: last row's position, identity attitude,
        # hover input (acados_mpc.cpp:490-514)
        hold_row = _quad_row(traj_table[n_steps - 1, 0:3], uss, dtype)
    else:
        # generic hold: the last table row with steady inputs
        hold_row = traj_table[n_steps - 1].at[nx:].set(uss)
    hold = jnp.broadcast_to(hold_row, (spec.N + 1, ny))

    yref_full = jax.lax.switch(
        state.mode,
        [lambda: reg, lambda: window, lambda: hold],
    )

    # Tracking playhead advance + latch to Position_Hold once fewer than N
    # rows remain (acados_mpc.cpp:460-488: `if (iter < N_STEPS-N)` else hold).
    is_tracking = state.mode == TRACKING
    exhausted = state.playhead >= n_steps - spec.N
    new_mode = jnp.where(is_tracking & exhausted,
                         jnp.int32(POSITION_HOLD), state.mode)
    # the reference skips the tick's yref update when latching; keeping the
    # hold fill immediately is equivalent from the next tick on, and this
    # tick's window is clamped to the final row anyway.
    yref_full = jnp.where(is_tracking & exhausted, hold, yref_full)
    new_playhead = jnp.where(is_tracking & ~exhausted,
                             state.playhead + 1, state.playhead)

    new_state = PolicyState(mode=new_mode, playhead=new_playhead,
                            setpoint=state.setpoint)
    return yref_full[:-1], yref_full[-1, :nx], new_state
