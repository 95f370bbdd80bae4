"""Digital low-pass-filtered velocity differentiation.

Parity with the reference estimator's 5-sample buffers + second-order IIR
differentiator (acados_estimator.cpp:356-412):

    v_k = 0.3306 v_{k-1} - 0.02732 v_{k-2} + 35.7 (p_k - p_{k-1})

designed for Ts = 15 ms; during the first second of data it falls back to the
raw finite difference (p_k - p_{k-1}) / Ts (:366).  The reference shifts
5-sample windows but only ever reads the last two taps of each, so the state
here is the minimal (p_prev, v_prev, v_prev2, elapsed) pytree — same output
sequence, verified in tests against a literal 5-buffer reimplementation.

NOTE (discovered during parity testing): the reference filter's DC gain is
35.7*0.015/(1-0.3306+0.02732) = 0.7686, i.e. it reports ~77% of the true
steady-state velocity.  `lpf_step(..., unity_gain=True)` rescales the
numerator to (1-a1-a2)/dt for an unbiased differentiator with the same pole
placement; the default replicates the reference exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# IIR coefficients from acados_estimator.cpp:364 (designed at Ts = 15 ms).
LPF_A1 = 0.3306
LPF_A2 = -0.02732
LPF_B = 35.7
WARMUP_SECONDS = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VelocityLPFState:
    """Carried filter state; position/velocity entries are (..., 3)."""

    p_prev: Any    # previous position sample
    v_prev: Any    # previous filtered velocity
    v_prev2: Any   # filtered velocity two ticks ago
    elapsed: Any   # seconds of data seen so far


def init_lpf(p0: jax.Array) -> VelocityLPFState:
    z = jnp.zeros_like(p0)
    return VelocityLPFState(p_prev=p0, v_prev=z, v_prev2=z,
                            elapsed=jnp.zeros((), p0.dtype))


def lpf_step(state: VelocityLPFState, p: jax.Array, dt,
             unity_gain: bool = False):
    """One filter tick: new position sample -> world-frame velocity estimate.

    Vectorized over the trailing axis (x, y, z simultaneously — the reference
    runs the scalar filter three times).  unity_gain=True corrects the
    reference's 0.7686 DC gain (see module docstring).
    """
    b = (1.0 - LPF_A1 - LPF_A2) / dt if unity_gain else LPF_B
    diff = p - state.p_prev
    v_iir = LPF_A1 * state.v_prev + LPF_A2 * state.v_prev2 + b * diff
    v_fd = diff / dt
    v = jnp.where(state.elapsed > WARMUP_SECONDS, v_iir, v_fd)
    new_state = VelocityLPFState(
        p_prev=p, v_prev=v, v_prev2=state.v_prev,
        elapsed=state.elapsed + dt)
    return new_state, v
