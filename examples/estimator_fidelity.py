"""Fidelity study: ideal feedback vs the full estimator chain.

Reproduces the paper's flight configuration in software (the
acados_predictor.launch composition): helix tracking where the NMPC sees
only the estimator's reconstruction — Euler-roundtripped attitude,
5-sample IIR-LPF velocity differentiation with the reference filter's
0.7686 DC gain — and commands reach the rotors through a 60 ms actuation
pipe.  Compares against the ideal-feedback loop at the same delay.

Run: python examples/estimator_fidelity.py   (CPU, ~3 min incl. compile)
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from crazyflie_nmpc_tpu import runtime, solver, utils
from crazyflie_nmpc_tpu.runtime import tracking_error
from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
from crazyflie_nmpc_tpu.runtime.closed_loop import LoopConfig
from crazyflie_nmpc_tpu.solver import policies
from crazyflie_nmpc_tpu.utils.cache import setup_compilation_cache


def main():
    setup_compilation_cache()
    spec = solver.default_ocp(dtype=jax.numpy.float64)
    table = utils.helix_trajectory(spec.params)
    steps = min(900, table.shape[0] - 1)

    res_fid = runtime.estimator_in_the_loop(
        spec, table[0, :13], steps=steps, delay_steps=4,
        config=LoopConfig(ipm=IPMConfig(iters=8)),
        policy_state=policies.tracking_state(), traj_table=table)
    e_fid = tracking_error(res_fid, table)

    res_ideal = runtime.trajectory_tracking(
        spec, table[0, :13], table, steps=steps,
        config=LoopConfig(delay_steps=4, ipm=IPMConfig(iters=8)))
    e_ideal = tracking_error(res_ideal, table)

    print("helix position error over the tracking window:")
    print(f"  full estimator chain + 60 ms pipe: "
          f"max {e_fid.max() * 100:.2f} cm  mean {e_fid.mean() * 100:.2f} cm")
    print(f"  ideal feedback      + 60 ms pipe: "
          f"max {e_ideal.max() * 100:.2f} cm  mean {e_ideal.mean() * 100:.2f} cm")
    print("(the reference reports cm-level from hardware flights with the "
          "same filter bias)")


if __name__ == "__main__":
    main()
