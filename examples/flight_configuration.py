"""The paper's flight configuration, end-to-end in one loop.

Runs `runtime.flight_configuration` — helix Tracking policy + full
estimator chain (mocap IIR-LPF fusion, Euler round-trip) + u1/x4 ->
cmd_vel extraction + 60 ms radio round trip + onboard attitude cascade
(acados_predictor.launch + acados_mpc.cpp:458-516,644-670 +
acados_estimator.cpp:521-634, composed) — and prints the tracking-error
profile under both delay predictors:

  * cmd_vel  — model-consistent single-last-command predictor: closes
               the shipped 60 ms operating point (2.3 cm max).
  * motvel   — the reference's literal rotor-level predictor: stable
               only through ~30 ms in software (the onboard-cascade
               mismatch compounds; tools/firmware_envelope.py).

Run: python examples/flight_configuration.py   (CPU, ~2 min incl. compile)
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
from crazyflie_nmpc_tpu.runtime import (
    LoopConfig,
    flight_configuration,
    tracking_error,
)
from crazyflie_nmpc_tpu.solver import default_ocp
from crazyflie_nmpc_tpu.utils import helix_trajectory


def main():
    spec = default_ocp(dtype=jnp.float64)
    table = helix_trajectory(spec.params).astype(jnp.float64)
    cfg = LoopConfig(ipm=IPMConfig(iters=8))

    for predictor, d in [("cmd_vel", 4), ("motvel", 2)]:
        res = flight_configuration(spec, table, steps=500, delay_steps=d,
                                   predictor=predictor, config=cfg)
        e = tracking_error(res, table)
        u = np.asarray(res.u)
        print(f"predictor={predictor:<8} delay={d * 15} ms: "
              f"max err {e.max() * 100:.2f} cm, "
              f"mean {e[100:].mean() * 100:.2f} cm, "
              f"rotor range [{u.min():.2f}, {u.max():.2f}] kRPM")


if __name__ == "__main__":
    main()
