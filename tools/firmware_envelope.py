"""Delay-envelope measurement for the cmd_vel + onboard-cascade loop.

The reference flies its headline 60 ms round-trip delay (delay_steps=4,
acados_predictor.launch:61-63) through the cmd_vel architecture: NMPC
u1/x4 -> cmd_vel -> radio pipe -> onboard attitude/rate cascade
(acados_mpc.cpp:619-670).  This tool measures the closed-loop stability
envelope over

  * the cascade gain space (kp_att, kp_rate) including the two firmware
    details round 2 named as missing — the rate-loop D term (kd_rate)
    and first-order motor lag (tau_m),
  * the predictor plant model ("motvel" = the reference's rotor-level
    ZOH verbatim; "cmd_vel" = the same single-last-command scheme with
    the model-consistent cascade plant),
  * the physical split of the round trip between measurement staleness
    and actuation pipe (meas_delay_steps).

Findings (docs/PERF.md "The 60 ms cmd_vel flight configuration"):
the rotor-level predictor is unstable at >= 45 ms across the WHOLE gain
grid (0/81 at d=3, 0/72 at d=4, any split) — the D/lag hypothesis is
refuted; the cascade-model predictor closes 60 ms (and 90 ms) at
default gains.  Pinned in tests/test_estimator_fidelity.py.

Run (CPU, f64):  python tools/firmware_envelope.py [--steps 400]
"""

import argparse
import itertools
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from crazyflie_nmpc_tpu.models import hover_state
from crazyflie_nmpc_tpu.models.firmware import AttitudeGains
from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
from crazyflie_nmpc_tpu.runtime.closed_loop import LoopConfig, cmd_vel_loop
from crazyflie_nmpc_tpu.solver import default_ocp

SETPOINT = (0.0, 0.0, 0.5)
START = (0.15, -0.1, 0.3)


def scan(spec, x0, cfg, grid, steps, delay, dm=0, predictor="motvel"):
    leaves = jax.tree.map(lambda *xs: jnp.asarray(xs, jnp.float64),
                          *[AttitudeGains(*g) for g in grid])

    @jax.jit
    def run(gains):
        res = cmd_vel_loop(spec, x0, SETPOINT, steps=steps,
                           delay_steps=delay, config=cfg, gains=gains,
                           meas_delay_steps=dm, predictor=predictor)
        e = jnp.abs(res.x[:, :3] - jnp.asarray(SETPOINT))
        return jnp.max(e[-10:]), jnp.max(
            jnp.where(jnp.isfinite(e), e, jnp.inf))

    finals, worsts = map(np.asarray, jax.vmap(run)(leaves))
    ok = np.isfinite(finals) & (finals < 0.05) & (worsts < 1.0)
    return finals, worsts, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    spec = default_ocp(dtype=jnp.float64)
    x0 = hover_state(spec.params, pos=START, dtype=jnp.float64)
    cfg = LoopConfig(ipm=IPMConfig(iters=10))

    # --- rotor-level (reference-verbatim) predictor over the gain grid
    for delay, grid in [
        (3, list(itertools.product((10., 16., 24.), (40., 70., 120.),
                                   (0., 0.1, 0.3), (0., 0.01, 0.02)))),
        (4, list(itertools.product((4., 6., 10., 16.), (20., 40., 70.),
                                   (0., 0.05, 0.15), (0., 0.015)))),
    ]:
        finals, worsts, ok = scan(spec, x0, cfg, grid, args.steps, delay)
        print(f"motvel predictor, d={delay} ({delay * 15} ms): "
              f"{int(ok.sum())}/{len(grid)} stable")
        for i in np.where(ok)[0]:
            g = grid[i]
            print(f"  STABLE kp_att={g[0]} kp_rate={g[1]} kd={g[2]} "
                  f"tau={g[3]} final={finals[i]:.4f}")

    # --- split of the 60 ms round trip (measurement vs actuation leg)
    gset = [AttitudeGains(), AttitudeGains(10., 40., 0.1, 0.015),
            AttitudeGains(16., 70., 0.1, 0.015),
            AttitudeGains(16., 70., 0.0, 0.0)]
    for dm in (1, 2, 3, 4):
        _, _, ok = scan(spec, x0, cfg,
                        [tuple(jax.tree.leaves(g)) for g in gset],
                        args.steps, 4, dm=dm)
        print(f"motvel predictor, d=4 split dm={dm}/da={4 - dm}: "
              f"{int(ok.sum())}/{len(gset)} stable")

    # --- model-consistent (cascade) predictor at and past 60 ms
    for delay, dm in ((4, 0), (4, 2), (6, 0), (8, 0)):
        finals, worsts, ok = scan(spec, x0, cfg, [(10., 40., 0.0, 0.0)],
                                  args.steps, delay, dm=dm,
                                  predictor="cmd_vel")
        print(f"cmd_vel predictor, d={delay} dm={dm}: "
              f"{'STABLE' if ok[0] else 'unstable'} "
              f"final={finals[0]:.4f} worst={worsts[0]:.3f}")


if __name__ == "__main__":
    main()
