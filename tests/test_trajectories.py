"""Trajectory tooling tests: loaders, flatness map, generators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crazyflie_nmpc_tpu.models import NX, QuadrotorParams, dynamics
from crazyflie_nmpc_tpu.ops.integrators import rk4_step
from crazyflie_nmpc_tpu.utils import (
    eval_flat_outputs,
    flat_to_state,
    helix_trajectory,
    load_poly_csv,
    load_traj_txt,
    sample_poly_trajectory,
    smooth_step_trajectory,
)

REF_TRAJ = "/root/reference/crazyflie_controller/traj/helix_traj.txt"
REF_CSV = "/root/reference/crazyflie_demo/scripts/figure8.csv"
DT = 0.015


def test_load_reference_17col():
    table = load_traj_txt(REF_TRAJ)
    assert table.shape == (1050, 17)
    np.testing.assert_allclose(table[0, 13:], 15.7777)


def test_load_reference_poly_csv():
    durations, coeffs = load_poly_csv(REF_CSV)
    assert coeffs.shape[1:] == (4, 8)
    assert durations.shape[0] == coeffs.shape[0]
    assert durations.min() > 0


def test_poly_eval_matches_reference_impl():
    """Flat-output evaluation vs the reference's Polynomial4D/Horner code
    (uav_trajectory.py:10-84), reimplemented literally in numpy."""
    durations, coeffs = load_poly_csv(REF_CSV)
    total = durations.sum()

    def ref_eval(t):
        cur = 0.0
        for d, c in zip(durations, coeffs):
            if t < cur + d or d is durations[-1]:
                tau = t - cur
                if tau <= d:
                    out = []
                    for ax in range(4):
                        p = c[ax]
                        x = 0.0
                        for i in range(len(p)):
                            x = x * tau + p[len(p) - 1 - i]
                        out.append(x)
                    return np.array(out)
            cur += d
        raise AssertionError

    for t in [0.0, 0.5, 1.049, 1.051, 3.3, total - 0.01]:
        flat = eval_flat_outputs(durations, coeffs, jnp.asarray(t))
        ref = ref_eval(t)
        np.testing.assert_allclose(np.asarray(flat["pos"]), ref[:3],
                                   atol=1e-9, err_msg=f"t={t}")
        np.testing.assert_allclose(float(flat["yaw"]), ref[3], atol=1e-9)


def test_flatness_state_is_dynamically_consistent():
    """Flatness-generated (x, u) rows must be near-consistent under the real
    dynamics: one RK4 step from row k under u_k lands close to row k+1.
    (Exact in position/velocity; rotor-speed symmetry approximates torques.)
    """
    params = QuadrotorParams()
    table = helix_trajectory(params)
    xs, us = table[:, :NX], table[:, NX:]
    step = jax.vmap(lambda x, u: rk4_step(dynamics, params, x, u, DT))
    pred = step(xs[:-1], us[:-1])
    err_pos = np.max(np.abs(np.asarray(pred[:, :3]) - np.asarray(xs[1:, :3])))
    assert err_pos < 2e-3, err_pos


def test_flatness_quaternion_unit_norm():
    params = QuadrotorParams()
    table = helix_trajectory(params, radius=0.5, turns=4.0)
    q = np.asarray(table[:, 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-9)


def test_hover_flat_state():
    """Zero acc/vel flat outputs -> exact hover state and hover rotor speed."""
    params = QuadrotorParams()
    flat = dict(pos=jnp.array([1.0, 2.0, 3.0]), vel=jnp.zeros(3),
                acc=jnp.zeros(3), jerk=jnp.zeros(3),
                yaw=jnp.asarray(0.0), dyaw=jnp.asarray(0.0))
    x, u = flat_to_state(flat, params)
    np.testing.assert_allclose(np.asarray(x[3:7]), [1, 0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(u), float(params.hover_speed()),
                               rtol=1e-6)


def test_smooth_step_endpoints():
    params = QuadrotorParams()
    table = smooth_step_trajectory(params, start=(0.3, 0.0, 0.4),
                                   end=(0.3, 0.0, 0.8))
    np.testing.assert_allclose(np.asarray(table[0, :3]), [0.3, 0.0, 0.4],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(table[-1, :3]), [0.3, 0.0, 0.8],
                               atol=1e-3)
    # starts and ends at rest
    np.testing.assert_allclose(np.asarray(table[0, 7:10]), 0.0, atol=1e-6)


def test_sample_poly_trajectory_grid():
    params = QuadrotorParams()
    durations, coeffs = load_poly_csv(REF_CSV)
    table = sample_poly_trajectory(durations, coeffs, params)
    total = durations.sum()
    assert table.shape == (int(np.floor(total / DT)) + 1, 17)
    assert np.all(np.isfinite(np.asarray(table)))
    # rotor speeds within physical bounds along figure8
    assert np.asarray(table[:, 13:]).max() < 22.0
    assert np.asarray(table[:, 13:]).min() > 0.0
