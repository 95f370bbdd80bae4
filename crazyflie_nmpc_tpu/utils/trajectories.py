"""Reference-trajectory tooling: loaders, flatness evaluation, generators.

Covers (and extends) the reference's two trajectory formats:

  * 17-column whitespace text files, one row per 15 ms tick
    ([x(13); u(4)] — crazyflie_controller/traj/helix_traj.txt, loaded by
    readDataFromFile, acados_mpc.cpp:354-382);
  * 33-column polynomial CSVs (duration, x^0..7, y^0..7, z^0..7, yaw^0..7 —
    crazyflie_demo/scripts/figure8.csv) evaluated through the differential-
    flatness map (uav_trajectory.py:54-95).

Extension over the reference: the flatness evaluation here produces *full*
17-column (x, u) rows — quaternion from the flat body frame, body-frame
velocity, body rates, and rotor speeds from collective thrust — so any
polynomial trajectory can feed the NMPC Tracking policy directly.  The
reference could only stream poly trajectories through the firmware's
cmd_full_state path; its NMPC trajectories were generated offline by a
separate CasADi program that is not in the repo.  Generators for helix and
smooth-step references make the framework self-contained.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from crazyflie_nmpc_tpu.models.quadrotor import NU, NX, QuadrotorParams

TRAJ_COLS = NX + NU  # 17


def load_traj_txt(path: str) -> np.ndarray:
    """Load a 17-column whitespace trajectory file (15 ms grid)."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None, :]
    if data.shape[1] != TRAJ_COLS:
        raise ValueError(
            f"expected {TRAJ_COLS} columns, got {data.shape[1]} in {path}")
    return data


def save_traj_txt(path: str, table: np.ndarray) -> None:
    """Write a 17-column trajectory in the reference's text format."""
    np.savetxt(path, np.asarray(table), fmt="%.6f")


def load_poly_csv(path: str):
    """Load a 33-column polynomial CSV (figure8.csv format).

    Returns (durations (P,), coeffs (P, 4, 8)) with axis order x, y, z, yaw
    and coefficients lowest-power-first.
    """
    data = np.loadtxt(path, delimiter=",", skiprows=1, usecols=range(33))
    if data.ndim == 1:
        data = data[None, :]
    durations = data[:, 0]
    coeffs = data[:, 1:33].reshape(-1, 4, 8)
    return durations, coeffs


def encode_poly4d(durations, coeffs) -> bytes:
    """Pack pieces into the trajectory-memory wire blob (132 B/piece).

    Layout per piece (little-endian, 33 floats — the crazyflie_cpp
    poly4d upload format, matching TrajectoryPolynomialPiece.msg's field
    order): x^0..x^7, y^0..y^7, z^0..z^7, yaw^0..yaw^7, duration.
    `LinkServer.upload_trajectory` ships this blob over the mem port;
    `decode_poly4d` (the vehicle-side executor) inverts it.
    """
    import struct

    durations = np.asarray(durations, np.float64)
    coeffs = np.asarray(coeffs, np.float64)
    out = b""
    for dur, c in zip(durations, coeffs):
        out += struct.pack("<33f", *c.reshape(32), float(dur))
    return out


def decode_poly4d(blob: bytes, n_pieces: int):
    """Inverse of `encode_poly4d`: blob -> (durations (P,), coeffs
    (P, 4, 8) lowest-power-first)."""
    import struct

    if len(blob) < 132 * n_pieces:
        raise ValueError(f"poly4d blob too short: {len(blob)} B for "
                         f"{n_pieces} pieces")
    durations = np.zeros(n_pieces)
    coeffs = np.zeros((n_pieces, 4, 8))
    for i in range(n_pieces):
        vals = struct.unpack("<33f", blob[132 * i:132 * (i + 1)])
        coeffs[i] = np.asarray(vals[:32]).reshape(4, 8)
        durations[i] = vals[32]
    return durations, coeffs


def _polyval(c, t):
    """Evaluate sum_i c[..., i] t^i (lowest-power-first) via Horner."""
    r = jnp.zeros_like(t) + c[..., -1]
    for i in range(c.shape[-1] - 2, -1, -1):
        r = r * t + c[..., i]
    return r


def _polyder(c):
    """Derivative coefficients, lowest-power-first."""
    n = c.shape[-1]
    return c[..., 1:] * jnp.arange(1, n, dtype=c.dtype)


def eval_flat_outputs(durations, coeffs, t):
    """Evaluate the 4D piecewise polynomial and its first three derivatives.

    Returns dict(pos (3,), vel, acc, jerk (3,), yaw, dyaw scalars) at time t
    (clamped to the trajectory's span).
    """
    durations = jnp.asarray(durations)
    coeffs = jnp.asarray(coeffs)
    starts = jnp.concatenate([jnp.zeros((1,), durations.dtype),
                              jnp.cumsum(durations)[:-1]])
    total = jnp.sum(durations)
    t = jnp.clip(t, 0.0, total - 1e-9)
    piece = jnp.clip(jnp.searchsorted(starts, t, side="right") - 1,
                     0, durations.shape[0] - 1)
    tau = t - starts[piece]
    c0 = coeffs[piece]          # (4, 8)
    c1 = _polyder(c0)
    c2 = _polyder(c1)
    c3 = _polyder(c2)
    f0 = _polyval(c0, tau)      # (4,)
    f1 = _polyval(c1, tau)
    f2 = _polyval(c2, tau)
    f3 = _polyval(c3, tau)
    return dict(pos=f0[:3], vel=f1[:3], acc=f2[:3], jerk=f3[:3],
                yaw=f0[3], dyaw=f1[3])


def flat_to_state(flat, params: QuadrotorParams, g: float = 9.8066):
    """Differential-flatness map: flat outputs -> (x (13,), u (4,)).

    Same construction as the reference's uav_trajectory.py:70-84 (thrust
    axis from acc+g, body frame from yaw, omega from the jerk projection),
    extended to a full state: quaternion from the body-frame DCM, body-frame
    linear velocity, and rotor speeds from collective thrust
    w_i = sqrt(m |a_thrust| / (4 Ct)).
    """
    acc = flat["acc"] + jnp.array([0.0, 0.0, g])
    thrust_norm = jnp.linalg.norm(acc)
    z_body = acc / thrust_norm
    x_world = jnp.stack([jnp.cos(flat["yaw"]), jnp.sin(flat["yaw"]),
                         jnp.zeros_like(flat["yaw"])])
    y_body_raw = jnp.cross(z_body, x_world)
    y_body = y_body_raw / jnp.linalg.norm(y_body_raw)
    x_body = jnp.cross(y_body, z_body)

    # body->earth DCM columns are the body axes
    R = jnp.stack([x_body, y_body, z_body], axis=-1)

    # rotation matrix -> quaternion (w>0 branch; trajectories stay far from
    # the 180-degree singularity)
    qw = 0.5 * jnp.sqrt(jnp.maximum(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12))
    qx = (R[2, 1] - R[1, 2]) / (4 * qw)
    qy = (R[0, 2] - R[2, 0]) / (4 * qw)
    qz = (R[1, 0] - R[0, 1]) / (4 * qw)
    q = jnp.stack([qw, qx, qy, qz])

    # angular velocity from jerk (uav_trajectory.py:79-84)
    jerk = flat["jerk"]
    jerk_orth = jerk - jnp.dot(jerk, z_body) * z_body
    h_w = jerk_orth / thrust_norm
    omega = jnp.stack([-jnp.dot(h_w, y_body), jnp.dot(h_w, x_body),
                       z_body[2] * flat["dyaw"]])

    v_body = R.T @ flat["vel"]

    w_rotor = jnp.sqrt(params.mq * thrust_norm / (4.0 * params.Ct))
    u = jnp.full((NU,), w_rotor)

    x = jnp.concatenate([flat["pos"], q, v_body, omega])
    return x, u


def sample_poly_trajectory(durations, coeffs, params: QuadrotorParams,
                           dt: float = 0.015) -> jnp.ndarray:
    """Sample a polynomial trajectory onto the 15 ms 17-column grid that the
    Tracking policy consumes."""
    total = float(np.sum(np.asarray(durations)))
    n = int(np.floor(total / dt)) + 1
    times = jnp.arange(n) * dt

    def eval_one(t):
        flat = eval_flat_outputs(durations, coeffs, t)
        x, u = flat_to_state(flat, params)
        return jnp.concatenate([x, u])

    return jax.vmap(eval_one)(times)


def helix_trajectory(params: QuadrotorParams, radius=0.3, z0=0.04, z1=1.0,
                     turns=2.5, duration=15.75, dt=0.015,
                     center=(0.0, 0.0)) -> jnp.ndarray:
    """Generate a helix climb reference analytically (the shape of the
    reference's precomputed traj/helix_traj.txt: rises while circling).

    The analytic flat outputs (sinusoids + linear climb) run through the same
    flatness map as polynomial trajectories, giving dynamically consistent
    (x, u) rows.
    """
    n = int(np.floor(duration / dt)) + 1
    times = jnp.arange(n) * dt
    w = 2.0 * jnp.pi * turns / duration
    cz = (z1 - z0) / duration

    def eval_one(t):
        cs, sn = jnp.cos(w * t), jnp.sin(w * t)
        pos = jnp.stack([center[0] + radius * cs, center[1] + radius * sn,
                         z0 + cz * t])
        vel = jnp.stack([-radius * w * sn, radius * w * cs,
                         jnp.full_like(t, cz)])
        acc = jnp.stack([-radius * w**2 * cs, -radius * w**2 * sn,
                         jnp.zeros_like(t)])
        jerk = jnp.stack([radius * w**3 * sn, -radius * w**3 * cs,
                          jnp.zeros_like(t)])
        flat = dict(pos=pos, vel=vel, acc=acc, jerk=jerk,
                    yaw=jnp.zeros_like(t), dyaw=jnp.zeros_like(t))
        x, u = flat_to_state(flat, params)
        return jnp.concatenate([x, u])

    return jax.vmap(eval_one)(times)


def smooth_step_trajectory(params: QuadrotorParams, start=(0.3, 0.0, 0.4),
                           end=(0.3, 0.0, 0.8), duration=6.75,
                           dt=0.015) -> jnp.ndarray:
    """Generate a smooth point-to-point step (quintic min-jerk profile),
    the shape of the reference's traj/smooth_step.txt."""
    n = int(np.floor(duration / dt)) + 1
    times = jnp.arange(n) * dt
    p0 = jnp.asarray(start)
    p1 = jnp.asarray(end)
    d = p1 - p0
    T = duration

    def eval_one(t):
        s = t / T
        # min-jerk: 10 s^3 - 15 s^4 + 6 s^5 and derivatives
        b = 10 * s**3 - 15 * s**4 + 6 * s**5
        db = (30 * s**2 - 60 * s**3 + 30 * s**4) / T
        ddb = (60 * s - 180 * s**2 + 120 * s**3) / T**2
        dddb = (60 - 360 * s + 360 * s**2) / T**3
        flat = dict(pos=p0 + d * b, vel=d * db, acc=d * ddb, jerk=d * dddb,
                    yaw=jnp.zeros_like(t), dyaw=jnp.zeros_like(t))
        x, u = flat_to_state(flat, params)
        return jnp.concatenate([x, u])

    return jax.vmap(eval_one)(times)
