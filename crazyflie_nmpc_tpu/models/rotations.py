"""Rotation/attitude conversions (quaternion <-> Euler ZYX <-> rotation matrix).

Behavioral parity with the reference's hand-rolled conversions:
  * `quat_to_euler`     — acados_mpc.cpp:384-404 (`quatern2euler`)
  * `euler_to_quat`     — acados_estimator.cpp:327-354 (`euler2quatern`,
    including its sign convention and the qw>0 canonicalization)
  * `rotmat_earth_to_body` — acados_estimator.cpp:414-440 (`rotateLinearVeloE2B`)

All functions operate on the last axis and broadcast over leading batch axes.
Quaternion layout is (qw, qx, qy, qz).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize a quaternion to unit length along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_canonicalize(q: jax.Array) -> jax.Array:
    """Flip sign so the scalar part is non-negative (reference convention,
    acados_estimator.cpp:347-351)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_to_euler(q: jax.Array) -> jax.Array:
    """Unit quaternion -> ZYX Euler angles (phi=roll, theta=pitch, psi=yaw).

    Same algebra as the reference's quatern2euler (acados_mpc.cpp:384-404):
    built from rotation-matrix entries of the earth->body DCM.
    Returns (..., 3) = (phi, theta, psi) in radians.
    """
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r11 = 2 * (qw * qw + qx * qx) - 1
    r21 = 2 * (qx * qy - qw * qz)
    r31 = 2 * (qx * qz + qw * qy)
    r32 = 2 * (qy * qz - qw * qx)
    r33 = 2 * (qw * qw + qz * qz) - 1
    phi = jnp.arctan2(r32, r33)
    theta = -jnp.arcsin(jnp.clip(r31, -1.0, 1.0))
    psi = jnp.arctan2(r21, r11)
    return jnp.stack([phi, theta, psi], axis=-1)


def euler_to_quat(euler: jax.Array) -> jax.Array:
    """ZYX Euler angles (phi, theta, psi) [rad] -> unit quaternion.

    Replicates the reference estimator's euler2quatern
    (acados_estimator.cpp:327-354) including its negated vector part (the
    conjugate of the textbook ZYX composition — i.e. the earth->body sense the
    estimator feeds to the solver) and the qw>=0 canonicalization.
    Returns (..., 4) = (qw, qx, qy, qz).
    """
    half = euler * 0.5
    cph, cth, cps = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sph, sth, sps = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])

    qw = cph * cth * cps + sph * sth * sps
    qx = -(cps * cth * sph - sps * sth * cph)
    qy = -(cps * sth * cph + sps * cth * sph)
    qz = -(sps * cth * cph - cps * sth * sph)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return quat_canonicalize(q)


def rotmat_earth_to_body(q: jax.Array) -> jax.Array:
    """Unit quaternion -> earth->body rotation matrix (ZYX convention).

    Same entries as the reference's rotateLinearVeloE2B
    (acados_estimator.cpp:414-440). Returns (..., 3, 3).
    """
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s11 = 2 * (qw * qw + qx * qx) - 1
    s12 = 2 * (qx * qy + qw * qz)
    s13 = 2 * (qx * qz - qw * qy)
    s21 = 2 * (qx * qy - qw * qz)
    s22 = 2 * (qw * qw + qy * qy) - 1
    s23 = 2 * (qy * qz + qw * qx)
    s31 = 2 * (qx * qz + qw * qy)
    s32 = 2 * (qy * qz - qw * qx)
    s33 = 2 * (qw * qw + qz * qz) - 1
    row1 = jnp.stack([s11, s12, s13], axis=-1)
    row2 = jnp.stack([s21, s22, s23], axis=-1)
    row3 = jnp.stack([s31, s32, s33], axis=-1)
    return jnp.stack([row1, row2, row3], axis=-2)


def rotmat_body_to_earth(q: jax.Array) -> jax.Array:
    """Unit quaternion -> body->earth rotation (transpose of earth->body)."""
    return jnp.swapaxes(rotmat_earth_to_body(q), -1, -2)


def rotate_earth_to_body(q: jax.Array, v_earth: jax.Array) -> jax.Array:
    """Rotate an earth-frame vector into the body frame (batched matvec)."""
    return jnp.einsum("...ij,...j->...i", rotmat_earth_to_body(q), v_earth)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a (x) b, layout (qw, qx, qy, qz)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def deg2rad(deg):
    """Degrees -> radians (reference: acados_mpc.cpp:406-409)."""
    return deg * (jnp.pi / 180.0)


def rad2deg(rad):
    """Radians -> degrees (reference: acados_mpc.cpp:411-414)."""
    return rad * (180.0 / jnp.pi)
