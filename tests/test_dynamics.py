"""Unit tests for the quadrotor model (SURVEY.md section 7 step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crazyflie_nmpc_tpu.models import (
    NX,
    NU,
    QuadrotorParams,
    dynamics,
    hover_control,
    hover_state,
    rotations,
)


@pytest.fixture
def params():
    return QuadrotorParams()


def random_state(key, scale=1.0):
    kx, kq = jax.random.split(key)
    x = scale * jax.random.normal(kx, (NX,))
    q = rotations.quat_normalize(jax.random.normal(kq, (4,)))
    return x.at[3:7].set(q)


def test_hover_equilibrium(params):
    """xdot = 0 at the hover point with u = hov_w ~ 15.7777 kRPM."""
    x = hover_state(params, pos=(0.1, -0.2, 0.5))
    u = hover_control(params)
    np.testing.assert_allclose(float(params.hover_speed()), 15.7777, atol=1e-3)
    xdot = dynamics(params, x, u)
    np.testing.assert_allclose(np.asarray(xdot), np.zeros(NX), atol=1e-10)


def test_freefall_gravity(params):
    """Zero thrust at identity attitude: only dvbz = -g is nonzero."""
    x = hover_state(params)
    u = jnp.zeros(NU)
    xdot = dynamics(params, x, u)
    np.testing.assert_allclose(float(xdot[9]), -float(params.g0), rtol=1e-12)
    mask = np.ones(NX, bool)
    mask[9] = False
    np.testing.assert_allclose(np.asarray(xdot)[mask], 0.0, atol=1e-12)


def test_quaternion_norm_invariant(params):
    """d/dt |q|^2 = 2 q . qdot = 0 for the quaternion kinematics."""
    key = jax.random.PRNGKey(0)
    for i in range(5):
        x = random_state(jax.random.fold_in(key, i))
        u = jax.random.uniform(jax.random.fold_in(key, 100 + i), (NU,), maxval=22.0)
        xdot = dynamics(params, x, u)
        dot = jnp.vdot(x[3:7], xdot[3:7])
        assert abs(float(dot)) < 1e-12


def test_yaw_torque_sign(params):
    """Rotors 1 and 3 spinning faster than 2 and 4 yields negative yaw accel
    (reference mixing: dwz = -(Cd (w1^2 - w2^2 + w3^2 - w4^2) ...)/Izz)."""
    x = hover_state(params)
    u = jnp.array([16.0, 15.0, 16.0, 15.0])
    xdot = dynamics(params, x, u)
    assert float(xdot[12]) < 0.0


def test_roll_pitch_torque_mixing(params):
    """X-config mixing: w1,w2 fast / w3,w4 slow -> negative roll accel;
    w1,w4 fast / w2,w3 slow -> negative pitch accel."""
    x = hover_state(params)
    xdot = dynamics(params, x, jnp.array([16.0, 16.0, 15.0, 15.0]))
    assert float(xdot[10]) < 0.0
    xdot = dynamics(params, x, jnp.array([16.0, 15.0, 15.0, 16.0]))
    assert float(xdot[11]) < 0.0


def test_batched_params_and_states(params):
    """vmap over both states and perturbed physical params (Monte-Carlo axis)."""
    B = 7
    key = jax.random.PRNGKey(1)
    xs = jnp.stack([random_state(jax.random.fold_in(key, i)) for i in range(B)])
    us = jax.random.uniform(key, (B, NU), maxval=22.0)
    masses = 33e-3 * (1.0 + 0.1 * jax.random.normal(key, (B,)))
    batched = QuadrotorParams(mq=masses)
    out = jax.vmap(lambda m, x, u: dynamics(QuadrotorParams(mq=m), x, u))(
        masses, xs, us)
    out2 = jax.vmap(dynamics, in_axes=(
        QuadrotorParams(g0=None, mq=0, Ixx=None, Iyy=None, Izz=None,
                        Cd=None, Ct=None, l=None), 0, 0))(batched, xs, us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-12)
    assert out.shape == (B, NX)


def test_rotation_roundtrip():
    """quat -> euler -> quat roundtrip (within quaternion double cover)."""
    key = jax.random.PRNGKey(2)
    q = rotations.quat_canonicalize(
        rotations.quat_normalize(jax.random.normal(key, (16, 4))))
    q2 = rotations.euler_to_quat(rotations.quat_to_euler(q))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-9)


def test_rotmat_orthonormal():
    key = jax.random.PRNGKey(3)
    q = rotations.quat_normalize(jax.random.normal(key, (8, 4)))
    R = rotations.rotmat_earth_to_body(q)
    eye = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-12)


def test_rotation_consistency_with_dynamics(params):
    """Position kinematics in `dynamics` equals R_body_to_earth @ v_b."""
    key = jax.random.PRNGKey(4)
    x = random_state(key)
    u = jnp.zeros(NU)
    xdot = dynamics(params, x, u)
    v_earth = rotations.rotmat_body_to_earth(x[3:7]) @ x[7:10]
    np.testing.assert_allclose(np.asarray(xdot[:3]), np.asarray(v_earth),
                               atol=1e-12)


def test_description_presets():
    """crazyflie_description equivalents: URDF vs identified params."""
    from crazyflie_nmpc_tpu.models import description as desc

    ident = desc.cf21_identified()
    assert float(ident.mq) == 33e-3            # sysid mass incl. marker
    urdf2 = desc.cf2_urdf()
    assert float(urdf2.mq) == 0.027            # crazyflie2.urdf.xacro:10
    assert float(urdf2.Izz) == 3.2347e-5
    urdf1 = desc.cf1_urdf()
    assert float(urdf1.mq) == 0.019
    assert desc.params_for("cf2_urdf").mq == urdf2.mq
    # overrides compose (Monte-Carlo perturbation entry point)
    heavy = desc.params_for("cf21_identified", mq=0.040)
    assert float(heavy.mq) == 0.040
    import pytest

    with pytest.raises(KeyError):
        desc.params_for("cf3")
    # hover speed ordering follows mass
    assert float(heavy.hover_speed()) > float(ident.hover_speed())


def test_description_urdf_export():
    """to_urdf emits well-formed URDF whose inertial block carries the
    preset values (xacro-expanded crazyflie2.urdf.xacro:8-26)."""
    import xml.etree.ElementTree as ET

    from crazyflie_nmpc_tpu.models import description as desc

    doc = desc.to_urdf()
    root = ET.fromstring(doc)
    assert root.tag == "robot" and root.get("name") == "crazyflie2"
    inertial = root.find("link/inertial")
    assert float(inertial.find("mass").get("value")) == 0.027
    inertia = inertial.find("inertia")
    assert float(inertia.get("izz")) == 3.2347e-5
    assert float(inertia.get("ixy")) == 0.0
    mesh = root.find("link/visual/geometry/mesh")
    assert mesh.get("filename").endswith("crazyflie2.dae")

    # identified-model export, no mesh assets
    doc2 = desc.to_urdf(desc.cf21_identified(), name="cf21", mesh=None)
    root2 = ET.fromstring(doc2)
    assert root2.find("link/visual") is None
    assert float(root2.find("link/inertial/mass").get("value")) == 33e-3


def test_analytic_jacobians_match_jacfwd():
    """dynamics_jacobians (hand-derived, used by the fast VDE) must equal
    jax.jacfwd of the ODE at random states."""
    from crazyflie_nmpc_tpu.models.quadrotor import (
        QuadrotorParams,
        dynamics,
        dynamics_jacobians,
    )

    params = QuadrotorParams()
    key = jax.random.PRNGKey(7)
    for i in range(5):
        kx, ku, key = jax.random.split(key, 3)
        x = jax.random.normal(kx, (13,), jnp.float64)
        x = x.at[3:7].set(x[3:7] / jnp.linalg.norm(x[3:7]))
        u = 15.0 + jax.random.normal(ku, (4,), jnp.float64)
        Jx_ref = jax.jacfwd(lambda x_: dynamics(params, x_, u))(x)
        Ju_ref = jax.jacfwd(lambda u_: dynamics(params, x, u_))(u)
        Jx, Ju = dynamics_jacobians(params, x, u)
        np.testing.assert_allclose(np.asarray(Jx), np.asarray(Jx_ref),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(Ju), np.asarray(Ju_ref),
                                   rtol=1e-12, atol=1e-12)


def test_procedural_mesh_stl(tmp_path):
    """description.to_stl generates a valid binary STL whose geometry is
    derived from the MODEL constants (rotor discs at the X-configuration
    arm positions +-l/sqrt(2)) — the framework-side stand-in for the
    reference's shipped collada meshes, referenced from to_urdf."""
    import math
    import struct

    from crazyflie_nmpc_tpu.models import description as desc

    p = desc.cf21_identified()
    path = tmp_path / "cf.stl"
    data = desc.to_stl(p, path=str(path), segments=8)
    assert path.read_bytes() == data

    (n_tris,) = struct.unpack_from("<I", data, 80)
    assert len(data) == 84 + 50 * n_tris      # binary STL layout
    assert n_tris == 5 * 4 * 8                # 5 closed discs x 4 tris/seg

    # every vertex lies within the airframe envelope, and rotor-disc
    # vertices reach the arm positions: per-axis offset l (the model's
    # moment arm), radial distance l*sqrt(2)
    arm = float(p.l) * math.sqrt(2.0)
    xs = []
    for t in range(n_tris):
        off = 84 + 50 * t + 12
        for v in range(3):
            x, y, z = struct.unpack_from("<3f", data, off + 12 * v)
            xs.append((x, y, z))
    max_r = max(math.hypot(x, y) for x, y, _ in xs)
    assert max_r <= arm + 0.023 + 1e-6
    assert max_r >= arm                       # rotors actually out there

    # and the URDF can reference the generated asset
    doc = desc.to_urdf(p, mesh=f"file://{path}")
    assert f"file://{path}" in doc
