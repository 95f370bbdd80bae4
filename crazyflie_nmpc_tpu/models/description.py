"""Vehicle description presets — the crazyflie_description equivalent.

The reference ships URDF xacro models whose inertial blocks differ from
the controller's *identified* model constants (SURVEY.md §2.5): the NMPC
uses the system-identification values (export_ode_model.py:33-42, mass
33 g including a mocap marker), while the URDF carries the bare-airframe
datasheet values (crazyflie2.urdf.xacro:8-15, mass 27 g).  Both are
exposed here as named `QuadrotorParams` presets; visualization
meshes/rviz configs have no TPU-side role and are out of scope
(SURVEY.md §7 non-goals).
"""

from __future__ import annotations

from crazyflie_nmpc_tpu.models.quadrotor import QuadrotorParams


def cf21_identified(**overrides) -> QuadrotorParams:
    """Crazyflie 2.1 + mocap marker, sysid values — the NMPC model
    (export_ode_model.py:33-42).  This is the `QuadrotorParams()` default."""
    return QuadrotorParams(**overrides)


def cf2_urdf(**overrides) -> QuadrotorParams:
    """Crazyflie 2.x bare airframe, URDF datasheet inertials
    (crazyflie2.urdf.xacro:10-13: mass 0.027, Ixx=Iyy=2.3951e-5,
    Izz=3.2347e-5)."""
    kw = dict(mq=0.027, Ixx=2.3951e-5, Iyy=2.3951e-5, Izz=3.2347e-5)
    kw.update(overrides)
    return QuadrotorParams(**kw)


def cf1_urdf(**overrides) -> QuadrotorParams:
    """Crazyflie 1.0 (crazyflie.urdf.xacro:6-11: mass 0.019,
    Ixx=Iyy=0.01152, Izz=0.0218 — the URDF's values verbatim)."""
    kw = dict(mq=0.019, Ixx=0.01152, Iyy=0.01152, Izz=0.0218)
    kw.update(overrides)
    return QuadrotorParams(**kw)


# rotor aerodynamic constants from the xacro property block
# (crazyflie2.urdf.xacro:5-6), kept for sim fidelity extensions
ROTOR_DRAG_COEFFICIENT = 1.8580e-05  # [N m s^2]
MOMENT_CONSTANT = 0.005              # [N s^2]

PRESETS = {
    "cf21_identified": cf21_identified,
    "cf2_urdf": cf2_urdf,
    "cf1_urdf": cf1_urdf,
}


def params_for(model: str, **overrides) -> QuadrotorParams:
    """Look up a preset by name (the `model` arg a bringup would take)."""
    try:
        return PRESETS[model](**overrides)
    except KeyError:
        raise KeyError(
            f"unknown vehicle model {model!r}; have {sorted(PRESETS)}"
        ) from None
