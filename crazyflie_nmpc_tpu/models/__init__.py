from crazyflie_nmpc_tpu.models.quadrotor import (  # noqa: F401
    NU,
    NX,
    NY,
    NYN,
    W_MAX_KRPM,
    W_MIN_KRPM,
    QuadrotorParams,
    dynamics,
    hover_control,
    hover_state,
)
from crazyflie_nmpc_tpu.models import rotations  # noqa: F401
from crazyflie_nmpc_tpu.models.cartpole import (  # noqa: F401
    CP_NU,
    CP_NX,
    CP_NY,
    CartpoleParams,
    cartpole_dynamics,
    cartpole_ocp,
    downward_state,
    upright_state,
)
