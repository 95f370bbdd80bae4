from crazyflie_nmpc_tpu.solver.ocp import (  # noqa: F401
    CostSpec,
    OCPSpec,
    default_cost,
    diagonal_lls_cost,
    default_ocp,
    hover_yref,
)
from crazyflie_nmpc_tpu.solver.rti import (  # noqa: F401
    RTIOutput,
    RTIState,
    init_rti,
    as_rti_prepare,
    as_rti_step,
    rti_step,
    sqp_solve,
)
from crazyflie_nmpc_tpu.solver.outputs import (  # noqa: F401
    BodyTwist,
    krpm2pwm,
    pwm2krpm,
    to_cmd_vel,
)
from crazyflie_nmpc_tpu.solver import policies  # noqa: F401
