"""crazyflie_nmpc_tpu — a TPU-native real-time NMPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`bcbarbara/crazyflie_nmpc` (ROS + acados SQP-RTI stack for the Crazyflie 2.1
nano-quadrotor): quaternion quadrotor dynamics, ERK4 integration with forward
sensitivities, Gauss-Newton real-time-iteration SQP, a Riccati-based
primal-dual interior-point QP solver, time-delay compensation, reference
policies, state estimation, closed-loop simulation, and batched/sharded
execution over TPU device meshes.
"""

from crazyflie_nmpc_tpu.models.quadrotor import (  # noqa: F401
    NU,
    NX,
    NY,
    NYN,
    QuadrotorParams,
    dynamics,
    hover_control,
    hover_state,
)

__version__ = "0.1.0"
