from crazyflie_nmpc_tpu.utils.trajectories import (  # noqa: F401
    eval_flat_outputs,
    flat_to_state,
    helix_trajectory,
    load_poly_csv,
    load_traj_txt,
    sample_poly_trajectory,
    save_traj_txt,
    smooth_step_trajectory,
)
from crazyflie_nmpc_tpu.utils import profiling  # noqa: F401
