from crazyflie_nmpc_tpu.parallel.mesh import (  # noqa: F401
    BATCH_AXIS,
    STAGE_AXIS,
    make_mesh,
)
from crazyflie_nmpc_tpu.parallel.sharded import (  # noqa: F401
    batch_sharded_rti,
    stage_sharded_rti_step,
)
from crazyflie_nmpc_tpu.parallel.pod import (  # noqa: F401
    fleet_metrics,
    init_distributed,
    pod_rti_step,
)
