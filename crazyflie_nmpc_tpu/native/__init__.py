"""Native (C++) runtime: CRTP codec + lock-free rings + link server.

Builds lazily with g++ on first use (no external deps); the shared library
lands next to this file.  See src/*.cc for the design notes and reference
citations.
"""

from crazyflie_nmpc_tpu.native.bindings import (  # noqa: F401
    LinkServer,
    build_library,
    decode_full_state,
    decode_setpoint,
    encode_full_state,
    encode_log_data,
    encode_setpoint,
    load_library,
    quat_compress,
    quat_decompress,
)
from crazyflie_nmpc_tpu.native.channels import (  # noqa: F401
    IMU_BLOCK,
    POSE_BLOCK,
    SENSORS_BLOCK,
    decode_channels,
    start_typed_channels,
    stop_typed_channels,
)
from crazyflie_nmpc_tpu.native.firmware_sim import FirmwareSim  # noqa: F401
from crazyflie_nmpc_tpu.native.hl_executor import (  # noqa: F401
    CascadeFirmwareSim,
    FlyingFirmwareSim,
)
