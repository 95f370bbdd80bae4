"""Demo / user-API layer — the crazyflie_demo package equivalents.

The reference's L6 layer (SURVEY.md §2.4) is a set of ROS scripts that
drive the stack through topics and services.  Here each becomes a small,
clock-injectable component that drives the native link server (or any
object with the same send_* surface), so every demo is unit-testable
against the firmware simulator without wall-clock sleeps:

- hover.HoverDemo          — Hover.py: velocity-hover (`cmd_hover`) goTo
  state machine incl. the two-vehicle threaded variant
- position.position_demo   — Position.py: `cmd_position` takeoff/hold/land
- waypoints.WaypointSequencer — demo.py: goal advance within 0.3 m / 10°
- full_state_stream.stream_trajectory — execute_trajectory.py: 100 Hz
  differential-flatness full-state streaming
- mocap.FakeMocapBridge / MocapBridge — publish_external_position_*.py
- teleop.Teleop            — quadrotor_teleop.cpp axis mapping
"""

from crazyflie_nmpc_tpu.demo.hover import HoverDemo  # noqa: F401
from crazyflie_nmpc_tpu.demo.position import position_demo  # noqa: F401
from crazyflie_nmpc_tpu.demo.waypoints import WaypointSequencer  # noqa: F401
from crazyflie_nmpc_tpu.demo.full_state_stream import (  # noqa: F401
    stream_trajectory,
)
from crazyflie_nmpc_tpu.demo.mocap import (  # noqa: F401
    FakeMocapBridge,
    MocapBridge,
)
from crazyflie_nmpc_tpu.demo.teleop import Teleop, TeleopAxisConfig  # noqa: F401
