"""Demo / user-API layer — crazyflie_demo script equivalents (SURVEY §2.4).

Each demo drives a link object; tests use either a recording fake link
(fast, deterministic via an injected clock) or the real native link server
against the firmware simulator (end-to-end).
"""

import math

import numpy as np
import pytest

from crazyflie_nmpc_tpu.demo import (
    FakeMocapBridge,
    HoverDemo,
    MocapBridge,
    Teleop,
    TeleopAxisConfig,
    WaypointSequencer,
    position_demo,
    stream_trajectory,
)
from crazyflie_nmpc_tpu.demo.hover import run_two_vehicle_demo


class FakeClock:
    """Deterministic time: sleep() advances now() instantly."""

    def __init__(self):
        self.t = 0.0

    def sleep(self, dt):
        self.t += dt

    def now(self):
        return self.t


class RecordingLink:
    """LinkServer-compatible recorder (thread-safe enough for the demos)."""

    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)

        def record(*args, **kw):
            self.calls.append((name, args, kw))
            return True

        return record

    def of(self, kind):
        return [c for c in self.calls if c[0] == kind]


def test_hover_demo_flight_plan():
    clock = FakeClock()
    link = RecordingLink()
    demo = HoverDemo(link, 1, sleep=clock.sleep, now=clock.now)
    demo.take_off(0.4)
    assert demo.z_distance == 0.4
    hovers = link.of("send_hover")
    # takeoff ramps z in 0.1 steps up to 0.4
    zs = [c[1][4] for c in hovers]
    assert zs[0] == 0.0 and max(zs) <= 0.4

    n0 = len(link.of("send_hover"))
    demo.go_to(0.3, 0.0, 0.4)          # pure x move at +0.1 m/s for 3 s
    moves = link.of("send_hover")[n0:]
    assert len(moves) >= 30            # 3 s at 10 Hz
    assert all(abs(c[1][1] - 0.1) < 1e-9 for c in moves)  # vx = +0.1
    assert all(c[1][2] == 0.0 for c in moves)             # vy = 0

    demo.land()
    assert link.of("send_stop")
    assert demo.z_distance == 0.0


def test_hover_two_vehicle_threads():
    clock = FakeClock()
    link = RecordingLink()
    demos = run_two_vehicle_demo(link, vids=(1, 2), sleep=clock.sleep,
                                 now=clock.now)
    assert all(d.z_distance == 0.0 for d in demos)
    vids = {c[1][0] for c in link.of("send_hover")}
    assert vids == {1, 2}
    assert len(link.of("send_stop")) == 2


def test_position_demo_sequence():
    clock = FakeClock()
    link = RecordingLink()
    sent = position_demo(link, 1, target=(0.0, 0.0, 0.4),
                         sleep=clock.sleep)
    zs = [s[2] for s in sent]
    # takeoff ramp k/25 for 10 ticks (Position.py:43-59)
    np.testing.assert_allclose(zs[:10], [k / 25.0 for k in range(10)])
    # hold at the target
    assert zs[10:30] == [0.4] * 20
    # landing descends monotonically
    assert all(a >= b - 1e-9 for a, b in zip(zs[30:], zs[31:]))
    assert link.of("send_stop")


def test_waypoint_sequencer_advance_rules():
    goals = [(0, 0, 0.5, 0.0, 0.0), (1.0, 0.0, 0.5, 0.0, 0.5),
             (1.0, 1.0, 0.5, math.pi / 2, 0.0)]
    published = []
    seq = WaypointSequencer(goals, lambda *g: published.append(g))

    # far away: goal 0 republished, no advance
    seq.tick((5.0, 5.0, 5.0, 0.0), t=0.0)
    assert seq.index == 0 and published[-1][:3] == (0, 0, 0.5)

    # within tolerance box (0.3 m / 10 deg) → advance after dwell 0
    seq.tick((0.1, -0.1, 0.45, math.radians(5)), t=0.1)
    seq.tick((0.1, -0.1, 0.45, math.radians(5)), t=0.2)
    assert seq.index == 1

    # goal 1 has 0.5 s dwell: arriving does not advance immediately
    seq.tick((1.0, 0.0, 0.5, 0.0), t=0.3)
    assert seq.index == 1
    seq.tick((1.0, 0.0, 0.5, 0.0), t=0.9)
    assert seq.index == 2

    # yaw outside 10 deg blocks the final advance
    alive = seq.tick((1.0, 1.0, 0.5, 0.0), t=1.0)
    assert alive and seq.index == 2
    seq.tick((1.0, 1.0, 0.5, math.pi / 2), t=1.1)
    alive = seq.tick((1.0, 1.0, 0.5, math.pi / 2), t=1.2)
    assert not alive  # plan complete


def test_full_state_stream_follows_polynomial():
    from crazyflie_nmpc_tpu.models import QuadrotorParams

    clock = FakeClock()
    link = RecordingLink()
    # single 2 s piece: x(t) = t/2 (gentle line), others constant
    coeffs = np.zeros((1, 4, 8))
    coeffs[0, 0, 1] = 0.5        # x = 0.5 t
    coeffs[0, 2, 0] = 0.5        # z = 0.5
    durations = np.array([2.0])
    n = stream_trajectory(link, 1, durations, coeffs, QuadrotorParams(),
                          rate_hz=100.0, sleep=clock.sleep, now=clock.now)
    assert n == pytest.approx(200, abs=2)
    calls = link.of("send_full_state")
    assert len(calls) == n
    # mid-trajectory sample: pos ~ (0.5, 0, 0.5), vel ~ (0.5, 0, 0)
    mid = calls[len(calls) // 2][1]
    pos, vel = np.asarray(mid[1]), np.asarray(mid[2])
    np.testing.assert_allclose(pos, [0.5, 0.0, 0.5], atol=0.02)
    np.testing.assert_allclose(vel, [0.5, 0.0, 0.0], atol=0.02)


def test_fake_mocap_bridge():
    clock = FakeClock()
    link = RecordingLink()
    bridge = FakeMocapBridge(link, 1, origin=(0.1, -0.2, 0.0),
                             sleep=clock.sleep)
    n = bridge.run(10)
    assert n == 10
    calls = link.of("send_external_position")
    assert len(calls) == 10
    assert calls[0][1] == (1, 0.1, -0.2, 0.0)
    assert clock.t == pytest.approx(1.0)  # 10 samples at 10 Hz


def test_mocap_bridge_ekf_init():
    clock = FakeClock()
    link = RecordingLink()
    bridge = MocapBridge(link, 1, pose_source=lambda: (1.0, 2.0, 0.3),
                         ekf_init_params=(10, 11, 12, 13),
                         sleep=clock.sleep)
    bridge.run(3)
    sets = link.of("set_param")
    # one-time init: X/Y/Z + reset pulse (1 then 0), not repeated per sample
    assert [c[1][1] for c in sets] == [10, 11, 12, 13, 13]
    assert sets[0][1][2] == 1.0 and sets[3][1][2] == 1
    assert len(link.of("send_external_position")) == 3


def test_teleop_mapping_and_buttons():
    clock = FakeClock()
    link = RecordingLink()
    axes = {"v": (0.5, -1.0, 0.25, 0.0)}
    buttons = {"v": {}}
    tele = Teleop(link, 1, axes_source=lambda: axes["v"],
                  buttons_source=lambda: buttons["v"],
                  config=TeleopAxisConfig(invert_pitch=True),
                  sleep=clock.sleep)
    tele.run(5)
    sp = link.of("send_setpoint")
    assert len(sp) == 5
    _, args, _ = sp[0]
    assert args == (1, 15.0, 30.0, 50.0, 30000)  # scaled + pitch inverted

    buttons["v"] = {"takeoff": True}
    tele.step()
    assert link.of("takeoff")
    buttons["v"] = {"land": True}
    tele.step()
    assert link.of("land")
    buttons["v"] = {"emergency": True}
    assert tele.step() is False
    assert tele.emergency_latched and link.of("emergency")


def test_demos_against_real_link_and_firmware():
    """End-to-end: hover + position demos through the native link server
    into the firmware simulator."""
    native = pytest.importorskip("crazyflie_nmpc_tpu.native")
    from crazyflie_nmpc_tpu.native import FirmwareSim

    import time

    with FirmwareSim(47031).serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47031, 47032)
        fast = lambda dt: time.sleep(min(dt, 0.002))  # noqa: E731
        demo = HoverDemo(server, 1, sleep=fast)
        demo.take_off(0.2)
        deadline = time.time() + 3.0
        while time.time() < deadline:
            sp = fw.last_generic_setpoint
            if sp and sp["type"] == "hover":
                break
            time.sleep(0.01)
        assert fw.last_generic_setpoint["type"] == "hover"

        position_demo(server, 1, target=(0.0, 0.0, 0.4), sleep=fast,
                      kalman_reset_param=fw.param_ids[
                          "kalman/resetEstimation"])
        deadline = time.time() + 3.0
        while time.time() < deadline:
            sp = fw.last_generic_setpoint
            if sp and sp["type"] == "stop":
                break
            time.sleep(0.01)
        assert fw.last_generic_setpoint["type"] == "stop"
        assert fw.get_param("kalman/resetEstimation") == 0
