"""Bringup compositions — launch-file-equivalent wiring (SURVEY §2.1/2.4).

These are integration tests of the assembled stacks; the slow NMPC ones
are covered by test_closed_loop.py, so nmpc_predictor runs short here.
"""

import numpy as np
import pytest

from crazyflie_nmpc_tpu import bringup


def test_registry_covers_headline_launches():
    assert {"nmpc_predictor", "nmpc_attitude_bench", "pid_waypoints",
            "system_identification", "hover_demo", "position_demo",
            "multi_hover", "teleop", "thrust_identification",
            "high_level_mission"} <= set(bringup.BRINGUPS)


def test_bag_record_and_play(tmp_path):
    """crazy_AFL's rosbag-record side channel + bag_play replay."""
    bag_path = str(tmp_path / "afl.bag")
    out = bringup.nmpc_attitude_bench(steps=25, port=47163,
                                      bag_path=bag_path)
    assert out["cmd_vel"].shape == (25, 4)
    played = bringup.bag_play(bag_path)
    assert played["events_replayed"] == 25
    assert played["summary"]["cmd_vel"]["count"] == 25
    assert abs(played["summary"]["cmd_vel"]["rate_hz"] - 1 / 0.015) < 1.0


def test_nmpc_attitude_bench():
    out = bringup.nmpc_attitude_bench(steps=40, port=47151)
    # fake mocap kept publishing, the device saw cmd_vel setpoints, and the
    # hover-at-origin solution commands ~level attitude + hover thrust
    assert out["mocap_published"] == 40
    assert out["device_setpoint"] is not None
    cmd = out["cmd_vel"]
    assert cmd.shape == (40, 4)
    assert np.abs(cmd[-1, 0]) < 1.0 and np.abs(cmd[-1, 1]) < 1.0  # deg
    assert 30000 < cmd[-1, 3] < 60000  # hover-ish PWM


def test_pid_waypoints_completes():
    out = bringup.pid_waypoints(max_steps=4000)
    assert out["completed"], out
    assert out["waypoints_reached"] == out["n_goals"]
    assert out["final_z"] > 0.4


def test_system_identification_capture():
    out = bringup.system_identification(steps=60, port=47153)
    assert out["rows"] >= 60
    meas = out["measurements"]
    assert meas.shape[1] == 13
    # hovering plant: z stays near start, quaternion ~ identity
    assert abs(meas[-1, 3] - 1.0) < 0.05   # qw
    assert np.all(np.isfinite(meas))


def test_hover_and_position_and_teleop_bringups():
    out = bringup.hover_demo(port=47155)
    assert out["final_setpoint"]["type"] == "stop"
    out = bringup.position_demo(port=47157)
    assert out["final_setpoint"]["type"] == "stop"
    assert out["setpoints_sent"] > 30
    out = bringup.teleop(ticks=30, port=47159)
    sp = out["device_setpoint"]
    assert sp is not None
    roll, pitch, yawrate, thrust = sp
    assert roll == pytest.approx(3.0) and pitch == pytest.approx(-3.0)
    assert thrust == 36000


def test_multi_hover_two_vehicles():
    out = bringup.multi_hover(n=2, base_port=47161)
    assert out["vehicles"] == 2 and out["landed"]
    assert all(s["sent"] > 0 for s in out["stats"])


def test_thrust_identification_capture():
    """thrust_identification.launch + const_thrust.py: constant cmd_vel
    thrust streamed at 50 Hz, motor PWM echo logged at 10 ms."""
    out = bringup.thrust_identification(steps=30, port=47165,
                                        thrust_pwm=12000)
    assert out["rows"] >= 10
    assert np.allclose(out["motor_pwm"], 12000.0)
    # pwm2krpm inverts the krpm2pwm map (acados_mpc.cpp:421-425)
    assert out["implied_krpm"] == pytest.approx(
        (12000 * 0.2685 + 4070.3) / 1000.0, rel=1e-6)


def test_high_level_mission_script():
    """test_high_level.py FLOWN: param setup + takeoff / uploaded-poly
    startTrajectory / land / stop over the wire, with the vehicle side
    EXECUTING each command through the cascade (FlyingFirmwareSim) —
    the mission produces motion and the flown path matches the
    Polynomial4D evaluation (VERDICT r4 item 4)."""
    out = bringup.high_level_mission(port=47167)
    cmds = [c["cmd"] for c in out["hl_commands"]]
    assert cmds[0] == "define_trajectory"
    assert [c for c in cmds if c != "define_trajectory"][:4] == [
        "takeoff", "start_trajectory", "land", "stop"]
    assert out["wire_ok"]
    tk = next(c for c in out["hl_commands"] if c["cmd"] == "takeoff")
    assert tk["height"] == pytest.approx(0.5)
    assert out["params"] == {"commander/enHighLevel": 1,
                             "stabilizer/estimator": 2,
                             "stabilizer/controller": 2,
                             "kalman/resetEstimation": 1}
    # flight evidence: it flew the poly and landed back near the origin
    assert out["flown_ticks"] > 400
    assert out["max_tracking_err_m"] is not None
    assert out["max_tracking_err_m"] < 0.15
    assert out["landed"]
    assert abs(out["final_pos"][2]) < 0.08
    assert abs(out["final_pos"][0]) < 0.1 and abs(out["final_pos"][1]) < 0.1


def test_session_runs_panes_concurrently():
    """The tmux-workbench equivalent (tmux_create_panes/openinpane/
    clear_panes): two compositions side by side in one session, each on
    its own 'pane' thread with its own UDP port, both results collected
    (SURVEY section 2.4 misc row)."""
    out = bringup.session({
        "telemetry": ("telemetry", 0.6, 47171),
        "teleop": ("teleop", 20, 47173),
    })
    assert set(out) == {"telemetry", "teleop"}
    for pane, res in out.items():
        assert not isinstance(res, Exception), (pane, res)
    assert out["telemetry"]["records"]
    assert out["teleop"]["device_setpoint"] is not None

    # a crashing pane is isolated (tmux semantics): the session returns
    # the exception for that pane and the healthy pane's result
    out = bringup.session({
        "bad": ("bag_play", "/nonexistent/no.bag"),
        "ok": ("teleop", 10, 47175),
    })
    assert isinstance(out["bad"], Exception)
    assert out["ok"]["device_setpoint"] is not None
