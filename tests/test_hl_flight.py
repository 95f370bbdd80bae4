"""The high-level wire mission, FLOWN (VERDICT r4 item 4).

The reference's hl_traj capability — takeoff, upload figure8,
startTrajectory, land, with the vehicle executing the polynomial
(crazyflie_server.cpp:920-992 services; test_high_level.py:1-50;
uav_trajectory.py:54-84 is the math the firmware evaluates) — closed
end to end over CRTP: `LinkServer` services on the host side,
`native.FlyingFirmwareSim` (HL planner + geometric position controller
+ onboard cascade + rigid-body physics) on the vehicle side.

Wire phases run under the firmware's real-time serve loop; flight
phases fast-forward simulated time via manual poll(), so the ~13 s
mission runs in a few wall seconds.
"""

import os
import time

import numpy as np
import pytest

import jax

from crazyflie_nmpc_tpu import native
from crazyflie_nmpc_tpu.utils import trajectories as traj

REF_CSV = "/root/reference/crazyflie_demo/scripts/figure8.csv"


def _wait(pred, timeout=6.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.005)
    return False


def _ff(fw, ms):
    """Fast-forward simulated time (serve loop must be stopped)."""
    for _ in range(ms // 15):
        fw.poll(15)


def test_poly4d_codec_roundtrip():
    """encode_poly4d/decode_poly4d: the trajectory-memory wire format
    (crazyflie_cpp poly4d layout, 132 B/piece) round-trips exactly at
    f32."""
    rng = np.random.default_rng(0)
    durations = rng.uniform(0.5, 2.0, 5)
    coeffs = rng.normal(size=(5, 4, 8))
    blob = traj.encode_poly4d(durations, coeffs)
    assert len(blob) == 5 * 132
    d2, c2 = traj.decode_poly4d(blob, 5)
    np.testing.assert_allclose(d2, durations.astype(np.float32), rtol=1e-7)
    np.testing.assert_allclose(c2, coeffs.astype(np.float32), rtol=1e-7)
    with pytest.raises(ValueError):
        traj.decode_poly4d(blob[:-1], 5)


@pytest.mark.skipif(not os.path.exists(REF_CSV),
                    reason="reference figure8.csv not available")
def test_figure8_wire_mission_flies():
    """Upload the reference figure8.csv over the mem port, start it with
    startTrajectory(relative=True), and assert the FLOWN path against
    the Polynomial4D evaluation — the behavior test_high_level.py +
    execute_trajectory.py demonstrate on hardware."""
    durations, coeffs = traj.load_poly_csv(REF_CSV)
    total = float(np.sum(durations))

    with native.FlyingFirmwareSim(47311).serve() as fw, \
            native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47311, 47312)
        toc = server.download_param_toc(1)
        server.set_param(1, toc["commander/enHighLevel"][0], 1,
                         ptype="uint8")
        server.upload_trajectory(
            1, traj_id=7, data=traj.encode_poly4d(durations, coeffs),
            n_pieces=len(durations))
        assert server.takeoff(1, height=0.5, duration=2.0)
        assert _wait(lambda: any(c["cmd"] == "takeoff"
                                 for c in fw.hl_commands))
        assert _wait(lambda: 7 in fw.trajectories)

        fw.stop_serving()
        _ff(fw, 3000)
        assert abs(fw.x[2] - 0.5) < 0.02          # climbed to height
        assert fw.flying
        start_pos = fw.x[:3].copy()

        fw.serve()
        assert server.start_trajectory(1, 7, timescale=1.0, relative=True)
        assert _wait(lambda: any(c["cmd"] == "start_trajectory"
                                 for c in fw.hl_commands))
        fw.stop_serving()
        t0_ms = fw.seg_t0_ms
        _ff(fw, int(total * 1000) + 300)

        # flown path vs the Polynomial4D evaluation, shifted to the
        # relative start (firmware relative-trajectory semantics)
        shift = start_pos - np.asarray(coeffs[0, :3, 0])
        errs = []
        for t, x in fw.flown:
            tau = t - t0_ms / 1000.0
            if 0.0 <= tau <= total:
                f = traj.eval_flat_outputs(durations, coeffs, tau)
                errs.append(np.abs(x[:3] - (np.asarray(f["pos"]) + shift)
                                   ).max())
        errs = np.array(errs)
        assert len(errs) > 400                    # ~7.3 s at 15 ms ticks
        # measured 0.080 m max on this cascade+controller (driver run);
        # bound leaves ~2x headroom without hiding a broken executor
        assert errs.max() < 0.15, errs.max()
        assert np.percentile(errs, 95) < 0.12

        # land and verify touchdown
        fw.serve()
        assert server.land(1, height=0.0, duration=2.0)
        assert _wait(lambda: any(c["cmd"] == "land"
                                 for c in fw.hl_commands))
        fw.stop_serving()
        _ff(fw, 2600)
        assert not fw.flying
        assert fw.x[2] < 0.06


def test_grouped_hl_mission_multi_vehicle():
    """Group-mask semantics (SetGroupMask service + the group byte on
    every HL command, crazyflie_server.cpp:911-916): a broadcast
    takeoff addressed to group 1 lifts only the group-1 members; the
    group-2 vehicle stays on the ground until ITS group is addressed —
    the firmware behavior a multi-drone HL deployment (crazyswarm
    style) relies on."""
    import contextlib

    with contextlib.ExitStack() as stack:
        fws = [stack.enter_context(native.FlyingFirmwareSim(47330 + 2 * i))
               for i in range(3)]
        server = stack.enter_context(native.LinkServer())
        for i in range(3):
            server.add_vehicle(i + 1, "127.0.0.1", 47330 + 2 * i,
                               47330 + 2 * i + 1)

        def pump(ms, real_s=0.25):
            """Deliver queued wire traffic + advance sim time."""
            deadline = time.time() + real_s
            while time.time() < deadline:
                time.sleep(0.005)
            for fw in fws:
                for _ in range(ms // 15):
                    fw.poll(15)

        for vid, mask in ((1, 0b01), (2, 0b01), (3, 0b10)):
            assert server.set_group_mask(vid, mask)
        pump(30)
        assert [fw.group_mask for fw in fws] == [1, 1, 2]

        # broadcast to group 1: every vehicle RECEIVES it, only members fly
        for vid in (1, 2, 3):
            server.takeoff(vid, height=0.4, duration=1.5, group_mask=1)
        pump(2200)
        assert fws[0].flying and fws[1].flying
        assert not fws[2].flying and fws[2].x[2] < 0.05
        assert abs(fws[0].x[2] - 0.4) < 0.03
        assert abs(fws[1].x[2] - 0.4) < 0.03

        # now address group 2: the third vehicle lifts, group 1 unaffected
        for vid in (1, 2, 3):
            server.takeoff(vid, height=0.3, duration=1.5, group_mask=2)
        pump(2200)
        assert fws[2].flying
        assert abs(fws[2].x[2] - 0.3) < 0.03
        assert abs(fws[0].x[2] - 0.4) < 0.03   # group 1 kept its height

        # land group 1 only
        for vid in (1, 2, 3):
            server.land(vid, height=0.0, duration=1.5, group_mask=1)
        pump(2400)
        assert not fws[0].flying and not fws[1].flying
        assert fws[2].flying and abs(fws[2].x[2] - 0.3) < 0.03


def test_poly4d_timescale_and_reverse():
    """_Poly4D honors the firmware's timescale (time-warp: f(t/ts),
    velocities 1/ts) and reversed semantics (p(T - t))."""
    from crazyflie_nmpc_tpu.native.hl_executor import _Poly4D

    rng = np.random.default_rng(1)
    durations = np.array([1.0, 1.5])
    coeffs = rng.normal(size=(2, 4, 8)) * 0.2
    z = np.zeros(3)

    plain = _Poly4D(durations, coeffs, z, 1.0, False)
    slow = _Poly4D(durations, coeffs, z, 2.0, False)
    for t in (0.3, 1.2, 2.2):
        a, b = plain(t), slow(2 * t)
        np.testing.assert_allclose(b["pos"], a["pos"], atol=1e-9)
        np.testing.assert_allclose(b["vel"], a["vel"] / 2.0, atol=1e-9)
        np.testing.assert_allclose(b["acc"], a["acc"] / 4.0, atol=1e-9)
    assert slow.duration == pytest.approx(2 * plain.duration)

    rev = _Poly4D(durations, coeffs, z, 1.0, True)
    total = float(durations.sum())
    for t in (0.1, 0.9, 1.7, 2.4):
        np.testing.assert_allclose(rev(t)["pos"],
                                   plain(total - t)["pos"], atol=1e-9)
        np.testing.assert_allclose(rev(t)["vel"],
                                   -plain(total - t)["vel"], atol=1e-8)
