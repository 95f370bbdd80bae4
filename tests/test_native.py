"""Native link layer: codec roundtrips + loopback UDP link-server test."""

import socket
import struct
import time

import numpy as np
import pytest

native = pytest.importorskip("crazyflie_nmpc_tpu.native")


def test_build():
    path = native.build_library()
    assert path.endswith("libcfl.so")


def test_setpoint_roundtrip():
    buf = native.encode_setpoint(2.5, -1.25, 30.0, 45000)
    assert len(buf) == 15          # header + 3 floats + u16
    assert buf[0] == (0x3 << 4)    # commander port, channel 0
    # independent decode with struct (the wire layout contract)
    roll, pitch, yawrate, thrust = struct.unpack("<fffH", buf[1:])
    assert (roll, pitch, yawrate, thrust) == (2.5, -1.25, 30.0, 45000)
    r, p, y, t = native.decode_setpoint(buf)
    assert (r, p, y, t) == (2.5, -1.25, 30.0, 45000)


def test_quat_compress_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        q = rng.standard_normal(4).astype(np.float32)
        q /= np.linalg.norm(q)
        comp = native.quat_compress(q)
        q2 = native.quat_decompress(comp)
        # same rotation up to sign, ~10-bit quantization
        err = min(np.abs(q2 - q).max(), np.abs(q2 + q).max())
        assert err < 3e-3, (q, q2)


def test_full_state_roundtrip():
    pos = [1.234, -0.5, 0.75]
    vel = [0.1, 0.2, -0.3]
    acc = [0.0, 0.0, 9.81]
    quat = [0.9238795, 0.0, 0.3826834, 0.0]
    omega = [0.5, -0.25, 1.0]
    buf = native.encode_full_state(pos, vel, acc, quat, omega)
    assert len(buf) == 30  # header + type + 28 payload
    out = native.decode_full_state(buf)
    np.testing.assert_allclose(out["pos"], pos, atol=1e-3)   # mm quantized
    np.testing.assert_allclose(out["vel"], vel, atol=1e-3)
    np.testing.assert_allclose(out["acc"], acc, atol=1e-3)
    np.testing.assert_allclose(out["omega"], omega, atol=1e-3)
    err = min(np.abs(out["quat"] - np.float32(quat)).max(),
              np.abs(out["quat"] + np.float32(quat)).max())
    assert err < 3e-3


class FakeVehicle:
    """A UDP endpoint standing in for the drone side of the link."""

    def __init__(self, port):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", port))
        self.sock.settimeout(2.0)
        self.packets = []

    def recv_some(self, n, timeout=3.0):
        deadline = time.time() + timeout
        while len(self.packets) < n and time.time() < deadline:
            try:
                data, addr = self.sock.recvfrom(64)
                self.packets.append(data)
                self.last_addr = addr
            except socket.timeout:
                break
        return self.packets

    def close(self):
        self.sock.close()


def test_link_server_loopback():
    drone = FakeVehicle(47001)
    with native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47001, 47002)

        # thrust-lock release: first 100 packets are zero setpoints
        pkts = drone.recv_some(100)
        assert len(pkts) >= 100
        r, p, y, t = native.decode_setpoint(pkts[0])
        assert (r, p, y, t) == (0.0, 0.0, 0.0, 0)

        # command path
        assert server.send_setpoint(1, 1.0, -2.0, 3.0, 42000)
        deadline = time.time() + 3.0
        found = None
        while time.time() < deadline and found is None:
            for raw in drone.recv_some(len(drone.packets) + 5, timeout=0.5):
                try:
                    vals = native.decode_setpoint(raw)
                except ValueError:
                    continue
                if vals[3] == 42000:
                    found = vals
                    break
        assert found == (1.0, -2.0, 3.0, 42000)

        # keep-alive pings flow when idle (port 15 header 0xF3)
        assert any(raw[0] == 0xF3 for raw in drone.packets)

        # telemetry path: inject a log-data packet, expect it decoded
        payload = struct.pack("<fff", 1.0, 2.0, 3.0)
        logbuf = native.encode_log_data(7, 123456, payload)
        drone.sock.sendto(logbuf, drone.last_addr)
        rec = None
        deadline = time.time() + 3.0
        while rec is None and time.time() < deadline:
            rec = server.poll_log(1)
            time.sleep(0.01)
        assert rec is not None
        assert rec["block_id"] == 7
        assert rec["timestamp_ms"] == 123456
        assert struct.unpack("<fff", rec["payload"]) == (1.0, 2.0, 3.0)

        # stats + emergency latch
        st = server.stats(1)
        assert st["sent"] >= 101
        assert st["received"] >= 1
        server.emergency(1)
        time.sleep(0.1)
        tail = len(drone.packets)
        drone.recv_some(tail + 50, timeout=0.5)
        # after emergency the loop halts: last packets include a stop +
        # zero setpoint, then silence
        time.sleep(0.3)
        n_after = len(drone.recv_some(len(drone.packets) + 5, timeout=0.3))
        time.sleep(0.3)
        assert len(drone.recv_some(n_after + 5, timeout=0.3)) == n_after
    drone.close()


# ---- full protocol stack against the pure-Python firmware simulator ------
# (cross-implementation: C++ codec on the server side, struct-based Python
# on the device side — agreement validates the wire format itself.)

def _wait(pred, timeout=5.0, dt=0.01):
    deadline = time.time() + timeout
    while time.time() < deadline:
        v = pred()
        if v:
            return v
        time.sleep(dt)
    return pred()


def _poll_port(server, vid, port, timeout=5.0):
    """Poll downlink packets until one from `port` arrives (skips the
    console greeting and other traffic)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        pkt = server.poll_packet(vid)
        if pkt is not None and pkt[0] >> 4 == port:
            return pkt
        time.sleep(0.005)
    return None


def test_param_protocol():
    from crazyflie_nmpc_tpu.native import FirmwareSim

    with FirmwareSim(47011).serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47011, 47012)
        pid = fw.param_ids["commander/enHighLevel"]

        # write: firmware table updates and acks with the new value
        assert server.set_param(1, pid, 1, "uint8")
        assert _wait(lambda: fw.get_param("commander/enHighLevel") == 1)
        pkt = _poll_port(server, 1, 0x2)
        header, payload = pkt
        assert header >> 4 == 0x2 and header & 0x3 == 1
        rid, tb = struct.unpack("<HB", payload[:3])
        assert rid == pid and tb == 0x00 and payload[3] == 1

        # typed float param
        fid = fw.add_param("posCtlPid/xKp", 0x08, 2.0)
        assert server.set_param(1, fid, 3.5, "float")
        assert _wait(lambda: fw.get_param("posCtlPid/xKp") == 3.5)

        # read request → value response
        time.sleep(0.1)
        while server.poll_packet(1):
            pass
        assert server.request_param(1, fid)
        pkt = _poll_port(server, 1, 0x2)
        rid, tb = struct.unpack("<HB", pkt[1][:3])
        assert rid == fid and tb == 0x08
        assert struct.unpack("<f", pkt[1][3:7])[0] == 3.5

        # TOC info
        assert server.request_param_toc_info(1)
        pkt = _poll_port(server, 1, 0x2)
        assert pkt[1][0] == 3
        count, crc = struct.unpack("<HI", pkt[1][1:7])
        assert count == len(fw.params)


def test_log_block_streaming():
    from crazyflie_nmpc_tpu.native import FirmwareSim

    state = {"gyro.x": 0.5, "gyro.y": -1.5, "gyro.z": 2.5}
    fw = FirmwareSim(47013, state_provider=lambda n: state.get(n, 0.0))
    with fw.serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47013, 47014)
        gx = fw.log_vars["gyro.x"][0]
        gy = fw.log_vars["gyro.y"][0]
        gz = fw.log_vars["gyro.z"][0]
        # create block of 3 floats, start at 10 ms period (start(1) // 10ms)
        assert server.log_create_block(1, 5, [(7, gx), (7, gy), (7, gz)])
        assert server.log_start_block(1, 5, 1)
        rec = _wait(lambda: server.poll_log(1))
        assert rec is not None and rec["block_id"] == 5
        assert struct.unpack("<fff", rec["payload"]) == (0.5, -1.5, 2.5)

        # stream continues (10 ms period → many records per second)
        n0 = 0
        deadline = time.time() + 2.0
        while time.time() < deadline and n0 < 10:
            if server.poll_log(1):
                n0 += 1
        assert n0 >= 10

        # stop: stream halts
        assert server.log_stop_block(1, 5)
        time.sleep(0.2)
        while server.poll_log(1):
            pass
        time.sleep(0.3)
        assert server.poll_log(1) is None


def test_high_level_commander():
    from crazyflie_nmpc_tpu.native import FirmwareSim

    with FirmwareSim(47015).serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47015, 47016)
        assert server.takeoff(1, height=0.6, duration=2.0)
        assert server.go_to(1, 1.0, -0.5, 0.8, 0.25, 3.0)
        assert server.land(1, height=0.04, duration=2.5)

        assert server.set_group_mask(1, 0b101)
        assert server.hl_stop(1, group_mask=0b001)

        cmds = _wait(lambda: fw.hl_commands
                     if len(fw.hl_commands) >= 5 else None)
        assert [c["cmd"] for c in cmds[:5]] == [
            "takeoff", "go_to", "land", "set_group_mask", "stop"]
        assert abs(cmds[0]["height"] - 0.6) < 1e-6
        assert abs(cmds[1]["x"] - 1.0) < 1e-6
        assert abs(cmds[1]["yaw"] - 0.25) < 1e-6
        assert abs(cmds[2]["duration"] - 2.5) < 1e-6
        assert cmds[3]["group"] == 0b101
        assert cmds[4]["group"] == 0b001


def test_trajectory_upload():
    from crazyflie_nmpc_tpu.native import FirmwareSim

    with FirmwareSim(47017).serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47017, 47018)
        # a poly4d piece is 33 floats (duration + 4*8 coeffs) = 132 B
        blob = struct.pack("<33f", *(float(i) / 7 for i in range(33))) * 2
        n = server.upload_trajectory(1, traj_id=3, data=blob, n_pieces=2)
        assert n == (len(blob) + 23) // 24 + 1

        assert _wait(lambda: 3 in fw.trajectories)
        off, pieces = fw.trajectories[3]
        assert (off, pieces) == (0, 2)
        assert bytes(fw.trajectory_mem[:len(blob)]) == blob

        assert server.start_trajectory(1, 3, timescale=2.0)
        cmd = _wait(lambda: next((c for c in fw.hl_commands
                                  if c["cmd"] == "start_trajectory"), None))
        assert cmd["traj_id"] == 3 and cmd["timescale"] == 2.0


def test_console_and_generic_setpoints():
    from crazyflie_nmpc_tpu.native import FirmwareSim

    with FirmwareSim(47019).serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47019, 47020)
        # console greeting arrives as a non-log downlink packet
        pkt = _poll_port(server, 1, 0x0)
        assert pkt is not None
        header, payload = pkt
        assert payload.decode().startswith("CFSIM")

        # hover / position setpoints (cmd_hover / cmd_position topics)
        assert server.send_hover(1, 0.1, -0.2, 15.0, 0.4)
        sp = _wait(lambda: fw.last_generic_setpoint)
        assert sp["type"] == "hover" and abs(sp["z_distance"] - 0.4) < 1e-6
        assert server.send_position(1, 0.5, 0.6, 0.7, 90.0)
        sp = _wait(lambda: fw.last_generic_setpoint
                   if fw.last_generic_setpoint["type"] == "position"
                   else None)
        assert abs(sp["x"] - 0.5) < 1e-6 and abs(sp["yaw"] - 90.0) < 1e-6

        # generic raw packet path (srv/sendPacket): platform port echo into
        # the firmware is at least accepted without error
        assert server.send_packet(1, 0xD0, b"\x01\x02")


def test_external_pose_roundtrip():
    """Full mocap pose through the link: C++ encode (smallest-three quat)
    -> Python firmware decode, vicon external-pose bridge equivalent."""
    from crazyflie_nmpc_tpu.native import FirmwareSim, quat_decompress

    with FirmwareSim(47021).serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47021, 47022)
        q = [0.9238795, 0.0, 0.3826834, 0.0]
        assert server.send_external_pose(1, 1.5, -0.5, 0.8, q)
        pose = _wait(lambda: fw.external_poses[-1]
                     if fw.external_poses else None)
        x, y, z, comp = pose
        np.testing.assert_allclose([x, y, z], [1.5, -0.5, 0.8], rtol=1e-6)
        q2 = quat_decompress(comp)
        import numpy as _np
        err = min(_np.abs(q2 - _np.float32(q)).max(),
                  _np.abs(q2 + _np.float32(q)).max())
        assert err < 3e-3


def test_toc_download():
    """Full param + log TOC download (crazyflie_tools listParams /
    listLogVariables parity)."""
    from crazyflie_nmpc_tpu.native import FirmwareSim

    with FirmwareSim(47023).serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47023, 47024)
        params = server.download_param_toc(1)
        assert len(params) == len(fw.params)
        pid, tb = params["commander/enHighLevel"]
        assert pid == fw.param_ids["commander/enHighLevel"] and tb == 0x00

        logs = server.download_log_toc(1)
        assert len(logs) == len(fw.log_vars)
        vid, tb = logs["gyro.x"]
        assert vid == fw.log_vars["gyro.x"][0] and tb == 7


def test_typed_telemetry_channels():
    """The reference server's typed channel set, instanced and converted
    (VERDICT r3 item 7): imu at 10 ms with deg/s->rad/s + g->m/s^2
    conversions (crazyflie_server.cpp:779-786), and the 100 ms sensors
    block carrying battery [V], baro temp [degC] / pressure [hPa],
    magnetic field [T], and rssi [dB] (crazyflie_server.cpp:600-616,
    800-835, 880-885)."""
    from crazyflie_nmpc_tpu.native import (
        IMU_BLOCK,
        SENSORS_BLOCK,
        FirmwareSim,
        decode_channels,
        start_typed_channels,
        stop_typed_channels,
    )
    from crazyflie_nmpc_tpu.native.channels import RSSI_BLOCK

    state = {"gyro.x": 57.29578, "gyro.y": -114.59156, "gyro.z": 0.0,
             "acc.x": 0.0, "acc.y": 0.0, "acc.z": 1.0,
             "mag.x": 2.5e-5, "mag.y": -1e-5, "mag.z": 4e-5,
             "baro.temp": 24.5, "baro.pressure": 1012.25,
             "pm.vbat": 3.92, "radio.rssi": -54.0}
    fw = FirmwareSim(47017, state_provider=lambda n: state.get(n, 0.0))
    with fw.serve() as fw, native.LinkServer() as server:
        server.add_vehicle(1, "127.0.0.1", 47017, 47018)
        toc = server.download_log_toc(1)
        layout = start_typed_channels(server, 1, toc)
        assert set(layout) == {IMU_BLOCK, SENSORS_BLOCK, RSSI_BLOCK}

        seen = {}
        deadline = time.time() + 5.0
        while time.time() < deadline and len(seen) < 3:
            rec = server.poll_log(1)
            if rec is None:
                time.sleep(0.005)
                continue
            ch = decode_channels(rec, layout)
            if ch is not None:
                seen.setdefault(rec["block_id"], ch)
        assert set(seen) == {IMU_BLOCK, SENSORS_BLOCK, RSSI_BLOCK}

        imu = seen[IMU_BLOCK]
        # deg/s -> rad/s (57.29578 deg/s == 1 rad/s), g -> m/s^2
        np.testing.assert_allclose(imu["angular_velocity"],
                                   (1.0, -2.0, 0.0), atol=1e-5)
        np.testing.assert_allclose(imu["linear_acceleration"],
                                   (0.0, 0.0, 9.81), atol=1e-5)

        sens = seen[SENSORS_BLOCK]
        np.testing.assert_allclose(sens["magnetic_field"],
                                   (2.5e-5, -1e-5, 4e-5), rtol=1e-5)
        assert abs(sens["temperature_c"] - 24.5) < 1e-4
        assert abs(sens["pressure_hpa"] - 1012.25) < 1e-3
        assert abs(sens["battery_v"] - 3.92) < 1e-5
        assert abs(seen[RSSI_BLOCK]["rssi_db"] + 54.0) < 1e-4

        # the sensors block streams at the reference's 100 ms period:
        # ~10 records/s, an order slower than the 10 ms imu block
        counts = {IMU_BLOCK: 0, SENSORS_BLOCK: 0}
        t0 = time.time()
        while time.time() - t0 < 1.2:
            rec = server.poll_log(1)
            if rec is None:
                time.sleep(0.002)
                continue
            if rec["block_id"] in counts:
                counts[rec["block_id"]] += 1
        assert 5 <= counts[SENSORS_BLOCK] <= 20, counts
        assert counts[IMU_BLOCK] >= 4 * counts[SENSORS_BLOCK], counts

        stop_typed_channels(server, 1, layout)
        # a record from an unknown block decodes to None
        assert decode_channels(dict(block_id=0x33, timestamp_ms=0,
                                    payload=b"\0" * 12), layout) is None
