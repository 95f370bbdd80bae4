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
