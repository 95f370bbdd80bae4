"""Flight-log bag: record/replay plane (the reference's rosbag workflow,
SURVEY.md §4 — record, torn-tail tolerance, time-ordered replay, export)."""

import io
import os
import tempfile

import numpy as np
import pytest

from crazyflie_nmpc_tpu.runtime.bag import (
    Bag,
    BagWriter,
    ascii_plot,
    record_loop_result,
)


@pytest.fixture
def tmppath(tmp_path):
    return str(tmp_path / "flight.bag")


def test_roundtrip_multichannel(tmppath):
    rng = np.random.default_rng(0)
    st = rng.normal(size=(40, 13)).astype(np.float32)
    u = rng.normal(size=(40, 4)).astype(np.float64)
    with BagWriter(tmppath) as w:
        for i in range(40):
            w.write("state", 0.015 * i, st[i])
            w.write("u", 0.015 * i, u[i])
        w.write("note", 1.0, np.int32(7))
    bag = Bag(tmppath)
    assert bag.names() == ["note", "state", "u"]
    np.testing.assert_array_equal(bag["state"].values, st)
    np.testing.assert_array_equal(bag["u"].values, u)
    assert bag["state"].values.dtype == np.float32
    assert bag["u"].values.dtype == np.float64
    np.testing.assert_allclose(bag["u"].t, 0.015 * np.arange(40))
    assert bag["note"].values[0] == 7


def test_channel_shape_dtype_locked(tmppath):
    with BagWriter(tmppath) as w:
        w.write("x", 0.0, np.zeros(3, np.float32))
        with pytest.raises(ValueError):
            w.write("x", 0.1, np.zeros(4, np.float32))
        with pytest.raises(ValueError):
            w.write("x", 0.1, np.zeros(3, np.float64))


def test_torn_tail_tolerated(tmppath):
    """A recorder killed mid-write must not corrupt earlier records (the
    reference's rosbag-on-crash behavior)."""
    with BagWriter(tmppath) as w:
        for i in range(10):
            w.write("x", float(i), np.full(5, i, np.float32))
    size = os.path.getsize(tmppath)
    with open(tmppath, "r+b") as f:
        f.truncate(size - 7)  # tear the final record mid-payload
    bag = Bag(tmppath)
    assert len(bag["x"].t) == 9
    np.testing.assert_array_equal(bag["x"].values[-1],
                                  np.full(5, 8, np.float32))


def test_not_a_bag(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"hello world, definitely not a bag")
    with pytest.raises(ValueError):
        Bag(str(p))


def test_play_time_ordered_merge(tmppath):
    with BagWriter(tmppath) as w:
        w.write("b", 0.2, np.float32(1))
        w.write("a", 0.1, np.float32(2))
        w.write("b", 0.1, np.float32(3))
        w.write("a", 0.3, np.float32(4))
    got = [(t, name, float(v)) for t, name, v in Bag(tmppath).play()]
    assert [g[:2] for g in got] == [
        (0.1, "a"), (0.1, "b"), (0.2, "b"), (0.3, "a")]
    # channel filter
    only_a = list(Bag(tmppath).play(["a"]))
    assert [g[1] for g in only_a] == ["a", "a"]


def test_summary_and_csv(tmppath):
    with BagWriter(tmppath) as w:
        for i in range(20):
            w.write("pos", 0.01 * i, np.array([i, 2 * i], np.float64))
    bag = Bag(tmppath)
    s = bag.summary()["pos"]
    assert s["count"] == 20
    assert abs(s["rate_hz"] - 100.0) < 1e-6
    buf = io.StringIO()
    bag.to_csv("pos", buf)
    lines = buf.getvalue().strip().splitlines()
    assert lines[0] == "t,pos_0,pos_1"
    assert len(lines) == 21
    row = [float(v) for v in lines[3].split(",")]
    assert row == [0.02, 2.0, 4.0]


def test_record_loop_result(tmppath):
    """The closed-loop recorder mirrors the crazy_AFL.launch topic set."""
    from types import SimpleNamespace

    T = 12
    res = SimpleNamespace(
        x=np.arange(T * 13, dtype=np.float64).reshape(T, 13),
        u=np.ones((T, 4)),
        u_cmd=2 * np.ones((T, 4)),
        kkt_res=np.full((T,), 1e-8),
        policy_mode=np.zeros((T,), np.int32),
    )
    record_loop_result(tmppath, res, dt=0.015,
                       extra={"cmd_vel": np.zeros((T, 4))})
    bag = Bag(tmppath)
    assert set(bag.names()) == {"state_estimate", "motvel", "motvel_cmd",
                                "kkt_res", "policy_mode", "cmd_vel"}
    np.testing.assert_allclose(bag["state_estimate"].t[1] -
                               bag["state_estimate"].t[0], 0.015)
    np.testing.assert_array_equal(bag["state_estimate"].values, res.x)


def test_ascii_plot_smoke():
    t = np.linspace(0, 1, 100)
    y = np.sin(2 * np.pi * t)
    s = ascii_plot(t, y, label="sin")
    lines = s.splitlines()
    assert lines[0].startswith("sin")
    assert len(lines) == 15
    assert any("*" in ln for ln in lines[1:])


def test_bag_cli(tmppath, capsys):
    from crazyflie_nmpc_tpu import tools

    with BagWriter(tmppath) as w:
        for i in range(5):
            w.write("x", 0.1 * i, np.array([i, -i], np.float32))
    assert tools.main(["bag", "info", tmppath]) == 0
    out = capsys.readouterr().out
    assert "x" in out and "5" in out
    assert tools.main(["bag", "csv", tmppath, "--channel", "x"]) == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "t,x_0,x_1"
    assert tools.main(["bag", "plot", tmppath, "--channel", "x",
                       "--col", "0"]) == 0
    assert tools.main(["bag", "play", tmppath]) == 0
    out = capsys.readouterr().out
    assert out.count("x:") == 5
