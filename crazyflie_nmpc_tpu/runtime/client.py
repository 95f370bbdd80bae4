"""High-level vehicle client — the reference's L6 user API, re-designed.

Mirrors the capability surface of crazyflie_demo/scripts/crazyflie.py:33-79
(takeoff / land / stop / goTo / uploadTrajectory / startTrajectory /
setParam) and the driver's high-level services
(crazyflie_server.cpp:920-992), but instead of calling into firmware
trajectory primitives, the client *generates reference trajectories* (via
the differential-flatness tooling) and hands them to the NMPC Tracking
policy — every maneuver becomes an optimal-control problem on the host.

The client is deliberately thin and functional underneath: it owns mutable
mission state (current policy + trajectory table) and produces, per tick,
the (yref, yref_e) pair for `solver.rti.rti_step`; transport of the
resulting commands is the caller's choice (native.LinkServer, simulator,
logs).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from crazyflie_nmpc_tpu.models.quadrotor import NU, NX
from crazyflie_nmpc_tpu.solver import policies as pol
from crazyflie_nmpc_tpu.solver.ocp import OCPSpec
from crazyflie_nmpc_tpu.utils import trajectories as traj


class MissionClient:
    """Per-vehicle mission planner over the NMPC policy machine.

    Usage:
        client = MissionClient(spec)
        client.takeoff(height=0.5, duration=2.0, at=(0, 0, 0))
        ...
        yref, yref_e = client.tick()          # feed to rti_step each cycle
        client.go_to((1, 0, 0.5), duration=3.0)
    """

    def __init__(self, spec: OCPSpec):
        self.spec = spec
        self._dtype = spec.lbu.dtype
        self._policy = pol.regulation_state((0.0, 0.0, 0.3))
        self._table = jnp.zeros((1, NX + NU), self._dtype)
        self._uploaded: dict[int, tuple] = {}

    # ---- mission primitives (reference services) -----------------------

    def takeoff(self, height: float = 0.5, duration: float = 2.0,
                at=(0.0, 0.0, 0.0)):
        """Takeoff service (crazyflie_server.cpp:920-933): smooth climb
        from `at` to hover height."""
        table = traj.smooth_step_trajectory(
            self.spec.params, start=(at[0], at[1], max(at[2], 0.04)),
            end=(at[0], at[1], height), duration=duration,
            dt=float(self.spec.dt))
        self._start_table(table)

    def land(self, from_pos, ground_z: float = 0.04,
             duration: float = 2.5):
        """Land service: smooth descent to ground_z, then hold."""
        table = traj.smooth_step_trajectory(
            self.spec.params, start=tuple(from_pos),
            end=(from_pos[0], from_pos[1], ground_z), duration=duration,
            dt=float(self.spec.dt))
        self._start_table(table)

    def go_to(self, goal, from_pos=None, duration: float = 3.0):
        """GoTo service (crazyflie_server.cpp:947-960): min-jerk
        point-to-point move; from current regulation set-point if
        `from_pos` is omitted."""
        start = tuple(from_pos) if from_pos is not None else tuple(
            np.asarray(self._policy.setpoint))
        table = traj.smooth_step_trajectory(
            self.spec.params, start=start, end=tuple(goal),
            duration=duration, dt=float(self.spec.dt))
        self._start_table(table)

    def hover_at(self, setpoint):
        """Switch to pure Regulation at a set-point (the rqt panel's
        regulation mode, crazyflie_params.cfg:9-14)."""
        self._policy = pol.regulation_state(tuple(setpoint))

    def upload_trajectory(self, trajectory_id: int, durations, coeffs):
        """UploadTrajectory service (crazyflie_server.cpp:962-983): store a
        piecewise-polynomial trajectory (figure8.csv format pieces)."""
        self._uploaded[trajectory_id] = (np.asarray(durations),
                                         np.asarray(coeffs))

    def start_trajectory(self, trajectory_id: int, timescale: float = 1.0,
                         reversed: bool = False):
        """StartTrajectory service (crazyflie_server.cpp:985-997): sample
        the uploaded polynomial onto the NMPC grid and start tracking."""
        durations, coeffs = self._uploaded[trajectory_id]
        table = traj.sample_poly_trajectory(
            durations * timescale, coeffs, self.spec.params,
            dt=float(self.spec.dt))
        if reversed:
            table = table[::-1]
        self._start_table(table)

    def track_file(self, path: str):
        """Track a 17-column trajectory file (the ref_traj rosparam,
        acados_mpc.cpp:727-728)."""
        self._start_table(jnp.asarray(traj.load_traj_txt(path),
                                      jnp.float32))

    def stop(self):
        """Stop/emergency: freeze at the current set-point (the radio-level
        kill lives in native.LinkServer.emergency)."""
        self._policy = pol.regulation_state(
            tuple(np.asarray(self._policy.setpoint)))

    # ---- per-tick reference generation ---------------------------------

    def tick(self):
        """Produce (yref (N, 17), yref_e (13,)) and advance the playhead."""
        yref, yref_e, self._policy = pol.make_yref(self.spec, self._policy,
                                                   self._table)
        return yref, yref_e

    @property
    def mode(self) -> int:
        return int(self._policy.mode)

    @property
    def done(self) -> bool:
        """True when a started trajectory has been consumed (policy latched
        to Position_Hold)."""
        return int(self._policy.mode) == pol.POSITION_HOLD

    def _start_table(self, table):
        self._table = jnp.asarray(table, self._dtype)
        self._policy = pol.tracking_state(
            tuple(np.asarray(table[-1, 0:3])))
        # keep the hold point = trajectory end; playhead starts at 0
