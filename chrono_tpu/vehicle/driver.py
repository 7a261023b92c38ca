"""Drivers: closed-loop path-follower + speed controller, and data replay.

Counterparts of the reference's ``ChPathFollowerDriver`` (PID lateral +
speed PID, /root/reference/src/chrono_vehicle/driver/ChPathFollowerDriver.h),
``ChDataDriver`` (replay) — all jit-safe pure functions with explicit
controller state so the closed-loop vehicle run stays inside ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


class DriverInputs(NamedTuple):
    steering: Array   # [-1, 1]
    throttle: Array   # [0, 1]
    braking: Array    # [0, 1]


@pytree_dataclass
class PIDState:
    integral: Array = 0.0
    prev_err: Array = 0.0


def pid_step(state: PIDState, err, kp, ki, kd, h, out_lim=1.0):
    integral = state.integral + err * h
    deriv = (err - state.prev_err) / h
    out = kp * err + ki * integral + kd * deriv
    # anti-windup: freeze the integral when saturated
    saturated = jnp.abs(out) > out_lim
    integral = jnp.where(saturated, state.integral, integral)
    out = jnp.clip(out, -out_lim, out_lim)
    return out, PIDState(integral=integral, prev_err=err)


@pytree_dataclass
class SpeedController:
    kp: Array = 0.4
    ki: Array = 0.1
    kd: Array = 0.0
    state: PIDState = PIDState()

    def __call__(self, target_speed, speed, h):
        out, new_state = pid_step(self.state, target_speed - speed,
                                  self.kp, self.ki, self.kd, h)
        throttle = jnp.clip(out, 0.0, 1.0)
        braking = jnp.clip(-out, 0.0, 1.0)
        return throttle, braking, self.replace(state=new_state)


@pytree_dataclass
class PathFollower:
    """Pure-pursuit-style lateral controller on a polyline path.

    Matches the capability of the reference's steering controller: look-ahead
    point on the path, steer from the lateral error in the vehicle frame.
    """

    path_xy: Array           # (P, 2) waypoints
    look_ahead: Array = 5.0
    kp: Array = 0.3
    ki: Array = 0.0
    kd: Array = 0.1
    state: PIDState = PIDState()

    def __call__(self, pos_xy, heading, h):
        # closest path point (dense argmin — paths are a few hundred points)
        d2 = jnp.sum((self.path_xy - pos_xy[None, :]) ** 2, axis=-1)
        i0 = jnp.argmin(d2)
        # walk forward by look_ahead using cumulative segment lengths
        seg = jnp.linalg.norm(jnp.diff(self.path_xy, axis=0), axis=-1)
        s = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
        s_target = s[i0] + self.look_ahead
        j = jnp.clip(jnp.searchsorted(s, s_target), 1, s.shape[0] - 1)
        f = jnp.clip((s_target - s[j - 1]) / jnp.maximum(s[j] - s[j - 1], 1e-9),
                     0.0, 1.0)
        target = self.path_xy[j - 1] + f[None] * (
            self.path_xy[j] - self.path_xy[j - 1])
        # lateral error in the heading frame
        dxy = target - pos_xy
        c, sn = jnp.cos(heading), jnp.sin(heading)
        err_lat = -sn * dxy[0] + c * dxy[1]
        steer, new_state = pid_step(self.state, err_lat, self.kp, self.ki,
                                    self.kd, h)
        return steer, self.replace(state=new_state)


@pytree_dataclass
class DataDriver:
    """Replay recorded driver inputs (reference ChDataDriver)."""

    ts: Array         # (K,)
    steering: Array   # (K,)
    throttle: Array   # (K,)
    braking: Array    # (K,)

    def __call__(self, t) -> DriverInputs:
        return DriverInputs(
            steering=jnp.interp(t, self.ts, self.steering),
            throttle=jnp.interp(t, self.ts, self.throttle),
            braking=jnp.interp(t, self.ts, self.braking),
        )


def straight_path(x0=0.0, y0=0.0, length=500.0, n=50, dtype=jnp.float32):
    xs = jnp.linspace(x0, x0 + length, n, dtype=dtype)
    return jnp.stack([xs, jnp.full_like(xs, y0)], axis=-1)


def double_lane_change_path(dtype=jnp.float32):
    """ISO 3888-1 style double-lane-change centerline (the reference's DLC
    benchmark maneuver, btest_VEH_hmmwvDLC)."""
    import numpy as np

    x = np.array([0, 15, 45, 70, 95, 125, 140, 200.0])
    y = np.array([0, 0, 3.5, 3.5, 0, 0, 0, 0.0])
    xs = np.linspace(0, 200, 200)
    ys = np.interp(xs, x, y)
    # smooth the corners a little
    k = np.ones(7) / 7
    ys = np.convolve(np.pad(ys, 3, mode="edge"), k, mode="valid")
    return jnp.asarray(np.stack([xs, ys], axis=-1), dtype)


@pytree_dataclass
class HumanDriver:
    """Preview-point human driver model (reference ChHumanDriver,
    /root/reference/src/chrono_vehicle/driver/ChHumanDriver.cpp:256-365):
    a sentinel point ``u·Tp`` ahead of the chassis is compared against the
    path; steering integrates the lateral error (driver lag), speed follows
    a curvature-limited safe speed with asymmetric throttle/brake gains."""

    path: jnp.ndarray                 # (N,2) waypoints
    Tp: jnp.ndarray = 0.5             # preview time [s]
    Klat: jnp.ndarray = 0.1
    Kug: jnp.ndarray = 0.0            # understeer gradient [deg/g]
    Klong: jnp.ndarray = 0.1
    Kplus: jnp.ndarray = 0.1
    Kminus: jnp.ndarray = 0.1
    u0: jnp.ndarray = 10.0            # low-speed reference [m/s]
    umax: jnp.ndarray = 30.0          # top speed [m/s]
    ay_max: jnp.ndarray = 4.0         # comfort lateral accel [m/s²]
    delta_max: jnp.ndarray = 0.5      # steering saturation [rad]

    def __call__(self, delta, pos_xy, heading, speed, h):
        """(delta', DriverInputs): carry ``delta`` (integrated steering)."""
        fwd = jnp.stack([jnp.cos(heading), jnp.sin(heading)])
        dist = jnp.maximum(speed, 0.3 * self.u0) * self.Tp
        sentinel = pos_xy + dist * fwd
        d2 = jnp.sum((self.path - sentinel[None, :]) ** 2, axis=1)
        i = jnp.argmin(d2)
        target = self.path[i]
        err_vec = target - sentinel
        err = -err_vec[0] * fwd[1] + err_vec[1] * fwd[0]   # signed lateral
        gain = self.Klat * (1.0 + self.Kug * speed * speed
                            / (self.ay_max * 81.0 + 1e-9))
        delta = jnp.clip(delta + gain * err, -self.delta_max, self.delta_max)

        # curvature-limited safe speed from three path points around target
        n = self.path.shape[0]
        i0 = jnp.clip(i - 2, 0, n - 1)
        i2 = jnp.clip(i + 2, 0, n - 1)
        a, b, c = self.path[i0], self.path[i], self.path[i2]
        ab, bc, ca = b - a, c - b, a - c
        cross = ab[0] * bc[1] - ab[1] * bc[0]
        denom = (jnp.linalg.norm(ab) * jnp.linalg.norm(bc)
                 * jnp.linalg.norm(ca) + 1e-9)
        kappa = jnp.abs(2.0 * cross / denom)
        u_safe = jnp.minimum(self.umax,
                             jnp.sqrt(self.ay_max / jnp.maximum(kappa, 1e-6)))
        tau = self.Klong * (u_safe - speed)
        throttle = jnp.clip(tau / jnp.maximum(self.Kplus, 1e-6), 0.0, 1.0)
        braking = jnp.clip(-tau / jnp.maximum(self.Kminus, 1e-6), 0.0, 1.0)
        inputs = DriverInputs(steering=delta / self.delta_max,
                              throttle=throttle, braking=braking)
        return delta, inputs


def acc_speed_command(set_speed, gap, gap_rate, *, time_gap=1.5,
                      standstill=5.0, k_gap=0.4, k_rate=0.8):
    """Adaptive-cruise speed command (reference ChPathFollowerACCDriver
    role): track ``set_speed`` but keep at least ``standstill + v·time_gap``
    to the lead vehicle; returns the commanded speed for a SpeedController."""
    v_follow = (gap - standstill) / jnp.maximum(time_gap, 1e-3) \
        + k_rate * gap_rate / jnp.maximum(k_gap + time_gap, 1e-3)
    return jnp.clip(jnp.minimum(set_speed, v_follow), 0.0, None)
