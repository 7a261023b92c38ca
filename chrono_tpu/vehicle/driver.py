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
