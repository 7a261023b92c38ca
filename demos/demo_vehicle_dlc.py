"""HMMWV double-lane-change at constant speed with closed-loop drivers
(the reference's btest_VEH_hmmwvDLC scenario)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import functools
import numpy as np
import jax.numpy as jnp

from chrono_tpu.models import create_hmmwv
from chrono_tpu.vehicle import (
    vehicle_step, flat_terrain, DriverInputs, SpeedController, PathFollower,
    double_lane_change_path,
)
from chrono_tpu.io import CSVWriter


def main():
    vehicle, state = create_hmmwv()
    terrain = flat_terrain(0.0)
    path = double_lane_change_path()
    h = 1e-3
    target = 12.0  # m/s

    @functools.partial(jax.jit, static_argnums=3)
    def run(state, speed_ctrl, steer_ctrl, n):
        def body(carry, k):
            st, sc, pc, t = carry
            from chrono_tpu.core import quaternion as Q
            speed = jnp.linalg.norm(st.v[vehicle.chassis, :2])
            throttle, braking, sc = sc(target, speed, h)
            fwd = Q.qrotate(st.q[vehicle.chassis], jnp.asarray([1.0, 0, 0]))
            heading = jnp.arctan2(fwd[1], fwd[0])
            steer, pc = pc(st.x[vehicle.chassis, :2], heading, h)
            out = vehicle_step(vehicle, st,
                               DriverInputs(steer, throttle, braking),
                               terrain, t, h)
            return (out.state, sc, pc, t + h), st.x[vehicle.chassis]
        (st, _, _, _), xs = jax.lax.scan(
            body, (state, speed_ctrl, steer_ctrl, jnp.asarray(0.0)),
            jnp.arange(n))
        return st, xs

    n = 15000
    final, xs = run(state, SpeedController(kp=jnp.asarray(0.6),
                                           ki=jnp.asarray(0.2)),
                    PathFollower(path_xy=path, look_ahead=jnp.asarray(8.0),
                                 kp=jnp.asarray(0.25), kd=jnp.asarray(0.15)),
                    n)
    X = np.asarray(xs)
    w = CSVWriter("out/hmmwv_dlc.csv", ["t", "x", "y"])
    for k in range(0, n, 20):
        w.append(k * h, X[k, 0], X[k, 1])
    w.write()
    print(f"travelled {X[-1,0]:.0f} m, max lateral {X[:,1].max():.2f} m "
          f"(lane offset 3.5) -> out/hmmwv_dlc.csv")


if __name__ == "__main__":
    main()
