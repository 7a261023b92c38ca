"""Tracked vehicle (band-track model): statics, acceleration, skid steer.

Role of the reference's M113 tests/benchmarks (btest_VEH_m113Acc,
tracked_vehicle/ChTrackAssembly.h) at band-track fidelity.
"""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.vehicle.tracked import (
    TrackParams, build_tracked_vehicle, tracked_step,
)


def flat(h=0.0):
    return lambda xy: jnp.full(xy.shape[:-1], h)


def _drive(veh, state, torques, n, h=2e-3):
    step = jax.jit(lambda s, tq: tracked_step(veh, s, tq, flat(), h))
    tq = jnp.asarray(torques, jnp.float32)
    out = None
    for _ in range(n):
        out = step(state, tq)
        state = out.state
    return state, out


def test_static_load_split():
    veh, state = build_tracked_vehicle()
    state, out = _drive(veh, state, (0.0, 0.0), 800)
    fz = np.asarray(out.fz)
    # both tracks carry the weight, evenly (symmetric vehicle)
    np.testing.assert_allclose(fz.sum(), 9000 * 9.81, rtol=0.05)
    np.testing.assert_allclose(fz[0], fz[1], rtol=0.02)
    assert abs(float(state.v[veh.chassis, 0])) < 0.05


def test_straight_acceleration():
    veh, state = build_tracked_vehicle()
    state, out = _drive(veh, state, (0.0, 0.0), 400)      # settle
    state, out = _drive(veh, state, (4000.0, 4000.0), 1500)
    v = float(state.v[veh.chassis, 0])
    assert v > 1.0, f"did not accelerate: v={v}"
    # tracks roll with bounded slip once moving
    w = np.asarray(out.sprocket_w)
    v_band = w * float(veh.track.sprocket_radius)
    assert (v_band > v * 0.8).all()
    # heading stays straight under symmetric torque
    from chrono_tpu.core import quaternion as Q
    ex = np.asarray(Q.qrotate(state.q[veh.chassis],
                              jnp.asarray([1.0, 0.0, 0.0])))
    assert abs(ex[1]) < 0.05


def test_skid_steer_yaw():
    veh, state = build_tracked_vehicle()
    state, _ = _drive(veh, state, (0.0, 0.0), 400)        # settle
    # differential torque: LEFT track forward (+y side pushing +x) yaws the
    # hull clockwise (negative z) — pivot turn to the right
    state, _ = _drive(veh, state, (3000.0, -3000.0), 1500)
    wz = float(Q_yaw_rate(state, veh))
    assert wz < -0.05, f"no yaw from differential torque: {wz}"
    # pure pivot: little forward travel
    assert abs(float(state.x[veh.chassis, 0])) < 0.5


def Q_yaw_rate(state, veh):
    from chrono_tpu.core import quaternion as Q
    w_world = Q.qrotate(state.q[veh.chassis], state.w[veh.chassis])
    return w_world[2]
