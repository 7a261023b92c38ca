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


class TestSegmentedTrack:
    """Discrete-shoe track (ChTrackShoeSinglePin.h role): pinned shoe loop
    around sprocket+idler cylinders, convex NSC contact, friction drive."""

    # positive sprocket rate about +y moves its bottom surface backward
    # (-x) and therefore the vehicle forward (+x)
    def _build(self, omega=3.0):
        import numpy as np
        from chrono_tpu.physics import SystemBuilder, SolverSettings
        from chrono_tpu.collision import (
            GridSpec, SphereShapes, CollisionModel, nsc_step)
        from chrono_tpu.vehicle.track_shoes import (
            add_segmented_track, track_collision_shapes, ground_shape)

        wheel_r, shoe_h, shoe_w = 0.2, 0.05, 0.2
        rp = wheel_r + 0.5 * shoe_h + 2e-3
        zc = rp + 0.5 * shoe_h
        c_rear, c_front = (0.0, 0.0, zc), (0.8, 0.0, zc)

        bld = SystemBuilder()
        bld.set_gravity((0, 0, -9.81))
        g = bld.add_ground()
        chassis = bld.add_body(mass=20.0, inertia=(2.0, 4.0, 5.0),
                               pos=(0.4, 0.0, zc))
        track = add_segmented_track(bld, chassis, c_rear, c_front, wheel_r,
                                    n_shoes=24, shoe_h=shoe_h, shoe_w=shoe_w,
                                    shoe_mass=0.5)
        bld.add_motor_rotation_speed(chassis, track.sprocket,
                                     world_pos=c_front, world_axis=(0, 1, 0),
                                     profile=omega, add_joint=False)
        model, state = bld.finalize()

        convex = track_collision_shapes(track, extra=ground_shape(g))
        spheres = SphereShapes(body=jnp.zeros((0,), jnp.int32),
                               offset=jnp.zeros((0, 3)),
                               radius=jnp.zeros((0,)), mu=jnp.zeros((0,)))
        coll = CollisionModel(
            spheres=spheres, boxes=None, convex=convex,
            grid=GridSpec(origin=(-5, -5, -2), cell_size=1.0, dims=(12, 12, 4)),
            max_per_cell=8, max_contacts=96)
        # capped recovery speed prevents corner-impact stabilization from
        # pumping energy into the loop; 300 iterations converge the ~400-row
        # mixed bilateral/cone problem
        settings = SolverSettings(solver="apgd", max_iter=300,
                                  stab_factor=0.2, max_recovery_speed=0.5)
        return model, coll, state, chassis, track, settings, nsc_step

    def test_track_drives_vehicle(self):
        """Sprocket spin moves the bottom strand backward and the vehicle
        forward at near the rim surface speed; the loop stays intact."""
        import numpy as np
        model, coll, state, chassis, track, settings, nsc_step = self._build()
        h = 1e-3

        @jax.jit
        def advance(st, t0):
            def body(carry, k):
                st, t = carry
                st, _, _ = nsc_step(model, coll, st, t, h, settings)
                return (st, t + h), None
            (st, t), _ = jax.lax.scan(body, (st, t0), jnp.arange(250))
            return st, t

        t = jnp.asarray(0.0)
        x0 = float(state.x[chassis, 0])
        for _ in range(5):                       # 1.25 s
            state, t = advance(state, t)
            assert np.isfinite(np.asarray(state.x)).all()
        dx = float(state.x[chassis, 0]) - x0
        # vehicle advances (friction drive, some slip allowed)
        assert dx > 0.10, f"vehicle did not advance: dx={dx:.3f}"
        # loop integrity: consecutive pin distances stay at one pitch
        sh = np.asarray(state.x)[track.shoes]
        d = np.linalg.norm(np.roll(sh, -1, axis=0) - sh, axis=1)
        np.testing.assert_allclose(d, track.pitch, rtol=0.15)
        # track circulates: shoes acquired tangential speed
        v_sh = np.asarray(state.v)[track.shoes]
        assert np.abs(v_sh).max() > 0.2
