"""Vehicle-layer tests: statics, acceleration, steering circle, braking, SCM.

Mirrors the reference's full-vehicle benchmarks (btest_VEH_hmmwvDLC/m113Acc)
with analytic expectations sized for CPU runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.physics import SolverSettings
from chrono_tpu.vehicle import (
    build_wheeled_vehicle, vehicle_step, flat_terrain, DriverInputs,
    SpeedController, PathFollower, straight_path,
    SCMParams, make_scm_state, scm_wheel_forces,
)


def make_vehicle():
    return build_wheeled_vehicle(chassis_mass=2000.0, wheelbase=3.0,
                                 track=1.8, cg_height=0.9,
                                 wheel_radius=0.35, driven="AWD")


def run_vehicle(vehicle, state, inputs_fn, t_end, h=1e-3):
    terrain = flat_terrain(0.0)
    settings = SolverSettings(solver="direct")

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def step_n(state, n):
        def body(carry, k):
            st, t = carry
            inp = inputs_fn(t)
            out = vehicle_step(vehicle, st, inp, terrain, t, h, settings)
            return (out.state, t + h), None

        (st, t), _ = jax.lax.scan(body, (state, jnp.asarray(0.0)),
                                  jnp.arange(n))
        return st

    return step_n(state, int(t_end / h))


class TestVehicleStatics:
    def test_settles_level(self):
        vehicle, state = make_vehicle()
        zero = DriverInputs(steering=jnp.asarray(0.0),
                            throttle=jnp.asarray(0.0),
                            braking=jnp.asarray(0.2))
        final = run_vehicle(vehicle, state, lambda t: zero, 1.0)
        # chassis settles near its initial height, minimal pitch/roll
        z = float(final.x[vehicle.chassis, 2])
        assert 0.75 < z < 0.95, f"chassis height {z}"
        from chrono_tpu.core import quaternion as Q
        up = np.asarray(Q.qrotate(final.q[vehicle.chassis],
                                  jnp.asarray([0.0, 0.0, 1.0])))
        assert up[2] > 0.998, f"vehicle tilted: up={up}"
        assert abs(float(final.v[vehicle.chassis, 0])) < 0.1

    def test_wheel_loads_static(self):
        vehicle, state = make_vehicle()
        terrain = flat_terrain(0.0)
        zero = DriverInputs(steering=jnp.asarray(0.0),
                            throttle=jnp.asarray(0.0),
                            braking=jnp.asarray(0.3))
        final = run_vehicle(vehicle, state, lambda t: zero, 1.0)
        out = vehicle_step(vehicle, final, zero, terrain, 1.0, 1e-3)
        total_fz = float(jnp.sum(out.tire_fz))
        # total weight: chassis + 4×(upright 30 + wheel 40) + 2×knuckle 20
        m_tot = 2000 + 4 * (30 + 40) + 2 * 20
        np.testing.assert_allclose(total_fz, m_tot * 9.81, rtol=0.05)


class TestVehicleDynamics:
    def test_accelerates_forward(self):
        vehicle, state = make_vehicle()
        inputs = DriverInputs(steering=jnp.asarray(0.0),
                              throttle=jnp.asarray(0.8),
                              braking=jnp.asarray(0.0))
        final = run_vehicle(vehicle, state, lambda t: inputs, 3.0)
        vx = float(final.v[vehicle.chassis, 0])
        x = float(final.x[vehicle.chassis, 0])
        assert vx > 5.0, f"vehicle too slow after 3s full throttle: {vx}"
        assert vx < 30.0, f"implausibly fast: {vx}"
        assert x > 8.0
        # stays on course
        assert abs(float(final.x[vehicle.chassis, 1])) < 0.5

    def test_brakes_stop(self):
        vehicle, state = make_vehicle()
        accel = DriverInputs(steering=jnp.asarray(0.0),
                             throttle=jnp.asarray(0.8),
                             braking=jnp.asarray(0.0))
        state = run_vehicle(vehicle, state, lambda t: accel, 2.5)
        v0 = float(state.v[vehicle.chassis, 0])
        brake = DriverInputs(steering=jnp.asarray(0.0),
                             throttle=jnp.asarray(0.0),
                             braking=jnp.asarray(1.0))
        final = run_vehicle(vehicle, state, lambda t: brake, 2.5)
        v1 = float(final.v[vehicle.chassis, 0])
        assert v0 > 4.0 and v1 < 0.5, f"braking failed: {v0} -> {v1}"

    def test_steady_state_turning(self):
        # constant speed + constant steer → curvature ≈ tan(δ)/L (low speed)
        vehicle, state = make_vehicle()
        accel = DriverInputs(steering=jnp.asarray(0.0),
                             throttle=jnp.asarray(0.35),
                             braking=jnp.asarray(0.0))
        state = run_vehicle(vehicle, state, lambda t: accel, 2.0)
        steer = DriverInputs(steering=jnp.asarray(0.25),
                             throttle=jnp.asarray(0.25),
                             braking=jnp.asarray(0.0))
        final = run_vehicle(vehicle, state, lambda t: steer, 4.0)
        from chrono_tpu.core import quaternion as Q
        # yaw rate vs speed → radius; compare to kinematic bicycle radius
        wz = float(Q.qrotate(final.q[vehicle.chassis],
                             final.w[vehicle.chassis])[2])
        v = float(jnp.linalg.norm(final.v[vehicle.chassis, :2]))
        assert v > 2.0
        radius_meas = v / abs(wz)
        delta = 0.25 * float(vehicle.max_steer_angle)
        radius_kin = 3.0 / np.tan(delta)
        assert 0.6 * radius_kin < radius_meas < 1.8 * radius_kin, \
            f"turn radius {radius_meas:.1f} vs kinematic {radius_kin:.1f}"
        # turning left (positive steer) → positive yaw rate
        assert wz > 0


class TestClosedLoop:
    def test_speed_controller_tracks(self):
        vehicle, state = make_vehicle()
        terrain = flat_terrain(0.0)
        h = 1e-3
        target = 10.0

        @jax.jit
        def run(state):
            ctrl = SpeedController(kp=jnp.asarray(0.6), ki=jnp.asarray(0.2),
                                   kd=jnp.asarray(0.0))

            def body(carry, k):
                st, c, t = carry
                speed = jnp.linalg.norm(st.v[vehicle.chassis, :2])
                throttle, braking, c = c(target, speed, h)
                inp = DriverInputs(steering=jnp.asarray(0.0),
                                   throttle=throttle, braking=braking)
                out = vehicle_step(vehicle, st, inp, terrain, t, h)
                return (out.state, c, t + h), speed

            (st, _, _), speeds = jax.lax.scan(
                body, (state, ctrl, jnp.asarray(0.0)), jnp.arange(6000))
            return st, speeds

        final, speeds = run(state)
        v_end = float(np.asarray(speeds)[-1])
        np.testing.assert_allclose(v_end, target, atol=1.0)


class TestSCM:
    def test_static_sinkage(self):
        # a loaded wheel pressed into soil: Bekker z = (p/(Kc/b+Kphi))^(1/n)
        params = SCMParams(Kphi=jnp.asarray(5e5), Kc=jnp.asarray(0.0),
                           n_exp=jnp.asarray(1.0))
        scm = make_scm_state((-1, -1), (1, 1), 0.02)
        wheel_x = jnp.asarray([[0.0, 0.0, 0.33]])  # r=0.35 → 2cm penetration
        from chrono_tpu.core import quaternion as Q
        out = scm_wheel_forces(
            params, scm, wheel_x, Q.qidentity((1,)),
            jnp.zeros((1, 3)), jnp.zeros((1, 3)),
            wheel_radius=0.35, wheel_width=0.25)
        fz = float(out.force[0, 2])
        assert fz > 0, "no vertical soil reaction"
        # plastic imprint recorded
        assert float(out.new_state.sinkage.max()) > 0.015
        # deeper press → larger force (monotonic)
        out2 = scm_wheel_forces(
            params, scm, wheel_x.at[0, 2].set(0.31), Q.qidentity((1,)),
            jnp.zeros((1, 3)), jnp.zeros((1, 3)),
            wheel_radius=0.35, wheel_width=0.25)
        assert float(out2.force[0, 2]) > 2 * fz

    def test_erosion_relaxes_slopes(self):
        from chrono_tpu.vehicle import scm_erosion_step
        scm = make_scm_state((-1, -1), (1, 1), 0.05)
        # dig a sharp hole
        scm = scm.replace(sinkage=scm.sinkage.at[20, 20].set(0.5))
        for _ in range(20):
            scm = scm_erosion_step(scm, max_slope=0.5)
        s = np.asarray(scm.sinkage)
        assert s[20, 20] < 0.45          # hole partially filled
        assert s[19, 20] > 0.001         # neighbors received material
        # material conserved
        np.testing.assert_allclose(s.sum(), 0.5, rtol=1e-3)


class TestTireModels:
    """Slip-curve sanity for all three handling tire models."""

    def _eval(self, forces_fn, params, sx):
        from chrono_tpu.core import quaternion as Q
        from chrono_tpu.vehicle import flat_terrain
        import jax.numpy as jnp
        terrain = flat_terrain(0.0)
        v = 10.0
        r = float(params.radius)
        fz_target = 4000.0
        pen = fz_target / float(params.cz)
        wheel_x = jnp.asarray([[0.0, 0.0, r - pen]])
        omega = (v + sx * v) / (r - pen / 3.0)
        f, ts, fz = forces_fn(
            params, wheel_x, Q.qidentity((1,)),
            jnp.asarray([[v, 0.0, 0.0]]), jnp.asarray([[0.0, omega, 0.0]]),
            terrain)
        return float(f[0, 0]), float(fz[0])

    @pytest.mark.parametrize("model", ["tmeasy", "fiala", "pac89", "pac02"])
    def test_slip_curve_monotone_then_saturating(self, model):
        from chrono_tpu.vehicle import (
            TMeasyParams, FialaParams, Pac89Params, Pac02Params,
            tmeasy_forces, fiala_forces, pac89_forces, pac02_forces,
        )
        fn, params = {
            "tmeasy": (tmeasy_forces, TMeasyParams()),
            "fiala": (fiala_forces, FialaParams()),
            "pac89": (pac89_forces, Pac89Params()),
            "pac02": (pac02_forces, Pac02Params()),
        }[model]
        fx0, fz = self._eval(fn, params, 0.0)
        fx_small, _ = self._eval(fn, params, 0.02)
        fx_big, _ = self._eval(fn, params, 0.5)
        assert fz > 3000.0
        assert abs(fx0) < 0.05 * fz, f"{model}: force at zero slip {fx0}"
        assert fx_small > 0.01 * fz, f"{model}: no driving force at 2% slip"
        assert fx_big > fx_small * 0.8, f"{model}: collapsed at large slip"
        # braking slip symmetric in sign
        fx_neg, _ = self._eval(fn, params, -0.02)
        assert fx_neg < -0.01 * fz


class TestSCMMovingPatch:
    def test_relocation_carries_sinkage_and_exposes_fresh_soil(self):
        from chrono_tpu.vehicle.terrain import (
            SCMParams, make_scm_state, scm_wheel_forces, scm_relocate,
        )
        import jax.numpy as jnp

        state = make_scm_state((-1.0, -1.0), (1.0, 1.0), 0.05)
        params = SCMParams()
        # press a wheel at the center to leave a rut
        wheel_x = jnp.asarray([[0.0, 0.0, 0.28]])
        out = scm_wheel_forces(params, state,
                               wheel_x, jnp.zeros((1, 4)),
                               jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                               jnp.asarray([0.3]), jnp.asarray([0.2]))
        state = out.new_state
        s_before = float(state.sinkage.max())
        assert s_before > 1e-5

        # relocate the patch window forward by ~0.5 m
        state2 = scm_relocate(state, (0.5, 0.0))
        np.testing.assert_allclose(np.asarray(state2.origin), [-0.5, -1.0],
                                   atol=1e-6)
        # the rut (at world x=0) survives the roll at its new grid position
        assert abs(float(state2.sinkage.max()) - s_before) < 1e-7
        hm = state2.height_fn()
        h_rut = float(hm(jnp.asarray([[0.0, 0.0]]))[0])
        assert h_rut < -1e-5
        # freshly exposed soil at the leading edge is undeformed
        h_fresh = float(hm(jnp.asarray([[1.45, 0.0]]))[0])
        assert abs(h_fresh) < 1e-7

    def test_relocation_is_jittable(self):
        from chrono_tpu.vehicle.terrain import make_scm_state, scm_relocate
        import jax, jax.numpy as jnp

        state = make_scm_state((-1.0, -1.0), (1.0, 1.0), 0.1)
        f = jax.jit(lambda s, c: scm_relocate(s, c))
        s2 = f(state, jnp.asarray([0.35, -0.2]))
        assert np.isfinite(np.asarray(s2.z0)).all()


class TestWishboneVehicle:
    """Full vehicle on geometric wishbone corners + rack steering (the
    reference's btest_VEH_hmmwvDLC fidelity class)."""

    def _veh(self):
        from chrono_tpu.vehicle import build_wheeled_vehicle
        return build_wheeled_vehicle(chassis_mass=2000.0, wheelbase=3.0,
                                     track=1.8, cg_height=0.8,
                                     wheel_radius=0.35, driven="AWD",
                                     suspension="wishbone")

    def test_settles_and_accelerates(self):
        from chrono_tpu.vehicle import vehicle_step, flat_terrain, DriverInputs
        veh, state = self._veh()
        terrain = flat_terrain(0.0)
        h = 1e-3
        step = jax.jit(lambda s, i, t: vehicle_step(veh, s, i, terrain, t, h))
        idle = DriverInputs(steering=jnp.zeros(()), throttle=jnp.zeros(()),
                            braking=jnp.zeros(()))
        t = 0.0
        for _ in range(800):
            out = step(state, idle, t)
            state = out.state
            t += h
        z0 = float(state.x[veh.chassis, 2])
        assert 0.5 < z0 < 0.9           # settled on its springs
        assert abs(float(state.v[veh.chassis, 0])) < 0.1

        full = DriverInputs(steering=jnp.zeros(()),
                            throttle=jnp.ones(()), braking=jnp.zeros(()))
        for _ in range(2000):
            out = step(state, full, t)
            state = out.state
            t += h
        v = float(state.v[veh.chassis, 0])
        assert v > 3.0, f"no acceleration: v={v}"
        # wheels roll (not just slide): spin speed tracks forward speed
        w = np.asarray(state.w)[list(veh.wheels), 1]
        assert (w > 0.5 * v / 0.35).all()

    def test_steering_turns_vehicle(self):
        from chrono_tpu.vehicle import vehicle_step, flat_terrain, DriverInputs
        veh, state = self._veh()
        terrain = flat_terrain(0.0)
        h = 1e-3
        step = jax.jit(lambda s, i, t: vehicle_step(veh, s, i, terrain, t, h))
        idle = DriverInputs(steering=jnp.zeros(()), throttle=jnp.zeros(()),
                            braking=jnp.zeros(()))
        t = 0.0
        for _ in range(600):
            state = step(state, idle, t).state
            t += h
        go = DriverInputs(steering=jnp.zeros(()), throttle=0.6 * jnp.ones(()),
                          braking=jnp.zeros(()))
        for _ in range(1500):
            state = step(state, go, t).state
            t += h
        turn = DriverInputs(steering=0.5 * jnp.ones(()),
                            throttle=0.4 * jnp.ones(()),
                            braking=jnp.zeros(()))
        for _ in range(1500):
            state = step(state, turn, t).state
            t += h
        from chrono_tpu.core import quaternion as Q
        wz = float(Q.qrotate(state.q[veh.chassis],
                             state.w[veh.chassis])[2])
        # steering left (+) yaws left (+z) once rolling
        assert wz > 0.05, f"no yaw response: {wz}"
        assert float(state.x[veh.chassis, 1]) > 0.1


class TestHumanDriverACC:
    def test_human_driver_tracks_curved_path(self):
        """Preview driver steers toward a curving path and slows for the
        bend (curvature-limited safe speed)."""
        import numpy as np
        import jax.numpy as jnp
        from chrono_tpu.vehicle.driver import HumanDriver

        s = np.linspace(0, 80, 200)
        path = np.stack([s, np.where(s < 40, 0.0, (s - 40) ** 2 / 80.0)], 1)
        hd = HumanDriver(path=jnp.asarray(path, jnp.float32),
                         umax=jnp.asarray(25.0))
        delta = jnp.asarray(0.0)
        # straight section, on path, fast: no steering, full-ish throttle
        delta, inp = hd(delta, jnp.asarray([5.0, 0.0]), jnp.asarray(0.0),
                        jnp.asarray(10.0), 1e-2)
        assert abs(float(inp.steering)) < 0.05
        assert float(inp.throttle) > 0.5 and float(inp.braking) == 0.0
        # approaching the left bend: steering builds toward the curve side
        delta = jnp.asarray(0.0)
        for _ in range(10):
            delta, inp = hd(delta, jnp.asarray([38.0, 0.0]),
                            jnp.asarray(0.0), jnp.asarray(15.0), 1e-2)
        assert float(inp.steering) > 0.05
        # inside the bend at high speed: brakes (curvature-limited)
        delta, inp = hd(jnp.asarray(0.0), jnp.asarray([55.0, 2.8]),
                        jnp.asarray(0.35), jnp.asarray(29.0), 1e-2)
        assert float(inp.braking) > 0.0

    def test_acc_speed_command(self):
        import jax.numpy as jnp
        from chrono_tpu.vehicle.driver import acc_speed_command

        # free road: follow the set speed
        v = acc_speed_command(jnp.asarray(20.0), jnp.asarray(200.0),
                              jnp.asarray(0.0))
        assert float(v) == 20.0
        # close lead: commanded speed drops below set speed
        v2 = acc_speed_command(jnp.asarray(20.0), jnp.asarray(14.0),
                               jnp.asarray(0.0))
        assert 0.0 < float(v2) < 10.0
        # closing fast: commands slower than steady gap
        v3 = acc_speed_command(jnp.asarray(20.0), jnp.asarray(14.0),
                               jnp.asarray(-3.0))
        assert float(v3) < float(v2)


class TestTMsimple:
    def test_slip_curve_shape_and_saturation(self):
        """TMsimple F(s): linear at small slip with slope dF0, peaks at
        F_max, decays toward F_s at large slip; load scaling quadratic."""
        import numpy as np
        import jax.numpy as jnp
        from chrono_tpu.vehicle.tire import TMsimpleParams, tmsimple_forces

        p = TMsimpleParams()
        flat = lambda xy: jnp.zeros(xy.shape[:-1])
        q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        # wheel pressed to nominal load, rolling with commanded slip
        z = float(p.radius) - float(p.Fz0) / float(p.cz)
        x = jnp.asarray([[0.0, 0.0, z]])
        v = jnp.asarray([[10.0, 0.0, 0.0]])

        def fx_at_slip(s):
            r_eff = p.radius - (p.radius - z) / 3.0
            omega = (10.0 * (1 + s)) / r_eff
            w = jnp.asarray([[0.0, float(omega), 0.0]])
            f, tq, fz = tmsimple_forces(p, x, q, v, w, flat)
            return float(jnp.sum(f[0] * jnp.asarray([1.0, 0, 0]))), float(fz[0])

        fx_small, fz = fx_at_slip(0.01)
        # initial slope ≈ dF0(fz)
        assert abs(fz - float(p.Fz0)) / float(p.Fz0) < 0.05
        assert 0.5 * 0.01 * float(p.dfx0_1) < fx_small < 1.2 * 0.01 * float(p.dfx0_1)
        # peak above the saturation value, saturation near fxs
        fx_peak = max(fx_at_slip(s)[0] for s in (0.08, 0.12, 0.18, 0.25))
        fx_sat, _ = fx_at_slip(3.0)
        assert fx_peak > fx_sat > 0.8 * float(p.fxs_1)
        assert fx_peak < 1.15 * float(p.fxm_1)

    def test_combined_slip_friction_circle(self):
        import numpy as np
        import jax.numpy as jnp
        from chrono_tpu.vehicle.tire import TMsimpleParams, tmsimple_forces

        p = TMsimpleParams()
        flat = lambda xy: jnp.zeros(xy.shape[:-1])
        q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        z = float(p.radius) - float(p.Fz0) / float(p.cz)
        x = jnp.asarray([[0.0, 0.0, z]])
        # heavy combined slip: braking + sliding sideways
        v = jnp.asarray([[10.0, 3.0, 0.0]])
        w = jnp.asarray([[0.0, 10.0 * 0.5 / float(p.radius), 0.0]])
        f, tq, fz = tmsimple_forces(p, x, q, v, w, flat)
        fmag = float(jnp.linalg.norm(f[0][:2]))
        # combined force bounded by the larger single-axis maximum
        assert fmag < 1.1 * float(p.fxm_1)
        # braking: fx opposes motion; side force opposes lateral velocity
        assert float(f[0, 0]) < 0 and float(f[0, 1]) < 0
