"""Model-family + modal-analysis tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestHMMWV:
    def test_accelerates_and_turns(self):
        from chrono_tpu.models import create_hmmwv
        from chrono_tpu.vehicle import vehicle_step, flat_terrain, DriverInputs
        import functools

        vehicle, state = create_hmmwv()
        terrain = flat_terrain(0.0)
        h = 1e-3

        @functools.partial(jax.jit, static_argnums=2)
        def run(state, inputs, n):
            def body(carry, k):
                st, t = carry
                out = vehicle_step(vehicle, st, inputs, terrain, t, h)
                return (out.state, t + h), None

            (st, _), _ = jax.lax.scan(body, (state, jnp.asarray(0.0)),
                                      jnp.arange(n))
            return st

        go = DriverInputs(steering=jnp.asarray(0.0),
                          throttle=jnp.asarray(0.7),
                          braking=jnp.asarray(0.0))
        st = run(state, go, 3000)
        vx = float(st.v[vehicle.chassis, 0])
        assert 5.0 < vx < 30.0, f"HMMWV speed after 3s: {vx}"
        turn = DriverInputs(steering=jnp.asarray(0.3),
                            throttle=jnp.asarray(0.2),
                            braking=jnp.asarray(0.0))
        st2 = run(st, turn, 2000)
        assert abs(float(st2.x[vehicle.chassis, 1])) > 0.5, "should turn"


class TestRover:
    def test_drives_on_scm(self):
        from chrono_tpu.models import create_rover, set_wheel_speeds, \
            rover_step_scm
        from chrono_tpu.vehicle import SCMParams, make_scm_state

        rover, state = create_rover()
        rover = set_wheel_speeds(rover, [4.0, 4.0, 4.0, 4.0])
        scm_p = SCMParams(Kphi=jnp.asarray(2e6), n_exp=jnp.asarray(1.0),
                          friction_angle=jnp.asarray(0.8),
                          janosi_k=jnp.asarray(0.01))
        scm = make_scm_state((-1, -1), (4, 1), 0.05)
        h = 2e-3

        @jax.jit
        def step(state, scm, t):
            return rover_step_scm(rover, state, scm_p, scm, t, h)

        t = 0.0
        for k in range(1500):
            state, scm, info = step(state, scm, t)
            t += h
        x = float(state.x[rover.chassis, 0])
        assert x > 0.5, f"rover barely moved: x={x}"
        # wheels left ruts in the soil
        assert float(scm.sinkage.max()) > 0.002
        # chassis stayed upright
        from chrono_tpu.core import quaternion as Q
        up = np.asarray(Q.qrotate(state.q[rover.chassis],
                                  jnp.asarray([0.0, 0.0, 1.0])))
        assert up[2] > 0.97


class TestModal:
    def test_cantilever_frequency(self):
        from chrono_tpu.fea import CableBuilder, fea_modes
        b = CableBuilder()
        b.add_straight_cable((0, 0, 0), (1, 0, 0), 8, EA=1e7, EI=50.0,
                             rhoA=2.0, fix_first=True)
        mesh, q, qd = b.finalize()
        freqs, shapes = fea_modes(mesh, q, n_modes=4)
        f1_expect = (1.8751**2 / (2 * np.pi)) * np.sqrt(50.0 / 2.0)
        np.testing.assert_allclose(freqs[0], f1_expect, rtol=0.03)
        # modes come in transverse pairs (y/z symmetry)
        np.testing.assert_allclose(freqs[0], freqs[1], rtol=1e-3)

    def test_craig_bampton_keeps_low_modes(self):
        from chrono_tpu.fea import CableBuilder, linearized_KM, eigenmodes, \
            craig_bampton
        b = CableBuilder()
        b.add_straight_cable((0, 0, 0), (1, 0, 0), 10, EA=1e6, EI=20.0,
                             rhoA=1.0, fix_first=True)
        mesh, q, qd = b.finalize()
        K, M, idx = linearized_KM(mesh, q, q.shape[0])
        f_full, _ = eigenmodes(K, M, 4)
        # keep the tip node's 6 DOFs as interface, 12 fixed-interface modes
        boundary = np.zeros(K.shape[0], bool)
        boundary[-6:] = True
        T, Kr, Mr = craig_bampton(K, M, boundary, n_modes=12)
        f_red, _ = eigenmodes(Kr, Mr, 4)
        np.testing.assert_allclose(f_red, f_full, rtol=0.01)


class TestCuriosity:
    def test_rocker_bogie_drives_on_scm(self):
        """6-wheel rocker-bogie (Curiosity-class): drives straight on SCM,
        all six wheels load the soil, differential keeps the chassis level."""
        from chrono_tpu.models import create_curiosity, set_wheel_speeds, \
            rover_step_scm
        from chrono_tpu.vehicle import SCMParams, make_scm_state

        rover, state = create_curiosity()
        assert len(rover.wheels) == 6
        rover = set_wheel_speeds(rover, [3.0] * 6)
        scm_p = SCMParams(Kphi=jnp.asarray(2e6), n_exp=jnp.asarray(1.0),
                          friction_angle=jnp.asarray(0.8),
                          janosi_k=jnp.asarray(0.01))
        scm = make_scm_state((-2.5, -2.5), (6, 2.5), 0.06)
        h = 2e-3

        @jax.jit
        def step(state, scm, t):
            return rover_step_scm(rover, state, scm_p, scm, t, h)

        t = 0.0
        for k in range(1500):
            state, scm, info = step(state, scm, t)
            t += h
        x = float(state.x[rover.chassis, 0])
        assert x > 0.4, f"rover barely moved: x={x}"
        assert float(scm.sinkage.max()) > 0.002
        # every wheel near ground level (none dangling or buried)
        wz = np.asarray(state.x[jnp.asarray(rover.wheels), 2])
        assert (wz > 0.5 * float(rover.wheel_radius)).all()
        assert (wz < 1.6 * float(rover.wheel_radius)).all()
        from chrono_tpu.core import quaternion as Q
        up = np.asarray(Q.qrotate(state.q[rover.chassis],
                                  jnp.asarray([0.0, 0.0, 1.0])))
        assert up[2] > 0.97

    def test_differential_couples_rockers(self):
        """Lift the left-front wheel with an external force (chassis welded
        to ground so pitch angles are clean): the left rocker rotates; the
        planetary differential forces the right rocker to counter-rotate,
        θ_L = −θ_R (2 ω_c = ω_L + ω_R with ω_c = 0)."""
        from chrono_tpu.models.rover import create_curiosity
        from chrono_tpu.physics.builder import SystemBuilder
        from chrono_tpu.physics.system import (
            step_euler_implicit_linearized, SolverSettings)
        from chrono_tpu.core import quaternion as Q

        rover, state = create_curiosity(gravity=(0, 0, 0))
        model = rover.model
        n = model.n_bodies
        # weld chassis: zero its inverse mass/inertia (fixed base)
        props = model.props
        model = model.replace(props=props.replace(
            inv_mass=props.inv_mass.at[rover.chassis].set(0.0),
            inv_inertia=props.inv_inertia.at[rover.chassis].set(0.0)))
        f_ext = jnp.zeros((n, 3)).at[rover.wheels[0], 2].set(800.0)
        settings = SolverSettings(solver="direct")
        h = 2e-3
        t = 0.0
        for _ in range(120):
            state, info = step_euler_implicit_linearized(
                model, state, t, h, settings, f_ext=f_ext)
            t += h

        def pitch_y(q):
            R_e1 = np.asarray(Q.qrotate(q, jnp.asarray([1.0, 0.0, 0.0])))
            return float(np.arctan2(-R_e1[2], R_e1[0]))

        # body order per side: rocker, bogie, 3 wheels → rocker_R = chassis+6
        th_l = pitch_y(state.q[rover.chassis + 1])          # rocker_L
        th_r = pitch_y(state.q[rover.chassis + 6])          # rocker_R
        assert abs(th_l) > 5e-3, f"left rocker did not articulate: {th_l}"
        # Willis ψ=1 with the carrier fixed: equal and opposite
        assert abs(th_l + th_r) < 0.15 * abs(th_l - th_r), (th_l, th_r)
