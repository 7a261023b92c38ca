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
