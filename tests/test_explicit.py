"""Explicit integrator convergence-order tests (projectile + spinning top)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.physics import SystemBuilder, step_heun, step_rk4, \
    step_euler_explicit


def projectile():
    b = SystemBuilder()
    b.add_body(mass=1.0, pos=(0, 0, 0), vel=(10.0, 0, 10.0))
    return b.finalize()


class TestExplicit:
    @pytest.mark.parametrize("stepper,order", [
        (step_euler_explicit, 1), (step_heun, 2), (step_rk4, 2)])
    def test_projectile(self, stepper, order):
        model, state = projectile()
        h, n = 1e-2, 100
        st = state
        for k in range(n):
            st = stepper(model, st, k * h, h)
        t = n * h
        z_exact = 10 * t - 0.5 * 9.81 * t * t
        tol = {1: 0.06, 2: 1e-3}[order]
        np.testing.assert_allclose(float(st.x[0, 2]), z_exact, atol=tol)
        np.testing.assert_allclose(float(st.x[0, 0]), 10 * t, atol=tol)

    def test_torque_free_gyroscope_rk4(self):
        # symmetric top spinning about its symmetry axis: |L| conserved, and
        # the angular momentum direction fixed in space
        b = SystemBuilder()
        b.set_gravity((0, 0, 0))
        b.add_body(mass=1.0, inertia=(1.0, 1.0, 2.0),
                   omega_local=(0.1, 0.0, 5.0))
        model, state = b.finalize()
        from chrono_tpu.core import quaternion as Q
        L0 = np.asarray(Q.qrotate(state.q[0],
                                  model.props.inertia[0] * state.w[0]))
        st = state
        h = 1e-3
        for k in range(2000):
            st = step_rk4(model, st, k * h, h)
        L1 = np.asarray(Q.qrotate(st.q[0], model.props.inertia[0] * st.w[0]))
        np.testing.assert_allclose(L1, L0, atol=2e-3)
