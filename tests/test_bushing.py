"""Compliant bushing force element (ChLinkBushing role): static sag under
load matches k, rotational compliance matches k_r, damping settles."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.system import SolverSettings, simulate

SET = SolverSettings(solver="direct")


def test_translational_sag():
    """mg = k_z · δ at equilibrium."""
    m, kz = 5.0, 2e4
    bld = SystemBuilder()
    g = bld.add_ground()
    b = bld.add_body(mass=m, pos=(0, 0, 0))
    bld.add_bushing(g, b, (0, 0, 0), k_t=(2e4, 2e4, kz),
                    c_t=(500.0,) * 3, k_r=(50.0,) * 3, c_r=(5.0,) * 3)
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 1500, SET)
    dz = float(state.x[b, 2])
    np.testing.assert_allclose(dz, -m * 9.81 / kz, rtol=0.02)
    assert abs(float(state.v[b, 2])) < 1e-3


def test_rotational_compliance():
    """Constant torque about z: θ = τ / k_rz at equilibrium."""
    from chrono_tpu.core.functions import FConst

    krz = 40.0
    tau = 2.0
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    g = bld.add_ground()
    b = bld.add_body(mass=1.0, inertia=(0.05,) * 3)
    bld.add_bushing(g, b, (0, 0, 0), k_t=(1e5,) * 3, c_t=(1e3,) * 3,
                    k_r=(krz,) * 3, c_r=(2.0,) * 3)
    bld.add_motor_rotation_torque(g, b, (0, 0, 0), (0, 0, 1), FConst(tau),
                                  add_joint=False)
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 2500, SET)
    q = np.asarray(state.q[b])
    theta = 2.0 * np.arctan2(q[3], q[0])
    np.testing.assert_allclose(theta, tau / krz, rtol=0.03)
