"""External ODE blocks + hydraulic actuator.

Counterparts of utest-level behavior for ChExternalDynamicsODE and
ChHydraulicActuator: a scalar ODE integrates correctly alongside the MBS,
and a hydraulic cylinder pressurizes and lifts a load against gravity."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.external import (
    make_ode_coupled_step, HydraulicParams, make_hydraulic_actuator,
)


def test_ode_block_decay_exact():
    """dy/dt = −λy alongside an (unloaded) body: midpoint accuracy."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    bld.add_ground()
    bld.add_body(mass=1.0, pos=(0, 0, 1))
    model, state = bld.finalize()
    lam = 3.0

    def rhs(t, y, st):
        z = jnp.zeros((model.n_bodies, 3))
        return -lam * y, z, z

    h = 1e-2
    step = jax.jit(make_ode_coupled_step(model, rhs, h))
    y = jnp.asarray([1.0])
    t = 0.0
    for _ in range(100):
        state, y, _ = step(state, y, t)
        t += h
    np.testing.assert_allclose(float(y[0]), np.exp(-lam * t), rtol=1e-3)


def test_hydraulic_actuator_lifts_load():
    """Valve open → head chamber pressurizes → the cylinder extends,
    lifting a hanging mass; closing the valve holds it (oil stiffness)."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    gnd = bld.add_ground()
    load = bld.add_body(mass=100.0, inertia=(1, 1, 1), pos=(0, 0, -0.5))
    # keep the mass on a vertical rail (prismatic along z)
    bld.add_joint("prismatic", load, gnd, world_pos=(0, 0, -0.5),
                  world_axis=(0, 0, 1))
    model, state = bld.finalize()

    # cylinder mounted BELOW the load (anchor at z=-1.2): extension lifts
    hp = HydraulicParams(stroke0=jnp.asarray(0.7))
    t_close = 0.6
    valve = lambda t: jnp.where(t < t_close, 0.8, 0.0)
    y0, rhs = make_hydraulic_actuator(model, gnd, load, (0, 0, -1.2),
                                      (0, 0, 0), hp, valve)
    h = 2e-4
    step = jax.jit(make_ode_coupled_step(model, rhs, h))
    y = y0
    t = 0.0
    z0 = float(state.x[load, 2])
    for _ in range(int(t_close / h)):
        state, y, _ = step(state, y, t)
        t += h
    z_lift = float(state.x[load, 2])
    assert z_lift > z0 + 0.02, f"no lift: {z_lift - z0:.4f} m"
    p1 = float(y[0])
    # head pressure at least the static load pressure mg/A
    assert p1 > 100 * 9.81 / float(hp.area_head) * 0.8

    # valve closed: held position (trapped oil), small drift only
    for _ in range(1500):
        state, y, _ = step(state, y, t)
        t += h
    z_hold = float(state.x[load, 2])
    assert abs(z_hold - z_lift) < 0.02, (z_hold, z_lift)
    assert abs(float(state.v[load, 2])) < 0.05
