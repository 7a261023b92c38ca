"""Sedan-class and Polaris-class model parameter sets (reference:
chrono_models/vehicle/sedan, vehicle/polaris) — settle, accelerate, steer."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.models.sedan import create_sedan
from chrono_tpu.models.polaris import create_polaris
from chrono_tpu.vehicle.driver import DriverInputs
from chrono_tpu.vehicle.terrain import flat_terrain
from chrono_tpu.vehicle.wheeled import vehicle_step
from chrono_tpu.physics.system import SolverSettings


def run(vehicle, state, inputs, t_end, h=1e-3):
    terrain = flat_terrain(0.0)
    settings = SolverSettings(solver="direct")

    @functools.partial(jax.jit, static_argnums=1)
    def step_n(state, n):
        def body(carry, k):
            st, t = carry
            out = vehicle_step(vehicle, st, inputs, terrain, t, h, settings)
            return (out.state, t + h), None
        (st, _), _ = jax.lax.scan(body, (state, 0.0), jnp.arange(n))
        return st

    return step_n(state, int(t_end / h))


def _check_family(create, vmin, vmax):
    vehicle, state = create()
    idle = DriverInputs(steering=jnp.asarray(0.0), throttle=jnp.asarray(0.0),
                        braking=jnp.asarray(0.0))
    state = run(vehicle, state, idle, 0.5)
    assert np.isfinite(np.asarray(state.x)).all()
    z0 = float(state.x[vehicle.chassis, 2])

    full = DriverInputs(steering=jnp.asarray(0.0), throttle=jnp.asarray(0.9),
                        braking=jnp.asarray(0.0))
    state = run(vehicle, state, full, 3.0)
    vx = float(state.v[vehicle.chassis, 0])
    assert vmin < vx < vmax, f"3s full-throttle speed {vx}"
    assert abs(float(state.x[vehicle.chassis, 1])) < 0.5       # straight
    assert abs(float(state.x[vehicle.chassis, 2]) - z0) < 0.12  # no flips

    turn = DriverInputs(steering=jnp.asarray(0.5), throttle=jnp.asarray(0.3),
                        braking=jnp.asarray(0.0))
    state = run(vehicle, state, turn, 2.0)
    assert abs(float(state.x[vehicle.chassis, 1])) > 1.0        # it turns
    assert np.isfinite(np.asarray(state.x)).all()


def test_sedan_drives():
    _check_family(create_sedan, 8.0, 40.0)


def test_polaris_drives():
    _check_family(create_polaris, 6.0, 35.0)
