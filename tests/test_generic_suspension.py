"""Generic data-driven suspension corner (ChGenericWheeledSuspension role):
a double-wishbone expressed purely as a JSON-style spec behaves like a
suspension — the wheel moves vertically against the spring under load and
the linkage holds it laterally."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.physics.system import step_euler_implicit_linearized
from chrono_tpu.vehicle.suspension import add_generic_corner

SPEC = {
    "bodies": {
        "uca": {"mass": 2.0, "inertia": [0.02, 0.02, 0.02],
                "pos": [0.0, -0.35, 0.25]},
        "lca": {"mass": 3.0, "inertia": [0.03, 0.03, 0.03],
                "pos": [0.0, -0.35, -0.05]},
        "upright": {"mass": 4.0, "inertia": [0.04, 0.04, 0.04],
                    "pos": [0.0, -0.6, 0.1]},
    },
    "joints": [
        {"kind": "revolute", "body1": "uca", "body2": "chassis",
         "pos": [0.0, -0.15, 0.25], "axis": [1, 0, 0]},
        {"kind": "revolute", "body1": "lca", "body2": "chassis",
         "pos": [0.0, -0.15, -0.05], "axis": [1, 0, 0]},
        {"kind": "spherical", "body1": "uca", "body2": "upright",
         "pos": [0.0, -0.55, 0.25]},
        {"kind": "spherical", "body1": "lca", "body2": "upright",
         "pos": [0.0, -0.55, -0.05]},
    ],
    "distances": [
        {"body1": "upright", "body2": "rack",
         "point1": [-0.15, -0.5, 0.1], "point2": [-0.15, -0.2, 0.1]},
    ],
    "tsdas": [
        {"body1": "chassis", "body2": "lca",
         "point1": [0.0, -0.3, 0.5], "point2": [0.0, -0.4, -0.05],
         "k": 60000.0, "c": 4000.0},
    ],
    "spindle": {"attachment": "upright", "pos": [0.0, -0.6, 0.1],
                "mass": 10.0, "inertia": [0.3, 0.5, 0.3],
                "axis": [0, 1, 0]},
}


def test_generic_corner_acts_as_suspension():
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    g = bld.add_ground()
    chassis = bld.add_body(mass=300.0, inertia=(40.0, 40.0, 40.0),
                           pos=(0, 0, 0.1), fixed=True)
    ids = add_generic_corner(bld, chassis, (0.0, 0.0, 0.0), SPEC, side=-1)
    model, state = bld.finalize()
    wheel = ids["wheel"]
    z0 = float(state.x[wheel, 2])
    y0 = float(state.x[wheel, 1])
    s = SolverSettings(solver="direct")
    t = jnp.asarray(0.0)

    @jax.jit
    def run(st, t):
        def body(carry, _):
            st, t = carry
            st, _ = step_euler_implicit_linearized(model, st, t, 1e-3, s)
            return (st, t + 1e-3), None
        (st, t), _ = jax.lax.scan(body, (st, t), None, length=500)
        return st, t

    state, t = run(state, t)
    assert bool(jnp.isfinite(state.x).all())
    z1 = float(state.x[wheel, 2])
    y1 = float(state.x[wheel, 1])
    # the unsupported corner sags on the spring: wheel dropped a
    # macroscopic but bounded amount
    assert 0.005 < z0 - z1 < 0.12, (z0, z1)
    # the linkage held it laterally
    assert abs(y1 - y0) < 0.02
    # settles (velocity decays through the damper)
    v1 = float(jnp.abs(state.v[wheel]).max())
    assert v1 < 0.3
