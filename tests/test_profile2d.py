"""2-D arc/segment profile collision (ChCollisionShapeArc2D/Segment2D
role): a pin circle in a slot profile (two segments + end arcs) is
confined by the profile walls under gravity."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.collision import GridSpec, SphereShapes, CollisionModel, nsc_step
from chrono_tpu.collision.profile2d import (
    Profile2D, ProfileCircles, profile_circle_contacts)


def _slot_profile(body, half_len=0.2, half_w=0.03):
    """Horizontal slot in the x-z plane (frame x-y = world x-z via a
    rotation mapping frame plane onto x-z): two wall segments + two
    concave end arcs."""
    # frame: x = world x, y = world z (rotate -90 deg about x)
    fr = (np.cos(-np.pi / 4), np.sin(-np.pi / 4), 0.0, 0.0)
    seg_a = jnp.asarray([[-half_len, half_w], [-half_len, -half_w]])
    seg_b = jnp.asarray([[half_len, half_w], [half_len, -half_w]])
    arc_c = jnp.asarray([[half_len, 0.0], [-half_len, 0.0]])
    arc_r = jnp.asarray([half_w, half_w])
    arc_a0 = jnp.asarray([-np.pi / 2, np.pi / 2])
    arc_a1 = jnp.asarray([np.pi / 2, 3 * np.pi / 2])
    return Profile2D(body=body, frame_rot=fr, frame_pos=(0.0, 0.0, 0.0),
                     seg_a=seg_a, seg_b=seg_b, arc_c=arc_c, arc_r=arc_r,
                     arc_a0=arc_a0, arc_a1=arc_a1,
                     arc_convex=jnp.asarray([-1.0, -1.0]))


def test_pin_confined_in_slot():
    bld = SystemBuilder()
    bld.set_gravity((2.0, 0.0, -9.81))    # pulls the pin along +x AND down
    g = bld.add_ground()
    pin = bld.add_body(mass=0.5, inertia=(1e-3,) * 3, pos=(0.0, 0.0, 0.0))
    model, state = bld.finalize()

    prof = _slot_profile(g)
    circles = ProfileCircles(body=jnp.asarray([pin], jnp.int32),
                             offset=jnp.zeros((1, 2)),
                             radius=jnp.asarray([0.02]),
                             mu=jnp.asarray([0.1]))
    spheres = SphereShapes(body=jnp.zeros((0,), jnp.int32),
                           offset=jnp.zeros((0, 3)),
                           radius=jnp.zeros((0,)), mu=jnp.zeros((0,)))
    coll = CollisionModel(spheres=spheres, boxes=None,
                          grid=GridSpec(origin=(-2, -2, -2), cell_size=1.0,
                                        dims=(4, 4, 4)),
                          max_contacts=8)
    settings = SolverSettings(solver="apgd", max_iter=120)
    xcf = lambda st: profile_circle_contacts(prof, circles, st)

    h = 1e-3

    @jax.jit
    def advance(st, t):
        def body(carry, _):
            st, t = carry
            st, _, _ = nsc_step(model, coll, st, t, h, settings,
                                extra_contacts_fn=xcf)
            return (st, t + h), None
        (st, t), _ = jax.lax.scan(body, (st, t), None, length=1500)
        return st, t

    state, _ = advance(state, jnp.asarray(0.0))
    p = np.asarray(state.x[pin])
    assert np.isfinite(p).all()
    # settled in the +x end arc pocket: x near half_len - (half_w - r)
    assert 0.17 < p[0] < 0.215, p
    # z confined by the slot walls: |z| <= half_w - r (+tolerance)
    assert abs(p[2]) < 0.013, p
    # stationary
    assert np.abs(np.asarray(state.v[pin])).max() < 0.2
