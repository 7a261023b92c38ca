"""Trimesh collision shapes for MBS bodies: sphere–triangle closed form +
convex–triangle MPR (triangle = 3-vertex hull), wired through the NSC
pipeline — the role of the reference's Bullet trimesh algorithms
(ChCollisionAlgorithmsBullet.cpp) and ChContactSurfaceMesh."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.collision import (
    GridSpec, SphereShapes, MeshShapes, CollisionModel, detect_contacts,
    nsc_step,
)
from chrono_tpu.collision.pipeline import ConvexShapes
from chrono_tpu.collision import mpr


def _mesh_floor(body, size=4.0, z=0.0, mu=0.5):
    """Two triangles forming a square floor patch at height z."""
    s = size / 2
    verts = [(-s, -s, z), (s, -s, z), (s, s, z), (-s, s, z)]
    faces = [(0, 1, 2), (0, 2, 3)]
    return MeshShapes.from_mesh(body, verts, faces, mu=mu)


def _run(model, coll, state, h, n, settings=None):
    settings = settings or SolverSettings(solver="apgd", max_iter=60)

    @jax.jit
    def step_n(state):
        def body(carry, k):
            st, t = carry
            st, contacts, info = nsc_step(model, coll, st, t, h, settings)
            return (st, t + h), None

        (st, _), _ = jax.lax.scan(body, (state, jnp.asarray(0.0)),
                                  jnp.arange(n))
        return st

    return step_n(state)


def _no_spheres():
    return SphereShapes(body=jnp.zeros((0,), jnp.int32),
                        offset=jnp.zeros((0, 3)), radius=jnp.zeros((0,)),
                        mu=jnp.zeros((0,)))


def test_sphere_rests_on_mesh_floor():
    b = SystemBuilder()
    g = b.add_ground()
    s = b.add_body(mass=1.0, inertia=(0.1,) * 3, pos=(0.2, -0.1, 0.52))
    model, state = b.finalize()
    spheres = SphereShapes(body=jnp.asarray([s], jnp.int32),
                           offset=jnp.zeros((1, 3)),
                           radius=jnp.asarray([0.5]),
                           mu=jnp.asarray([0.4]))
    coll = CollisionModel(
        spheres=spheres, boxes=None, meshes=_mesh_floor(g),
        grid=GridSpec(origin=(-4, -4, -2), cell_size=1.2, dims=(8, 8, 6)),
        max_contacts=16)
    st = _run(model, coll, state, 1e-3, 300)
    assert abs(float(st.x[s, 2]) - 0.5) < 0.02
    assert abs(float(st.v[s, 2])) < 0.05


def test_sphere_detects_mesh_edge_and_face():
    b = SystemBuilder()
    g = b.add_ground()
    s = b.add_body(mass=1.0, pos=(0.0, 0.0, 0.45))
    model, state = b.finalize()
    spheres = SphereShapes(body=jnp.asarray([s], jnp.int32),
                           offset=jnp.zeros((1, 3)),
                           radius=jnp.asarray([0.5]),
                           mu=jnp.asarray([0.4]))
    coll = CollisionModel(
        spheres=spheres, boxes=None, meshes=_mesh_floor(g),
        grid=GridSpec(origin=(-4, -4, -2), cell_size=1.2, dims=(8, 8, 6)),
        max_contacts=16)
    c = detect_contacts(coll, state)
    # the sphere sits over the shared diagonal edge: both triangles report
    # penetrating contacts with an upward-facing (A→B = downward) normal
    act = np.asarray(c.active)
    assert act.sum() >= 1
    gaps = np.asarray(c.gap)[act]
    assert (gaps < 0).all()
    nz = np.asarray(c.normal)[act][:, 2]
    np.testing.assert_allclose(nz, -1.0, atol=1e-5)


def test_cylinder_rolls_over_mesh_ramp():
    """A cylinder (convex, MPR) dropped onto a mesh ramp slides/rolls down
    — convex-vs-triangle contact does real work."""
    b = SystemBuilder()
    g = b.add_ground()
    cyl = b.add_body(mass=2.0, inertia=(0.1, 0.1, 0.1),
                     pos=(0.0, 0.0, 0.33))
    model, state = b.finalize()
    # ramp: a tilted square (15° about y)
    ang = np.deg2rad(15)
    ca, sa = np.cos(ang), np.sin(ang)
    verts = []
    for (x, y) in [(-1.5, -1), (1.5, -1), (1.5, 1), (-1.5, 1)]:
        verts.append((x * ca, y, -x * sa))
    faces = [(0, 1, 2), (0, 2, 3)]
    meshes = MeshShapes.from_mesh(g, verts, faces, mu=0.1)
    # cylinder axis along world y (rotate local z → y)
    qx = np.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0])
    V = 8
    convex = ConvexShapes(
        body=jnp.asarray([cyl], jnp.int32),
        kind=jnp.asarray([mpr.CYLINDER], jnp.int32),
        pos=jnp.zeros((1, 3)), rot=jnp.asarray([qx], jnp.float32),
        data=jnp.asarray([[0.3, 0.4, 0.0]]),   # radius 0.3, half-len 0.4
        verts=jnp.zeros((1, V, 3)), mu=jnp.asarray([0.1]))
    coll = CollisionModel(
        spheres=_no_spheres(), boxes=None, convex=convex, meshes=meshes,
        grid=GridSpec(origin=(-4, -4, -2), cell_size=1.2, dims=(8, 8, 6)),
        max_contacts=32, envelope=0.01)   # persistent-contact margin (the
    # reference's collision envelope default is 0.03)
    st = _run(model, coll, state, 1e-3, 600)
    x = np.asarray(st.x[cyl])
    # it must have moved DOWN the slope (+x is downhill for this tilt)
    assert x[0] > 0.1, x
    # and still be supported by the ramp (roughly on the surface)
    surf_z = -x[0] * np.tan(ang) + 0.3 / np.cos(ang)
    assert abs(x[2] - surf_z) < 0.08, (x[2], surf_z)
    assert bool(np.isfinite(np.asarray(st.x)).all())
