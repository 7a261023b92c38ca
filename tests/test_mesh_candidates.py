"""Candidate-pruned trimesh narrowphase parity: with mesh_candidates set,
contacts match the dense S×T path on a big mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.collision import GridSpec, SphereShapes, CollisionModel
from chrono_tpu.collision.pipeline import MeshShapes, detect_contacts


def _scene(mesh_candidates):
    rng = np.random.default_rng(5)
    bld = SystemBuilder()
    g = bld.add_ground()
    bodies = []
    for k in range(12):
        bodies.append(bld.add_body(
            mass=1.0, pos=(rng.uniform(0.2, 1.8), rng.uniform(0.2, 1.8),
                           0.08)))
    model, state = bld.finalize()
    spheres = SphereShapes(
        body=jnp.asarray(bodies, jnp.int32),
        offset=jnp.zeros((len(bodies), 3)),
        radius=jnp.full((len(bodies),), 0.1),
        mu=jnp.full((len(bodies),), 0.5))
    # a 10x10 grid mesh floor attached to ground (200 triangles)
    n = 10
    xs = np.linspace(0, 2, n + 1)
    tris0, tris1, tris2 = [], [], []
    for i in range(n):
        for j in range(n):
            a = (xs[i], xs[j], 0.0)
            b = (xs[i + 1], xs[j], 0.0)
            c = (xs[i + 1], xs[j + 1], 0.0)
            d = (xs[i], xs[j + 1], 0.0)
            tris0 += [a, a]
            tris1 += [b, c]
            tris2 += [c, d]
    T = len(tris0)
    meshes = MeshShapes(
        body=jnp.full((T,), g, jnp.int32),
        v0=jnp.asarray(tris0), v1=jnp.asarray(tris1),
        v2=jnp.asarray(tris2), mu=jnp.full((T,), 0.5))
    coll = CollisionModel(
        spheres=spheres, boxes=None, meshes=meshes,
        grid=GridSpec(origin=(-1, -1, -1), cell_size=0.5, dims=(8, 8, 4)),
        max_per_cell=8, max_contacts=128, envelope=0.01,
        mesh_candidates=mesh_candidates)
    return model, coll, state


def _canon(cts):
    act = np.asarray(cts.active)
    rows = np.stack([np.asarray(cts.body_a), np.asarray(cts.body_b),
                     np.asarray(cts.gap)], axis=1)[act]
    return rows[np.lexsort((rows[:, 2], rows[:, 1], rows[:, 0]))]


def test_candidate_pruning_matches_dense():
    model, coll_d, state = _scene(0)
    _, coll_c, _ = _scene(8)
    cts_d = detect_contacts(coll_d, state)
    cts_c = detect_contacts(coll_c, state)
    rd, rc = _canon(cts_d), _canon(cts_c)
    assert len(rd) >= 12            # every ball touches the floor
    assert rd.shape == rc.shape
    np.testing.assert_allclose(rc, rd, atol=1e-6)
