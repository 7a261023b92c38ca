"""Mesh-face (triangle) FEA contact surface — ChContactSurfaceMesh role
(/root/reference/src/chrono/fea/ChContactSurfaceMesh.h).

Covers: box SDF geometry, refinement stability of the area-integrated
penalty (per-area tractions), a shell DRAPING over a box edge (the
behavior node-cloud contact cannot produce between nodes), and the ANCF
tire loading the ground through its face skin."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.fea import ancf
from chrono_tpu.fea.contact import (NodeCloudContact, face_contact_forces,
                                    grid_surface_faces, _box_sdf_normal)


def test_box_sdf_and_normals():
    c = jnp.asarray([0.0, 0.0, 0.0])
    h = jnp.asarray([1.0, 2.0, 0.5])
    pts = jnp.asarray([
        [0.0, 0.0, 1.5],      # above the top face
        [3.0, 0.0, 0.0],      # beyond +x face
        [0.0, 0.0, 0.3],      # inside, nearest the top face
        [2.0, 3.0, 0.0],      # outside an edge (x and y both beyond)
    ])
    sdf, n = _box_sdf_normal(pts, c, h)
    sdf = np.asarray(sdf)
    n = np.asarray(n)
    assert sdf == pytest.approx([1.0, 2.0, -0.2, np.sqrt(2.0)], abs=1e-6)
    assert n[0] == pytest.approx([0, 0, 1], abs=1e-6)
    assert n[1] == pytest.approx([1, 0, 0], abs=1e-6)
    assert n[2] == pytest.approx([0, 0, 1], abs=1e-6)
    assert n[3] == pytest.approx([np.sqrt(0.5), np.sqrt(0.5), 0], abs=1e-5)


def test_box_sdf_rotated():
    # box rotated 90 deg about z: half-extents swap roles in x/y
    q = jnp.asarray([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    sdf, n = _box_sdf_normal(jnp.asarray([[0.0, 2.0, 0.0]]),
                             jnp.asarray([0.0, 0.0, 0.0]),
                             jnp.asarray([1.0, 0.25, 0.25]), q)
    # along world +y the rotated box extends its LOCAL x half-extent (1.0)
    assert float(sdf[0]) == pytest.approx(1.0, abs=1e-5)
    assert np.asarray(n[0]) == pytest.approx([0, 1, 0], abs=1e-5)


def _flat_grid(ni, nj, lx, ly, z0):
    """(4*Nn, 3) ANCF coordinate cloud of a flat x-y sheet at height z0."""
    nn = (ni + 1) * (nj + 1)
    coords = np.zeros((4 * nn, 3))
    for i in range(ni + 1):
        for j in range(nj + 1):
            k = 4 * (i * (nj + 1) + j)
            coords[k] = (i * lx / ni, j * ly / nj, z0)
            coords[k + 1] = (1, 0, 0)
            coords[k + 2] = (0, 1, 0)
            coords[k + 3] = (0, 0, 1)
    return coords, nn


def _sheet_faces(ni, nj):
    return grid_surface_faces(ni + 1, nj, wrap_i=False)


def test_face_force_refinement_stable():
    """Total normal force of a pre-penetrating flat sheet on a plane is a
    surface integral — it must NOT scale with the triangle count."""
    cfg = NodeCloudContact(
        node_radius=jnp.asarray(0.0), kn=jnp.asarray(1e6),
        gn=jnp.asarray(0.0), mu=jnp.asarray(0.0),
        plane_n=jnp.asarray([[0.0, 0.0, 1.0]]), plane_d=jnp.asarray([0.0]))
    totals = []
    for ni in (4, 8):
        coords, nn = _flat_grid(ni, ni, 1.0, 1.0, -0.001)  # 1 mm penetration
        pos = jnp.asarray(coords[::4], jnp.float32)
        faces = jnp.asarray(_sheet_faces(ni, ni), jnp.int32)
        f = face_contact_forces(cfg, faces, pos, jnp.zeros_like(pos))
        totals.append(float(jnp.sum(f[:, 2])))
    # expected: kn * pen * area = 1e6 * 1e-3 * 1.0
    assert totals[0] == pytest.approx(1e3, rel=1e-3)
    assert totals[1] == pytest.approx(totals[0], rel=1e-3)


def _build_sheet(ni, nj, lx, ly, z0, thick=0.004, E=5e6, rho=1100.0):
    coords, nn = _flat_grid(ni, nj, lx, ly, z0)
    conns, dims = [], []
    for i in range(ni):
        for j in range(nj):
            ids = [i * (nj + 1) + j, (i + 1) * (nj + 1) + j,
                   (i + 1) * (nj + 1) + j + 1, i * (nj + 1) + j + 1]
            rows = []
            for nid in ids:
                rows += [4 * nid, 4 * nid + 1, 4 * nid + 2, 4 * nid + 3]
            conns.append(rows)
            dims.append((lx / ni, ly / nj, thick))
    Ev = np.full(3, E)
    nu = np.full(3, 0.3)
    G = Ev / (2 * (1 + nu))
    D = ancf.shell_material_D(Ev, nu, G, theta=0.0)
    layers = [[(thick, rho, D)]] * len(conns)
    mesh = ancf.build_ancf_mesh_layered("shell_3443", coords,
                                        np.asarray(conns, np.int32),
                                        dims, layers, alpha=0.01)
    return mesh, coords, nn


@pytest.mark.slow
def test_shell_drapes_over_box():
    """A square rubber sheet dropped on a narrower box wraps its edges:
    the center rests on the box top, the overhang relaxes BELOW the box
    top — impossible for contact sampled only at widely-spaced nodes if
    the face integration were wrong (forces explode or pass through)."""
    ni = nj = 8
    L = 0.4
    mesh, coords, nn = _build_sheet(ni, nj, L, L, z0=0.004)
    box_top = 0.0
    cfg = NodeCloudContact(
        node_radius=jnp.asarray(0.002), kn=jnp.asarray(2e7),
        gn=jnp.asarray(2e5), mu=jnp.asarray(0.6),
        box_c=jnp.asarray([[0.2, 0.2, -0.1]]),
        box_h=jnp.asarray([[0.08, 0.08, 0.1]]))
    faces = jnp.asarray(_sheet_faces(ni, nj), jnp.int32)
    pos_rows = jnp.asarray(4 * np.arange(nn), jnp.int32)

    mlump = ancf.mesh_lumped_mass(mesh, 4 * nn)
    floor = 1e-3 * float(jnp.mean(mlump))
    minv = 1.0 / jnp.maximum(mlump, floor)
    h = 2e-5

    @functools.partial(jax.jit, static_argnums=2)
    def step_n(c, v, n):
        def body(carry, _):
            c, v = carry
            f = ancf.mesh_internal_forces(mesh, c)
            f = f + ancf.mesh_gravity_forces(mesh, c, (0, 0, -9.81))
            fc = face_contact_forces(cfg, faces, c[pos_rows], v[pos_rows])
            f = f.at[pos_rows].add(fc)
            a = f * minv[:, None]
            v2 = (v + h * a) * (1.0 - 5e-4)       # dynamic relaxation
            return (c + h * v2, v2), None
        return jax.lax.scan(body, (c, v), None, length=n)[0]

    c = jnp.asarray(coords, jnp.float32)
    v = jnp.zeros_like(c)
    for _ in range(10):
        c, v = step_n(c, v, 2000)
    z = np.asarray(c[pos_rows][:, 2]).reshape(ni + 1, nj + 1)
    assert np.isfinite(np.asarray(c)).all()
    # center supported by the box (never falls through; bending may arch
    # it slightly above the skin height as the overhang drapes)
    assert 0.0 < z[ni // 2, nj // 2] < 0.02
    # corners overhang 0.12 m beyond the box edge: they drape BELOW the
    # box top — between-node face contact at the edge makes this stable
    assert z[0, 0] < box_top - 0.01
    assert z[-1, -1] < box_top - 0.01
    # nothing tunneled deep into the box
    assert z.min() > -0.35


@pytest.mark.slow
def test_tire_footprint_via_faces():
    """The ANCF tire pressed on the ground through its FACE skin carries a
    positive vertical load (the r4 'tire footprint via face contact'
    acceptance)."""
    from chrono_tpu.vehicle.fea_tire import (
        load_ancf_tire_spec, build_ancf_tire, make_ancf_tire_step,
        tire_surface_faces, tire_face_contact_force, clamp_rim)

    spec = load_ancf_tire_spec(
        "/root/reference/data/vehicle/hmmwv/tire/HMMWV_ANCF4Tire.json")
    tire = build_ancf_tire(spec, div_circumference=12, reduction=2)
    faces = tire_surface_faces(tire)
    # tire is built resting on z=0 (center z = tire_radius, rim clamped);
    # raising the ground plane to z=+defl presses a footprint into the
    # crown without moving the rim.
    defl = 0.012
    cfg = NodeCloudContact(
        node_radius=jnp.asarray(0.0), kn=jnp.asarray(5e8),
        gn=jnp.asarray(5e5), mu=jnp.asarray(0.8),
        plane_n=jnp.asarray([[0.0, 0.0, 1.0]]),
        plane_d=jnp.asarray([defl]))
    step = make_ancf_tire_step(tire, h=2e-6, relax=2e-3,
                               face_contact=(cfg, faces))
    c, v = tire.coords0, jnp.zeros_like(tire.coords0)

    @jax.jit
    def run(c, v):
        def body(carry, _):
            c, v = carry
            return step(c, v), None
        return jax.lax.scan(body, (c, v), None, length=400)[0]

    for _ in range(5):
        c, v = run(c, v)
    assert bool(jnp.isfinite(c).all())
    fz = float(tire_face_contact_force(tire, cfg, faces, c, v)[2])
    assert fz > 50.0, fz           # a real footprint load develops
    # footprint flattening: the crown is pushed up toward the plane
    zmin = float(jnp.min(c[tire.pos_rows][:, 2]))
    assert zmin > 0.25 * defl, zmin
