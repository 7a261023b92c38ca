"""Deformable (FEA) tires: full layered ANCF shell tire + flexible ring.

Counterparts of the reference's FEA tire family
(/root/reference/src/chrono_vehicle/wheeled_vehicle/tire/ChDeformableTire.h,
ChANCFTire.cpp CreateMeshANCF4 node/element layout,
ChANCFTire.h Section/Profile):

* :func:`build_ancf_tire` — the REAL deformable tire: a surface of
  revolution of the spec's profile spline, meshed with fully parameterized
  layered ANCF 3443 shells (fea/ancf.py), bead / sidewall / tread sections
  each a stack of orthotropic plies at their fiber angles, bead edges
  clamped to the rim, inflation as a follower pressure on the current
  surface, and ground contact via the node-cloud penalty surface.  Specs
  load straight from the reference's own JSON decks
  (data/vehicle/hmmwv/tire/HMMWV_ANCF4Tire.json et al.).
* :func:`build_ring_tire` — the reduced "flexible ring on elastic
  foundation" model kept for cheap in-plane dynamics.

TPU-first design: the tire is three stacked-element ANCF meshes (one per
section — layer counts differ) over ONE shared coordinate cloud; forces are
batched vmap sweeps + one segment-sum scatter, and time stepping is
explicit with the HRZ-lumped mass (no global solve), so the whole
advance jits into a single fused program.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from chrono_tpu.fea.beam import BeamBuilder, BeamMesh
from chrono_tpu.fea.contact import (NodeCloudContact, node_cloud_forces,
                                    face_contact_forces, grid_surface_faces)


class RingTire(NamedTuple):
    mesh: BeamMesh
    q0: jnp.ndarray            # (Nn, 6) reference nodes
    center: jnp.ndarray        # (3,) rim center at build time
    radius: float
    spoke_k: float             # radial foundation stiffness per node [N/m]
    spoke_kt: float            # tangential (driving) stiffness per node
    spoke_c: float


def build_ring_tire(radius=0.33, n_seg=32, center=(0.0, 0.0, 0.33),
                    EA=2.0e6, EI=30.0, GJ=20.0, rhoA=3.0,
                    spoke_k=2.0e5, spoke_kt=1.0e5, spoke_c=300.0,
                    damping=2e-3) -> RingTire:
    """Belt ring in the x–z plane (rolling direction +x)."""
    b = BeamBuilder()
    c = np.asarray(center, float)
    ids = []
    for k in range(n_seg):
        th = 2 * np.pi * k / n_seg
        ids.append(b.add_node(c + radius * np.array(
            [np.sin(th), 0.0, -np.cos(th)])))
    for k in range(n_seg):
        b.add_element(ids[k], ids[(k + 1) % n_seg], EA, GJ, EI, EI, rhoA,
                      damping)
    mesh, q = b.finalize()
    return RingTire(mesh=mesh, q0=q, center=jnp.asarray(c, jnp.float32),
                    radius=float(radius), spoke_k=float(spoke_k),
                    spoke_kt=float(spoke_kt), spoke_c=float(spoke_c))


def make_tire_force_fn(tire: RingTire, contact: NodeCloudContact,
                       rim_center_fn=None, rim_angle_fn=None):
    """State-dependent load hook for the FEA steppers: spoke foundation to
    the (possibly moving/spinning) rim + ground contact.

    ``rim_center_fn(t)`` and ``rim_angle_fn(t)`` prescribe rim motion;
    defaults hold the rim at the build pose.  The returned fn closes over a
    scalar time carried via ``set_time`` (functional: returns a new fn)."""
    n = tire.q0.shape[0]
    th0 = 2 * np.pi * np.arange(n) / n
    e_r0 = jnp.asarray(np.stack([np.sin(th0), np.zeros(n), -np.cos(th0)],
                                axis=1), jnp.float32)
    e_t0 = jnp.asarray(np.stack([np.cos(th0), np.zeros(n), np.sin(th0)],
                                axis=1), jnp.float32)

    def force(q, qd, t=0.0):
        center = (tire.center if rim_center_fn is None
                  else jnp.asarray(rim_center_fn(t)))
        ang = 0.0 if rim_angle_fn is None else rim_angle_fn(t)
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        # rotate the attachment directions with the rim spin (about +y)
        e_r = jnp.stack([e_r0[:, 0] * ca + (-e_r0[:, 2]) * sa,
                         e_r0[:, 1],
                         e_r0[:, 2] * ca + e_r0[:, 0] * sa], axis=1)
        anchors = center[None, :] + tire.radius * e_r
        d = q[:, 0:3] - anchors
        f = -tire.spoke_k * d - tire.spoke_c * qd[:, 0:3]
        # stiffer radial than tangential: project and blend
        d_r = jnp.sum(d * e_r, axis=1, keepdims=True) * e_r
        f = f + (tire.spoke_kt - tire.spoke_k) * 0.0 * d_r  # isotropic v1
        out = jnp.zeros_like(q).at[:, 0:3].set(f)
        return out + node_cloud_forces(contact, q, qd)

    return force


def footprint_deflection(tire: RingTire, q) -> float:
    """Radial deflection at the lowest node vs the free radius."""
    z_min = float(jnp.min(q[:, 2]))
    return float(tire.center[2]) - tire.radius - z_min


# ==========================================================================
# Full layered ANCF shell tire
# ==========================================================================

import json as _json

from chrono_tpu.fea import ancf as _ancf


class ANCFTireSpec(NamedTuple):
    tire_radius: float
    rim_radius: float
    rim_width: float
    materials: tuple        # ((rho, E(3,), nu(3,), G(3,)), ...)
    sections: tuple         # per section (bead, sidewall, tread):
                            #   (thicknesses, ply_angles_rad, mat_ids, n_els)
    profile: np.ndarray     # (P, 3) rows [t, x_radial, y_transversal]
    pressure: float
    damping: float
    contact_kn: float
    contact_gn: float
    contact_mu: float


def load_ancf_tire_spec(src) -> ANCFTireSpec:
    """Parse the reference's ANCFTire JSON deck (a dict or a file path),
    e.g. /root/reference/data/vehicle/hmmwv/tire/HMMWV_ANCF4Tire.json."""
    if isinstance(src, dict):
        d = src
    else:
        with open(src) as f:
            d = _json.load(f)
    mats = tuple(
        (float(m["Density"]),
         np.asarray(m["E"], float),
         np.asarray(m["nu"], float),
         np.asarray(m.get("G", np.asarray(m["E"], float)
                          / (2 * (1 + np.asarray(m["nu"], float)))), float))
        for m in d["Materials"])
    secs = []
    for key in ("Bead Section", "Sidewall Section", "Tread Section"):
        s = d[key]
        secs.append((np.asarray(s["Layer Thickness"], float),
                     np.deg2rad(np.asarray(s["Ply Angle"], float)),
                     np.asarray(s["Material ID"], int),
                     int(s["Number Elements"])))
    cm = d.get("Contact Material", {})
    co = cm.get("Coefficients", {})
    return ANCFTireSpec(
        tire_radius=float(d["Tire Radius"]),
        rim_radius=float(d["Rim Radius"]),
        rim_width=float(d["Rim Width"]),
        materials=mats, sections=tuple(secs),
        profile=np.asarray(d["Profile"], float),
        pressure=float(d.get("Default Pressure", 0.0)),
        damping=float(d.get("Structural Damping Coefficient", 0.01)),
        contact_kn=float(co.get("Normal Stiffness", 2e6)),
        contact_gn=float(co.get("Normal Damping", 13.0)),
        contact_mu=float(cm.get("Coefficient of Friction", 0.9)),
    )


def _natural_cubic(t, y):
    """Natural cubic spline through (t, y); returns eval fn giving (y, y')."""
    t = np.asarray(t, float)
    y = np.asarray(y, float)
    n = len(t)
    h = np.diff(t)
    A = np.zeros((n, n))
    r = np.zeros(n)
    A[0, 0] = A[-1, -1] = 1.0
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        r[i] = 3 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    c = np.linalg.solve(A, r)
    b = (np.diff(y) / h) - h * (2 * c[:-1] + c[1:]) / 3
    dcoef = (c[1:] - c[:-1]) / (3 * h)

    def ev(tq):
        tq = np.atleast_1d(np.asarray(tq, float))
        i = np.clip(np.searchsorted(t, tq) - 1, 0, n - 2)
        dt = tq - t[i]
        val = y[i] + b[i] * dt + c[i] * dt ** 2 + dcoef[i] * dt ** 3
        der = b[i] + 2 * c[i] * dt + 3 * dcoef[i] * dt ** 2
        return val, der

    return ev


class ANCFTire(NamedTuple):
    meshes: tuple            # ANCFMesh per section in use
    coords0: jnp.ndarray     # (4*Nn, 3) coordinate cloud (pos + 3 gradients)
    fixed: jnp.ndarray       # (4*Nn,) bool — rim-clamped rows
    pos_rows: jnp.ndarray    # (Nn,) indices of position triplets
    grid: tuple              # (nc, nw+1) node grid shape
    rim_nodes: jnp.ndarray   # (Nr,) node ids clamped to the rim
    rim_local: jnp.ndarray   # (Nr, 4, 3) clamped triplets in rim frame
    center: jnp.ndarray      # (3,) build-time rim center
    mlump: jnp.ndarray       # (4*Nn,) lumped mass per coordinate row
    spec: ANCFTireSpec
    node_mass: float


def build_ancf_tire(spec: ANCFTireSpec, div_circumference=24,
                    center=(0.0, 0.0, None), reduction=1) -> ANCFTire:
    """Mesh the tire (reference node/element layout: ChANCFTire.cpp
    CreateMeshANCF4).  ``reduction`` divides each section's element count
    (>=1 per section) for cheap test meshes; dims/layers stay physical.
    Axis of revolution = +y; default center rests the tire on z=0."""
    nc = int(div_circumference)
    evx = _natural_cubic(spec.profile[:, 0], spec.profile[:, 1])
    evy = _natural_cubic(spec.profile[:, 0], spec.profile[:, 2])

    n_per = [max(1, int(np.ceil(s[3] / reduction))) for s in spec.sections]
    nb, ns, nt = n_per
    # width-wise element pattern (mirrored): bead|sidewall|tread|tread|sw|bead
    sec_of_j = ([0] * nb + [1] * ns + [2] * (2 * nt) + [1] * ns + [0] * nb)
    nw = len(sec_of_j)
    tj = np.linspace(0.0, 1.0, nw + 1)

    cz = spec.tire_radius if center[2] is None else float(center[2])
    c = np.array([center[0], center[1], cz])

    xprf, xp = evx(tj)
    yprf, yp = evy(tj)

    nn = nc * (nw + 1)
    coords0 = np.zeros((4 * nn, 3))
    for i in range(nc):
        phi = 2 * np.pi * i / nc
        cphi, sphi = np.cos(phi), np.sin(phi)
        circ = np.array([-sphi, 0.0, cphi])              # d/dphi direction
        for j in range(nw + 1):
            r = spec.rim_radius + xprf[j]
            pos = c + np.array([r * cphi, yprf[j], r * sphi])
            tprf = np.array([cphi * xp[j], yp[j], sphi * xp[j]])
            tprf /= np.linalg.norm(tprf)
            # outward node normal, matching the reference's orientation
            # (ChANCFTire.cpp:127 Vcross(tan_prf, nrm)) so zeta=-1..+1 runs
            # inner->outer and asymmetric layer stacks land on the correct
            # face (tread rubber outside, belt order preserved).  To keep the
            # element triad right-handed (positive Jacobian) with an outward
            # normal, element x runs along MINUS the circumferential
            # direction — exactly the reference's connectivity, where
            # node0=(i+1,j) and node1=(i,j) (ChANCFTire.cpp:141-155).
            nrm = np.cross(tprf, circ)
            nrm /= np.linalg.norm(nrm)
            k = 4 * (i * (nw + 1) + j)
            coords0[k] = pos
            coords0[k + 1] = -circ
            coords0[k + 2] = tprf
            coords0[k + 3] = nrm

    # per-section element lists
    conns = [[] for _ in spec.sections]
    dims = [[] for _ in spec.sections]
    dphi = 2 * np.pi / nc
    # profile arc lengths per j-interval (dense chord sum)
    tq = np.linspace(0.0, 1.0, 40 * nw + 1)
    xq, _ = evx(tq)
    yq, _ = evy(tq)
    seg = np.hypot(np.diff(xq), np.diff(yq))
    arc = np.concatenate([[0.0], np.cumsum(seg)])
    arc_j = np.interp(tj, tq, arc)

    for i in range(nc):
        i1 = (i + 1) % nc
        for j in range(nw):
            s = sec_of_j[j]
            # element x = A->B = -circumferential (see node-gradient comment)
            nA = i1 * (nw + 1) + j
            nB = i * (nw + 1) + j
            nC = i * (nw + 1) + j + 1
            nD = i1 * (nw + 1) + j + 1
            rows = []
            for nid in (nA, nB, nC, nD):
                rows += [4 * nid, 4 * nid + 1, 4 * nid + 2, 4 * nid + 3]
            conns[s].append(rows)
            r_mid = spec.rim_radius + 0.5 * (xprf[j] + xprf[j + 1])
            lx = dphi * r_mid
            ly = arc_j[j + 1] - arc_j[j]
            tz = float(np.sum(spec.sections[s][0]))
            dims[s].append((lx, ly, tz))

    # rim clamp: all triplets of bead-edge nodes (j = 0 and j = nw)
    fixed = np.zeros((4 * nn,), bool)
    rim_nodes = []
    for i in range(nc):
        for j in (0, nw):
            nid = i * (nw + 1) + j
            rim_nodes.append(nid)
            fixed[4 * nid:4 * nid + 4] = True
    rim_nodes = np.asarray(rim_nodes, np.int32)
    rim_local = np.stack([coords0[4 * n:4 * n + 4] for n in rim_nodes])
    rim_local[:, 0, :] -= c                      # positions rim-relative

    meshes = []
    mlump = jnp.zeros((4 * nn,), jnp.float32)
    for s, (thick, ang, mid, _) in enumerate(spec.sections):
        if not conns[s]:
            continue
        layers = []
        for t_l, th_l, m_l in zip(thick, ang, mid):
            rho, E, nu, G = spec.materials[m_l]
            D = _ancf.shell_material_D(E, nu, G, theta=float(th_l))
            layers.append((float(t_l), rho, D))
        mesh = _ancf.build_ancf_mesh_layered(
            "shell_3443", coords0, np.asarray(conns[s], np.int32),
            dims[s], [layers] * len(conns[s]), alpha=spec.damping,
            fixed=fixed)
        meshes.append(mesh)
        mlump = mlump + _ancf.mesh_lumped_mass(mesh, 4 * nn)

    pos_rows = jnp.asarray(4 * np.arange(nn), jnp.int32)
    total_mass = float(jnp.sum(mlump))
    return ANCFTire(
        meshes=tuple(meshes), coords0=jnp.asarray(coords0, jnp.float32),
        fixed=jnp.asarray(fixed), pos_rows=pos_rows, grid=(nc, nw + 1),
        rim_nodes=jnp.asarray(rim_nodes),
        rim_local=jnp.asarray(rim_local, jnp.float32),
        center=jnp.asarray(c, jnp.float32), mlump=mlump, spec=spec,
        node_mass=total_mass / nn)


def tire_pressure_forces(tire: ANCFTire, coords, pressure) -> jnp.ndarray:
    """Follower inflation load: p·n̂·dA on the CURRENT surface (the
    reference applies ChLoaderPressure on each shell element,
    ChDeformableTire.cpp ApplyPressure).  Normals/areas from central
    differences on the node grid (periodic in the circumferential index,
    one-sided at the clamped bead edges)."""
    nc, nwp = tire.grid
    P = coords[tire.pos_rows].reshape(nc, nwp, 3)
    t_c = jnp.roll(P, -1, axis=0) - jnp.roll(P, 1, axis=0)
    Pw_p = jnp.concatenate([P[:, 1:], P[:, -1:]], axis=1)
    Pw_m = jnp.concatenate([P[:, :1], P[:, :-1]], axis=1)
    t_w = Pw_p - Pw_m
    nvec = jnp.cross(t_w, t_c)                       # outward for our layout
    # central differences span 2 cells each way -> dA = |cross| / 4
    f = 0.25 * pressure * nvec
    out = jnp.zeros_like(coords)
    return (out.at[tire.pos_rows].add(f.reshape(-1, 3))
            * (~tire.fixed)[:, None])


def clamp_rim(tire: ANCFTire, coords, rim_center, rim_quat=None):
    """Rewrite the clamped bead rows from a rigid rim pose (position +
    optional unit quaternion)."""
    from chrono_tpu.core.quaternion import qrotate as _qrot
    loc = tire.rim_local                             # (Nr, 4, 3)
    if rim_quat is not None:
        loc = _qrot(rim_quat[None, None, :], loc)
    world = loc.at[:, 0, :].add(jnp.asarray(rim_center)[None, :])
    rows = (4 * tire.rim_nodes[:, None] + jnp.arange(4)[None, :]).reshape(-1)
    return coords.at[rows].set(world.reshape(-1, 3))


def tire_surface_faces(tire: ANCFTire):
    """(F, 3) triangle skin over the tire's node grid (node-id space), for
    face contact (ChContactSurfaceMesh role — the reference builds the same
    skin via ChContactSurfaceMesh::AddFacesFromBoundary)."""
    nc, nwp = tire.grid
    return grid_surface_faces(nc, nwp - 1, wrap_i=True)


def make_ancf_tire_step(tire: ANCFTire, h, pressure=None, contact=None,
                        gravity=None, relax=0.0, min_mass_frac=1e-3,
                        structural_damping=False, face_contact=None):
    """Jittable explicit step over (coords, vel) with the HRZ-lumped mass.
    ``relax`` adds mass-proportional damping (dynamic relaxation for
    statics).  ``min_mass_frac`` floors each coordinate row's lumped mass
    at that fraction of the mean row mass: ANCF gradient-DOF diagonal
    masses are ~1e-8 of the position rows (they scale with thickness²),
    which no explicit dt survives; flooring them slows only the gradient
    transients, not the position-row dynamics that set the physics.
    ``structural_damping=False`` drops the alpha·D·eps_dot term: it is
    stiffness-proportional, so its explicit stability bound scales with
    1/omega_max^2 (vs 1/omega_max for the elastic term) — keep it off for
    dynamic-relaxation statics, on (with a tiny h) for transients.
    ``face_contact``: optional (cfg, faces) pair — ground contact through
    the triangle skin (ChContactSurfaceMesh role; cfg.kn/gn per-area) in
    place of / in addition to the node-cloud ``contact``.
    Returns step(coords, vel) -> (coords, vel)."""
    p = tire.spec.pressure if pressure is None else float(pressure)
    floor = min_mass_frac * float(jnp.mean(tire.mlump))
    minv = 1.0 / jnp.maximum(tire.mlump, floor)
    free = (~tire.fixed)[:, None]
    if face_contact is not None:
        fc_cfg, fc_faces = face_contact
        fc_faces = jnp.asarray(fc_faces, jnp.int32)

    def step(coords, vel):
        f = jnp.zeros_like(coords)
        for m in tire.meshes:
            f = f + (_ancf.mesh_internal_forces(m, coords, vel)
                     if structural_damping
                     else _ancf.mesh_internal_forces(m, coords))
        f = f + tire_pressure_forces(tire, coords, p)
        if gravity is not None:
            for m in tire.meshes:
                f = f + _ancf.mesh_gravity_forces(m, coords, gravity)
        if contact is not None:
            pos = coords[tire.pos_rows]
            pvel = vel[tire.pos_rows]
            fc = node_cloud_forces(contact, pos, pvel)
            f = f.at[tire.pos_rows].add(fc) * free
        if face_contact is not None:
            pos = coords[tire.pos_rows]
            pvel = vel[tire.pos_rows]
            ff = face_contact_forces(fc_cfg, fc_faces, pos, pvel)
            f = f.at[tire.pos_rows].add(ff) * free
        a = f * minv[:, None]
        vel2 = (vel + h * a) * (1.0 - relax) * free
        return coords + h * vel2, vel2

    return step


def tire_contact_force(tire: ANCFTire, contact, coords, vel) -> jnp.ndarray:
    """Total ground reaction (3,) — the load-deflection observable."""
    pos = coords[tire.pos_rows]
    pvel = vel[tire.pos_rows]
    return jnp.sum(node_cloud_forces(contact, pos, pvel), axis=0)


def tire_face_contact_force(tire: ANCFTire, cfg, faces, coords,
                            vel) -> jnp.ndarray:
    """Total ground reaction (3,) through the face surface."""
    pos = coords[tire.pos_rows]
    pvel = vel[tire.pos_rows]
    return jnp.sum(face_contact_forces(cfg, jnp.asarray(faces, jnp.int32),
                                       pos, pvel), axis=0)
