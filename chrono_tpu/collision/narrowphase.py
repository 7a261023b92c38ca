"""Analytic narrowphase primitives.

Counterpart of the reference's analytic pair functions
(/root/reference/src/chrono/collision/multicore/ChNarrowphasePRIMS.cpp) in
branch-free, batched form: every function returns ``(gap, normal, point)`` where
``gap < 0`` means penetration, ``normal`` points from shape A toward shape B, and
``point`` is the world contact point (midway in the overlap).  MPR for general
convex pairs is planned (ChNarrowphaseMPR.cpp); spheres/boxes/capsules/planes
cover the granular + vehicle workloads.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.core import quaternion as Q


def sphere_sphere(ca: Array, ra: Array, cb: Array, rb: Array, eps: float = 1e-12):
    """Sphere A (center ca, radius ra) vs sphere B. Broadcasts leading axes."""
    d = cb - ca
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + eps)
    n = d / dist[..., None]
    gap = dist - (ra + rb)
    p = ca + n * (ra + 0.5 * gap)[..., None]
    return gap, n, p


def sphere_point(c: Array, r: Array, p_surf: Array, eps: float = 1e-12):
    """Sphere vs a point (used for degenerate box corners)."""
    return sphere_sphere(c, r, p_surf, jnp.zeros_like(r), eps)


def sphere_plane(c: Array, r: Array, p0: Array, n_plane: Array):
    """Sphere vs infinite plane with outward normal ``n_plane``.

    Normal returned points from the plane (A) into the sphere (B)? No —
    convention: A = sphere, B = plane; normal points A→B i.e. from the sphere
    toward the plane (−n_plane).
    """
    h = jnp.sum((c - p0) * n_plane, axis=-1)          # signed height of center
    gap = jnp.abs(h) - r
    n = -jnp.sign(h)[..., None] * n_plane             # from sphere toward plane
    p = c + n * (r + 0.5 * gap)[..., None]
    return gap, n, p


def sphere_box(c: Array, r: Array, box_pos: Array, box_rot: Array,
               half: Array, eps: float = 1e-9):
    """Sphere (A) vs oriented box (B): branch-free inside/outside handling.

    Returns gap, world normal pointing sphere→box surface, world contact point.
    """
    cl = Q.qrotate_inv(box_rot, c - box_pos)          # sphere center, box frame
    clamped = jnp.clip(cl, -half, half)
    d = cl - clamped
    d2 = jnp.sum(d * d, axis=-1)
    dist_out = jnp.sqrt(d2 + eps)
    outside = d2 > 1e-14

    # inside: push out along the face with least penetration
    face_depth = half - jnp.abs(cl)                   # (…,3) ≥ 0 when inside
    ax = jnp.argmin(face_depth, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(cl, ax[..., None], axis=-1))[..., 0]
    sign = jnp.where(sign == 0, 1.0, sign)
    eye = jnp.eye(3, dtype=cl.dtype)
    n_in = sign[..., None] * eye[ax]                  # outward face normal
    depth_in = jnp.take_along_axis(face_depth, ax[..., None], axis=-1)[..., 0]

    # n_local = outward direction at the nearest surface point (continuous
    # across the surface): outside it's (center − surface)/|·|, inside it's the
    # outward face normal of the least-penetrated face
    n_local = jnp.where(outside[..., None], d / dist_out[..., None], n_in)
    gap = jnp.where(outside, dist_out - r, -(depth_in + r))
    surf_local = jnp.where(
        outside[..., None], clamped,
        cl + n_in * depth_in[..., None],
    )
    n_world = Q.qrotate(box_rot, -n_local)            # sphere → box
    p_world = box_pos + Q.qrotate(box_rot, surf_local)
    p = p_world + 0.0 * n_world                       # contact at box surface
    return gap, n_world, p


def sphere_capsule(c: Array, r: Array, cap_p0: Array, cap_p1: Array,
                   cap_r: Array, eps: float = 1e-12):
    """Sphere vs capsule (segment p0-p1 with radius cap_r)."""
    ab = cap_p1 - cap_p0
    t = jnp.sum((c - cap_p0) * ab, axis=-1) / jnp.maximum(
        jnp.sum(ab * ab, axis=-1), eps)
    t = jnp.clip(t, 0.0, 1.0)
    closest = cap_p0 + t[..., None] * ab
    return sphere_sphere(c, r, closest, cap_r, eps)


def sphere_triangle(c: Array, r: Array, v0: Array, v1: Array, v2: Array,
                    eps: float = 1e-12):
    """Sphere vs triangle: closest point on the triangle (face/edge/vertex),
    branch-free via barycentric clamping.  Used by the DEM/FSI mesh coupling
    (reference: chrono_dem ChDemBoxTriangle.cuh face/edge/corner tests).
    """
    ab = v1 - v0
    ac = v2 - v0
    ap = c - v0
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = c - v1
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = c - v2
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, eps)
    v = vb / denom
    w = vc / denom
    p_face = v0 + v[..., None] * ab + w[..., None] * ac

    # region tests → closest point candidates
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, eps), 0.0, 1.0)
    p_ab = v0 + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, eps), 0.0, 1.0)
    p_ac = v0 + t_ac[..., None] * ac
    bc = v2 - v1
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), eps), 0.0, 1.0)
    p_bc = v1 + t_bc[..., None] * bc

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    p = p_face
    p = jnp.where(in_edge_bc[..., None], p_bc, p)
    p = jnp.where(in_edge_ac[..., None], p_ac, p)
    p = jnp.where(in_edge_ab[..., None], p_ab, p)
    p = jnp.where(in_vert_c[..., None], v2, p)
    p = jnp.where(in_vert_b[..., None], v1, p)
    p = jnp.where(in_vert_a[..., None], v0, p)

    return sphere_point(c, r, p, eps)
