"""MPR (Minkowski Portal Refinement) narrowphase for general convex pairs.

TPU-native counterpart of the reference's in-house MPR
(/root/reference/src/chrono/collision/multicore/ChNarrowphaseMPR.cpp:584-640):
contact between ANY two convex shapes defined purely by support functions.
Where the reference's per-pair CUDA/CPU routine loops until convergence with
data-dependent control flow, this version runs a FIXED number of portal
refinements (a ``lax.fori_loop``) — the standard compiler-friendly trade: a
few extra iterations for zero divergence — and is ``vmap``-ed over pair
batches.

Shapes supported (reference ConvexShape menu): sphere, box, capsule,
cylinder (z-axis), and fixed-capacity convex hulls.  Each is a support
function ``s(dir) -> point`` in world frame; Minkowski-difference support is
``sA(d) − sB(−d)``.

Returned contact: ``(gap, normal, point)`` matching the analytic narrowphase
conventions (gap < 0 ⇒ penetration, normal A→B).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.core import quaternion as Q

# shape type codes
SPHERE, BOX, CAPSULE, CYLINDER, HULL = 0, 1, 2, 3, 4


class ConvexShape(NamedTuple):
    """One convex shape: type + pose + sized parameters.

    data layout by type:
      SPHERE:   data[0] = radius
      BOX:      data[0:3] = half extents
      CAPSULE:  data[0] = radius, data[1] = half length (z axis)
      CYLINDER: data[0] = radius, data[1] = half length (z axis)
      HULL:     verts (V, 3) local vertices (pad by repeating any vertex)
    """

    kind: Array      # () int32
    pos: Array       # (3,)
    rot: Array       # (4,)
    data: Array      # (3,)
    verts: Array     # (V, 3) — zeros for non-hull shapes


def make_shape(kind, pos, rot=None, data=(0.0, 0.0, 0.0), verts=None,
               n_verts: int = 8) -> ConvexShape:
    import numpy as np

    rot = jnp.asarray([1.0, 0, 0, 0]) if rot is None else jnp.asarray(rot)
    if verts is None:
        v = jnp.zeros((n_verts, 3))
    else:
        verts = np.asarray(verts, np.float32)
        v = jnp.asarray(np.concatenate(
            [verts, np.repeat(verts[-1:], n_verts - len(verts), axis=0)])
            if len(verts) < n_verts else verts[:n_verts])
    return ConvexShape(kind=jnp.asarray(kind, jnp.int32),
                       pos=jnp.asarray(pos, jnp.float32), rot=rot,
                       data=jnp.asarray(data, jnp.float32), verts=v)


def support(shape: ConvexShape, d_world: Array, eps: float = 1e-12) -> Array:
    """Farthest point of the shape along ``d_world`` (world frame)."""
    d = Q.qrotate_inv(shape.rot, d_world)            # direction in local
    dn = d / jnp.sqrt(jnp.sum(d * d) + eps)

    r = shape.data[0]
    sph = dn * r

    box = jnp.sign(d) * shape.data
    # capsule: sphere swept segment along z
    hz = shape.data[1]
    cap = dn * r + jnp.array([0.0, 0.0, 1.0]) * jnp.sign(d[2]) * hz
    # cylinder: disc edge + flat cap
    dxy = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + eps)
    cyl = jnp.stack([r * d[0] / dxy, r * d[1] / dxy, jnp.sign(d[2]) * hz])
    # hull: argmax vertex
    dots = shape.verts @ d
    hull = shape.verts[jnp.argmax(dots)]

    local = lax.switch(shape.kind, [
        lambda: sph, lambda: box, lambda: cap, lambda: cyl, lambda: hull])
    return shape.pos + Q.qrotate(shape.rot, local)


def _mink_support(a: ConvexShape, b: ConvexShape, d: Array):
    """Support of the Minkowski difference A − B along d, plus the witness
    point on A (for contact-point recovery)."""
    pa = support(a, d)
    pb = support(b, -d)
    return pa - pb, pa


def mpr_contact(a: ConvexShape, b: ConvexShape, n_iters: int = 24,
                eps: float = 1e-10):
    """Penetration query via MPR with fixed refinement count.

    Returns (gap, normal (A→B, world), point): gap < 0 with valid
    normal/point when penetrating; for separated pairs gap is a positive
    LOWER BOUND estimate along the final portal normal (MPR is a boolean +
    penetration method; use analytic paths for exact positive distances).
    """
    # v0: interior ray origin (difference of centers)
    c_a = a.pos
    c_b = b.pos
    v0 = c_a - c_b
    v0 = jnp.where(jnp.sum(v0 * v0) < 1e-12,
                   jnp.array([1e-5, 0.0, 0.0]), v0)

    # initial portal: three supports around the origin ray
    d1 = -v0
    v1, w1 = _mink_support(a, b, d1)
    d2 = jnp.cross(v1, v0)
    d2 = jnp.where(jnp.sum(d2 * d2) < 1e-12,
                   jnp.array([0.0, 1e-5, 0.0]), d2)
    v2, w2 = _mink_support(a, b, d2)
    d3 = jnp.cross(v1 - v0, v2 - v0)
    # orient toward the origin side
    d3 = jnp.where(jnp.dot(d3, v0) > 0, -d3, d3)
    v3, w3 = _mink_support(a, b, d3)

    def refine(_, carry):
        v1, v2, v3, w1, w2, w3, n_prev = carry
        # portal normal (away from v0); once the portal collapses toward the
        # contact point the triangle degenerates — keep the previous normal
        n_raw = jnp.cross(v2 - v1, v3 - v1)
        nn = jnp.sqrt(jnp.sum(n_raw * n_raw))
        scale2 = jnp.sum((v2 - v1) ** 2) + jnp.sum((v3 - v1) ** 2) + eps
        degenerate = nn < 1e-5 * scale2
        n = jnp.where(degenerate, n_prev, n_raw / jnp.maximum(nn, eps))
        n = jnp.where(jnp.dot(n, v1 - v0) < 0, -n, n)
        v4, w4 = _mink_support(a, b, n)
        # converged portals must stop mutating — replacing a vertex with a
        # near-duplicate support degenerates the triangle and poisons the
        # final normal
        progress = jnp.dot(n, v4 - v1)
        scale = jnp.sqrt(jnp.sum(v1 * v1) + 1.0)
        done = progress < 1e-6 * scale
        # replace the portal vertex "facing away" from the new support plane
        # keep the triangle that still straddles the origin ray: standard MPR
        # choice via signs of scalar triple products with v0 and v4
        t1 = jnp.dot(jnp.cross(v4, v1), v0)
        t2 = jnp.dot(jnp.cross(v4, v2), v0)
        t3 = jnp.dot(jnp.cross(v4, v3), v0)
        # select which vertex to replace (branch-free double select)
        rep1 = (t1 >= 0) & (t2 < 0) & ~done
        rep2 = (t2 >= 0) & (t3 < 0) & ~done

        def pick(cond, new, old):
            return jnp.where(cond, new, old)

        nv1 = pick(rep1, v4, v1)
        nw1 = pick(rep1, w4, w1)
        nv2 = pick(~rep1 & rep2, v4, v2)
        nw2 = pick(~rep1 & rep2, w4, w2)
        nv3 = pick(~rep1 & ~rep2 & ~done, v4, v3)
        nw3 = pick(~rep1 & ~rep2 & ~done, w4, w3)
        return (nv1, nv2, nv3, nw1, nw2, nw3, n)

    n0 = v0 / jnp.sqrt(jnp.sum(v0 * v0) + eps)
    v1, v2, v3, w1, w2, w3, n = lax.fori_loop(
        0, n_iters, refine, (v1, v2, v3, w1, w2, w3, n0))

    # --- support-function polish of the normal ---------------------------
    # The portal depth n·v1 amplifies any tilt of n by the lateral extent of
    # the support point (a 1e-4 rad error on a 10 m face gives metre-scale
    # depth error).  The true signed translation distance is the global
    #     min over unit n of  h(n) = n · s_{A−B}(n)
    # (= +penetration when overlapping, −separation when apart), and h is
    # exact at the minimiser no matter which face corner argmax returns.  A
    # few best-of-ladder subgradient steps seeded at the portal normal make
    # the depth robust for flat/large shapes (role of the reference's PRIMS
    # analytic fallback around ChNarrowphaseMPR).
    # compass (pattern) search: ± the two tangent directions at the current
    # normal, step shrinks on failure — derivative-free, so the kinks of h
    # (support-corner flips) that defeat subgradient steps are harmless
    def polish(_, carry):
        n, h, alpha = carry
        ax = jnp.where(jnp.abs(n[0]) < 0.9,
                       jnp.asarray([1.0, 0.0, 0.0]),
                       jnp.asarray([0.0, 1.0, 0.0]))
        t1 = jnp.cross(n, ax)
        t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1) + eps)
        t2 = jnp.cross(n, t1)
        dirs = jnp.stack([t1, -t1, t2, -t2])

        def cand(d):
            nc = n + alpha * d
            nc = nc / jnp.sqrt(jnp.sum(nc * nc) + eps)
            sc, _ = _mink_support(a, b, nc)
            return jnp.dot(nc, sc), nc

        hs, ncs = jax.vmap(cand)(dirs)
        k = jnp.argmin(hs)
        better = hs[k] < h
        return (jnp.where(better, ncs[k], n),
                jnp.minimum(h, hs[k]),
                jnp.where(better, alpha, 0.5 * alpha))

    # seed the running minimum with a TRUE support evaluation at the portal
    # normal — n·v1 is portal-depth, which is corrupted for flat shapes and
    # must not pollute the descent
    s_seed, _ = _mink_support(a, b, n)
    n, depth, _ = lax.fori_loop(
        0, 28, polish, (n, jnp.dot(n, s_seed), jnp.asarray(0.4)))
    gap = -depth
    # witness from the polished normal: the deepest point of each shape along
    # the push-out direction.  Take it from the shape whose contact FEATURE
    # is pointlike (vertex / sphere cap / rim) rather than a face — detected
    # by the spread of its support point under small perturbations of the
    # direction (a face flips between far corners, a vertex stays put).  The
    # face-side support can land anywhere on the face (even its centre) and
    # would poison the torque arm.
    wa = support(a, n)
    wb = support(b, -n)
    axp = jnp.where(jnp.abs(n[0]) < 0.9, jnp.asarray([1.0, 0.0, 0.0]),
                    jnp.asarray([0.0, 1.0, 0.0]))
    p1 = jnp.cross(n, axp)
    p1 = p1 / jnp.sqrt(jnp.sum(p1 * p1) + eps)
    p2 = jnp.cross(n, p1)
    delta = 1e-2

    def spread(shape, d):
        pts = jnp.stack([support(shape, d + delta * p1),
                         support(shape, d - delta * p1),
                         support(shape, d + delta * p2),
                         support(shape, d - delta * p2)])
        return jnp.sum((pts - jnp.mean(pts, axis=0)) ** 2)

    half = 0.5 * jnp.maximum(depth, 0.0)
    point = jnp.where(spread(a, n) < spread(b, -n),
                      wa - half * n, wb + half * n)
    # the portal normal (away from v0 = c_A − c_B) already points A→B
    return gap, n, point


mpr_contact_batch = jax.vmap(
    functools.partial(mpr_contact), in_axes=(0, 0))


def _closest_on_triangle(p, v0, v1, v2, eps=1e-12):
    """Closest point on a triangle to ``p`` (branch-free barycentric clamp —
    same construction as narrowphase.sphere_triangle, batched last-dim 3)."""
    ab = v1 - v0
    ac = v2 - v0
    ap = p - v0
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = p - v1
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp_ = p - v2
    d5 = jnp.sum(ab * cp_, axis=-1)
    d6 = jnp.sum(ac * cp_, axis=-1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, eps)
    v = vb / denom
    w = vc / denom
    p_face = v0 + v[..., None] * ab + w[..., None] * ac
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, eps), 0.0, 1.0)
    p_ab = v0 + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, eps), 0.0, 1.0)
    p_ac = v0 + t_ac[..., None] * ac
    bc = v2 - v1
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), eps),
                    0.0, 1.0)
    p_bc = v1 + t_bc[..., None] * bc
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    out = p_face
    out = jnp.where(in_bc[..., None], p_bc, out)
    out = jnp.where(in_ac[..., None], p_ac, out)
    out = jnp.where(in_ab[..., None], p_ab, out)
    out = jnp.where(in_c[..., None], v2, out)
    out = jnp.where(in_b[..., None], v1, out)
    out = jnp.where(in_a[..., None], v0, out)
    face = ~(in_a | in_b | in_c | in_ab | in_ac | in_bc)
    return out, face


def convex_triangle(shape: ConvexShape, v0, v1, v2, eps=1e-9):
    """Convex shape vs one triangle: support-plane narrowphase.

    MPR is the wrong tool here — its portal depth is measured along the
    interior-point ray, which for an off-center triangle overestimates a
    2 cm penetration as 23 cm with a tilted normal (measured).  Instead:

    * face contact: deepest point of the shape against the triangle's
      plane via ONE support call in −n̂; exact gap and face normal — the
      dominant case on mesh terrain;
    * edge/vertex contact (deepest point projects outside the triangle):
      the sphere-like direction from the closest triangle point toward the
      shape's center, with the gap re-measured by a support call along it
      — exact for spheres/capsules, the standard single-point rounding for
      boxes on a ridge (a curb edge under a wheel).

    Returns (gap, n, p) with n the A→B contact normal (shape → triangle
    owner) like the other narrowphase primitives.  One point per triangle:
    face/line resting contacts on a MESH get their manifold from the
    neighboring triangles, which is how mesh terrain stabilizes.
    Reference role: ChCollisionAlgorithmsBullet.cpp convex-vs-trimesh.
    """
    nt = jnp.cross(v1 - v0, v2 - v0)
    nt = nt / jnp.sqrt(jnp.sum(nt * nt) + eps)
    side = jnp.sign(jnp.sum(nt * (shape.pos - v0)) + eps)
    nt = nt * side                       # plane normal toward the shape
    # tangent basis of the face for the perturbed manifold directions
    a = jnp.where(jnp.abs(nt[0]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    t1 = jnp.cross(nt, a)
    t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1) + eps)
    t2 = jnp.cross(nt, t1)

    gaps, norms, pts, valid = [], [], [], []
    EPSD = 0.05
    # 4-point perturbed-support face manifold: support in −n̂ tilted by
    # ±ε t1 ± ε t2 picks the face-contact EXTREME points (box: 4 corners,
    # cylinder lying flat: both rim ends; sphere: 4 coincident points,
    # harmless — the VI solve splits the impulse).  A single support point
    # makes line/face resting contacts seesaw (measured: a cylinder hops
    # off a 10° ramp).  Gaps are all measured along the face normal.
    deep0 = None
    for (e1, e2) in ((0.0, 0.0), (EPSD, EPSD), (EPSD, -EPSD),
                     (-EPSD, EPSD), (-EPSD, -EPSD)):
        d = -nt + e1 * t1 + e2 * t2
        d = d / jnp.sqrt(jnp.sum(d * d) + eps)
        deep = support(shape, d)
        if deep0 is None:
            deep0 = deep
            continue                     # the unperturbed point seeds the
        gap_f = jnp.sum(nt * (deep - v0))  # edge fallback below
        proj = deep - gap_f * nt
        cp, _ = _closest_on_triangle(proj, v0, v1, v2)
        on_face = jnp.sum((cp - proj) ** 2) < 1e-10
        gaps.append(gap_f)
        norms.append(-nt)
        pts.append(cp)
        valid.append(on_face)
    # edge/vertex fallback: sphere-like direction from the closest triangle
    # point to the shape center, gap re-measured by a support call along it
    # — exact for spheres/capsules, single-point rounding for a box on a
    # ridge (curb edge under a wheel)
    gap_f0 = jnp.sum(nt * (deep0 - v0))
    proj0 = deep0 - gap_f0 * nt
    cp0, _ = _closest_on_triangle(proj0, v0, v1, v2)
    on_face0 = jnp.sum((cp0 - proj0) ** 2) < 1e-10
    d_e = shape.pos - cp0
    n_e = d_e / jnp.sqrt(jnp.sum(d_e * d_e) + eps)
    deep_e = support(shape, -n_e)
    # the triangle is a subset of its plane, so the true gap can never be
    # MORE penetrating than the plane gap — clamping kills the phantom deep
    # gaps a tilted n_e can report for long shapes lying across an edge
    # (measured: a cylinder across the shared diagonal of two coplanar
    # triangles got gap −0.15 from a rim-end support, i.e. a 30 m/s
    # Baumgarte kick)
    gap_e = jnp.maximum(jnp.sum(n_e * (deep_e - cp0)), gap_f0)
    # the fallback only fires when NO face candidate was valid — a resting
    # shape whose unperturbed support tie-breaks past the triangle boundary
    # must not grow a skewed extra contact (measured: with friction it
    # ratchet-pins a cylinder that should roll down a 15° ramp); a true
    # ridge/curb contact has zero face candidates, so the fallback engages
    any_face = jnp.stack(valid).any() | on_face0
    gaps.append(jnp.where(on_face0, gap_f0, gap_e))
    norms.append(jnp.where(on_face0, -nt, -n_e))
    pts.append(cp0)
    valid.append(on_face0 | jnp.logical_not(any_face))
    return (jnp.stack(gaps), jnp.stack(norms), jnp.stack(pts),
            jnp.stack(valid))


#: manifold points emitted per (convex, triangle) pair
N_TRI_MANIFOLD = 5

convex_triangle_batch = jax.vmap(convex_triangle, in_axes=(0, 0, 0, 0))
