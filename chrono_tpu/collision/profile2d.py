"""2-D profile collision shapes: segments + arcs vs circles.

Counterparts of the reference's planar collision pair
(/root/reference/src/chrono/collision/ChCollisionShapeSegment2D.h,
ChCollisionShapeArc2D.h + the cbt 2D arc-segment algorithms in
ChCollisionAlgorithmsBullet.cpp), which the reference uses for resolved
gear/sprocket tooth profiles and pin-in-slot mechanisms.

A :class:`Profile2D` is a piecewise boundary (segments and arcs) fixed in
a body's local x–y plane; the counterpart shapes are CIRCLES (pins)
attached to other bodies in the same plane.  ``profile_circle_contacts``
returns an analytic ``Contacts`` buffer (one row per circle: the deepest
element contact) for ``collision.pipeline.nsc_step``'s
``extra_contacts_fn`` hook — the same mechanism the tracked-vehicle
sprocket engagement uses, generalized to arbitrary profiles.

Everything is batched and branch-free: per circle, distances to ALL
elements are computed and the minimum-|gap| element wins via argmin.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from chrono_tpu.core import quaternion as Q


class Profile2D(NamedTuple):
    body: int             # carrying body
    frame_rot: tuple      # body-local quaternion: profile plane = frame x-y
    frame_pos: tuple      # body-local origin of the profile plane
    seg_a: jnp.ndarray    # (S, 2) segment start (profile coords)
    seg_b: jnp.ndarray    # (S, 2) segment end
    arc_c: jnp.ndarray    # (A, 2) arc centers
    arc_r: jnp.ndarray    # (A,)
    arc_a0: jnp.ndarray   # (A,) start angle
    arc_a1: jnp.ndarray   # (A,) end angle (a1 > a0, CCW)
    arc_convex: jnp.ndarray  # (A,) +1: contact on the OUTSIDE of the arc
    #                          −1: concave (pocket) — contact on the inside


class ProfileCircles(NamedTuple):
    body: jnp.ndarray     # (C,) int32
    offset: jnp.ndarray   # (C, 2) circle center in the profile plane of
    #                       its own body frame (same frame convention)
    radius: jnp.ndarray   # (C,)
    mu: jnp.ndarray       # (C,)


def _seg_closest(p, a, b):
    """Closest points on segments: p (C,1,2) vs a,b (1,S,2) → (C,S,2)."""
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / (jnp.sum(ab * ab, axis=-1)
                                          + 1e-30)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t[..., None] * ab


def profile_circle_contacts(prof: Profile2D, circles: ProfileCircles,
                            state, mu: float = None):
    """Analytic Contacts (capacity = n_circles) of circles vs the profile.

    All quantities resolved in the WORLD frame for the contact row;
    normals point from the profile body (A) toward the circle body (B).
    """
    from chrono_tpu.collision.pipeline import Contacts

    fr = jnp.asarray(prof.frame_rot)
    fp = jnp.asarray(prof.frame_pos)
    qb = state.q[prof.body]
    xb = state.x[prof.body]
    q_pf = Q.qmul(qb, fr)                  # profile frame → world
    o_pf = xb + Q.qrotate(qb, fp)

    # circle centers → world → profile coordinates
    cb = circles.body
    qc = Q.qmul(state.q[cb], jnp.broadcast_to(fr, (cb.shape[0], 4)))
    pc_w = state.x[cb] + Q.qrotate(
        state.q[cb],
        Q.qrotate(jnp.broadcast_to(fr, (cb.shape[0], 4)),
                  jnp.concatenate([circles.offset,
                                   jnp.zeros((cb.shape[0], 1))], axis=1))
        + jnp.broadcast_to(fp, (cb.shape[0], 3)))
    rel = Q.qrotate_inv(jnp.broadcast_to(q_pf, (cb.shape[0], 4)),
                        pc_w - o_pf)
    p2 = rel[:, 0:2]                        # (C, 2) profile-plane coords

    C = p2.shape[0]
    cands_pt = []
    cands_gap = []
    cands_n = []
    if prof.seg_a.shape[0] > 0:
        q = _seg_closest(p2[:, None, :], prof.seg_a[None], prof.seg_b[None])
        d = p2[:, None, :] - q
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-30)
        n2 = d / dist[..., None]
        cands_pt.append(q)
        cands_gap.append(dist - circles.radius[:, None])
        cands_n.append(n2)
    if prof.arc_r.shape[0] > 0:
        d = p2[:, None, :] - prof.arc_c[None]           # (C, A, 2)
        dist_c = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-30)
        ang = jnp.arctan2(d[..., 1], d[..., 0])
        # fold into [a0, a0+2π) to honor the angular extent
        two_pi = 2.0 * np.pi
        rel_a = jnp.mod(ang - prof.arc_a0[None], two_pi)
        span = jnp.mod(prof.arc_a1 - prof.arc_a0, two_pi)
        span = jnp.where(span <= 1e-9, two_pi, span)
        in_arc = rel_a <= span[None]
        a_cl = jnp.clip(rel_a, 0.0, span[None]) + prof.arc_a0[None]
        q = prof.arc_c[None] + prof.arc_r[None, :, None] * jnp.stack(
            [jnp.cos(a_cl), jnp.sin(a_cl)], axis=-1)
        dq = p2[:, None, :] - q
        dist_q = jnp.sqrt(jnp.sum(dq * dq, axis=-1) + 1e-30)
        cvx = prof.arc_convex[None]
        # convex arc: circle outside, gap = |p−c|−R−r; concave pocket:
        # circle inside, gap = R−|p−c|−r, normal toward the center
        gap_in = jnp.where(
            cvx > 0,
            dist_c - prof.arc_r[None] - circles.radius[:, None],
            prof.arc_r[None] - dist_c - circles.radius[:, None])
        n_in = jnp.where(cvx[..., None] > 0,
                         d / dist_c[..., None],
                         -d / dist_c[..., None])
        # outside the angular extent, fall back to endpoint distance
        gap_end = dist_q - circles.radius[:, None]
        n_end = dq / dist_q[..., None]
        gap = jnp.where(in_arc, gap_in, gap_end)
        n2 = jnp.where(in_arc[..., None], n_in, n_end)
        cands_pt.append(q)
        cands_gap.append(gap)
        cands_n.append(n2)

    gaps = jnp.concatenate(cands_gap, axis=1)           # (C, E)
    pts = jnp.concatenate(cands_pt, axis=1)
    ns = jnp.concatenate(cands_n, axis=1)
    best = jnp.argmin(gaps, axis=1)
    ar = jnp.arange(C)
    gap = gaps[ar, best]
    pt2 = pts[ar, best]
    n2 = ns[ar, best]

    # back to world
    pt_w = o_pf + Q.qrotate(
        jnp.broadcast_to(q_pf, (C, 4)),
        jnp.concatenate([pt2, jnp.zeros((C, 1))], axis=1))
    n_w = Q.qrotate(jnp.broadcast_to(q_pf, (C, 4)),
                    jnp.concatenate([n2, jnp.zeros((C, 1))], axis=1))

    active = gap < 0.0
    mu_arr = circles.mu if mu is None else jnp.full((C,), mu)
    return Contacts(
        body_a=jnp.full((C,), prof.body, jnp.int32),
        body_b=cb,
        point=pt_w,
        normal=n_w,          # A→B: pushes the circle away from the profile
        gap=jnp.where(active, gap, 1.0),
        mu=mu_arr,
        r_eff=circles.radius,
        active=active,
        count=active.sum().astype(jnp.int32),
    )
