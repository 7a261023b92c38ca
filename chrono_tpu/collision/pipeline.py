"""Collision model + NSC contact pipeline for the multibody system.

Replaces the reference's ``ChCollisionSystem`` + ``ChContactContainerNSC`` flow
(/root/reference/src/chrono/physics/ChSystem.cpp:1272 ComputeCollisions →
ChContactContainerNSC 3-row contacts, physics/ChContactNSC.h:88): collision
shapes are batched arrays attached to bodies; detection emits a fixed-capacity
masked ``Contacts`` buffer; contacts lower to cone-constrained triples appended
to the bilateral rows and solved in the same VI (APGD/BB) — the whole
detect→solve→integrate step is one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.body import BodyState
from chrono_tpu.physics.constraints import ConstraintRows
from chrono_tpu.collision import narrowphase as nphase
from chrono_tpu.collision.cell_list import (
    GridSpec, cell_ijk, build_feature_table, neighbor_feature_rows,
    topk_select,
)
from chrono_tpu.collision.mpr import (
    ConvexShape, mpr_contact_batch, SPHERE as _MPR_SPHERE,
)


@pytree_dataclass
class SphereShapes:
    """S collision spheres attached to bodies (body-local offsets)."""

    body: Array     # (S,) int32
    offset: Array   # (S, 3) local
    radius: Array   # (S,)
    mu: Array       # (S,) friction coefficient of the shape's material

    @property
    def n(self) -> int:
        return self.body.shape[0]


@pytree_dataclass
class BoxShapes:
    """B collision boxes attached to bodies (walls, bins, drums...)."""

    body: Array     # (B,) int32
    pos: Array      # (B, 3) local frame origin
    rot: Array      # (B, 4) local frame rotation
    half: Array     # (B, 3) half extents
    mu: Array       # (B,)

    @property
    def n(self) -> int:
        return self.body.shape[0]


@pytree_dataclass
class ConvexShapes:
    """K general convex shapes attached to bodies (MPR narrowphase).

    Role of the reference's ChCollisionShape menu beyond sphere/box — capsule,
    cylinder, convex hull — lowered through ChNarrowphaseMPR
    (/root/reference/src/chrono/collision/multicore/ChNarrowphaseMPR.cpp:584).
    ``kind``/``data``/``verts`` follow chrono_tpu.collision.mpr.ConvexShape.
    """

    body: Array     # (K,) int32
    kind: Array     # (K,) int32 mpr type code
    pos: Array      # (K, 3) local offset
    rot: Array      # (K, 4) local rotation
    data: Array     # (K, 3) sized parameters
    verts: Array    # (K, V, 3) local hull vertices (zeros for non-hulls)
    mu: Array       # (K,)
    family: Array = None  # (K,) int32 — shapes sharing a family > 0 never
    #                       collide with each other (reference collision
    #                       families, ChCollisionModel::SetFamily*)

    @property
    def n(self) -> int:
        return self.body.shape[0]


@pytree_dataclass
class MeshShapes:
    """T collision triangles attached to bodies (triangle soup).

    The role of the reference's ChCollisionShapeTriangleMesh lowered through
    Bullet's trimesh algorithms (/root/reference/src/chrono/collision/bullet/
    ChCollisionAlgorithmsBullet.cpp) — mesh obstacles (curbs, ramps, rocks)
    under MBS bodies and FEA contact surfaces (ChContactSurfaceMesh.h).
    Triangles are body-local (re-posed each step, so moving mesh bodies
    work).  TPU-shaped narrowphase, no BVH: sphere–triangle closed form
    (dense S×T) and convex–triangle via MPR with the triangle as a 3-vertex
    hull (dense K×T) — batched pair lattices instead of Bullet's per-pair
    dispatch.  For terrain-scale meshes under granular flows use the binned
    path (chrono_tpu.dem.mesh / vehicle.granular_terrain) instead.
    """

    body: Array     # (T,) int32
    v0: Array       # (T, 3) local vertices
    v1: Array       # (T, 3)
    v2: Array       # (T, 3)
    mu: Array       # (T,)

    @property
    def n(self) -> int:
        return self.body.shape[0]

    @staticmethod
    def from_mesh(body: int, verts, faces, mu: float = 0.5):
        """Build from a (V,3) vertex array + (T,3) face index array."""
        import numpy as _np
        verts = _np.asarray(verts, _np.float32)
        faces = _np.asarray(faces, _np.int32)
        T = faces.shape[0]
        return MeshShapes(
            body=jnp.full((T,), body, jnp.int32),
            v0=jnp.asarray(verts[faces[:, 0]]),
            v1=jnp.asarray(verts[faces[:, 1]]),
            v2=jnp.asarray(verts[faces[:, 2]]),
            mu=jnp.full((T,), mu, jnp.float32))


@pytree_dataclass
class CollisionModel:
    """All collision geometry of a scene + static pipeline capacities."""

    spheres: SphereShapes
    boxes: Optional[BoxShapes]
    convex: Optional[ConvexShapes] = None
    meshes: Optional[MeshShapes] = None
    grid: GridSpec = static_field(default=GridSpec())
    max_per_cell: int = static_field(default=8)
    max_contacts: int = static_field(default=1024)
    envelope: float = static_field(default=0.0)  # detection margin
    # scene-level rolling/spinning friction coefficients (length units:
    # torque limit = μ·γ_n, the reference's ChContactNSCrolling contract).
    # Non-zero → 3 extra rolling rows per contact in the DVI solve.
    mu_roll: float = static_field(default=0.0)
    mu_spin: float = static_field(default=0.0)
    # mesh narrowphase candidate pruning: 0 = dense S×T / K×T pair
    # lattices (fine for a handful of triangles); >0 = per sphere/convex,
    # exact-test only the mesh_candidates nearest triangles by
    # bounding-sphere score (top_k) — the quadratic pack of (S, T)
    # 11-float rows is what hurts on real mesh obstacles, the role the
    # reference fills with Bullet's trimesh BVH
    mesh_candidates: int = static_field(default=0)

    @property
    def use_rolling(self) -> bool:
        return self.mu_roll > 0.0 or self.mu_spin > 0.0


class Contacts(NamedTuple):
    """Fixed-capacity contact manifold (masked)."""

    body_a: Array   # (C,) int32
    body_b: Array   # (C,) int32
    point: Array    # (C, 3) world
    normal: Array   # (C, 3) world, A→B
    gap: Array      # (C,) signed (<0 penetrating)
    mu: Array       # (C,) combined friction
    r_eff: Array    # (C,) effective curvature radius (SMC penalty models)
    active: Array   # (C,) bool
    count: Array    # () int32 — true number found (may exceed capacity)


#: effective contact-curvature radius used when shapes give none (the
#: reference's ChCollisionInfo default effective radius for non-smooth pairs)
DEFAULT_EFF_RADIUS = 0.1


def _sphere_world(shapes: SphereShapes, state: BodyState):
    b = shapes.body
    c = state.x[b] + Q.qrotate(state.q[b], shapes.offset)
    return c


def detect_contacts(coll: CollisionModel, state: BodyState) -> Contacts:
    """Broadphase (uniform grid) + narrowphase → masked contact buffer.

    Sphere–sphere via a packed-feature cell-slot table; sphere–box dense (few
    boxes). Friction is combined with the minimum rule (conservative; the
    reference's composition strategy is configurable — ChContactMaterial
    composition).

    TPU layout notes (measured on v5e, see cell_list.build_feature_table):
    every per-candidate quantity is fetched through ONE wide row gather of
    channel-packed table rows — per-channel 1-D gathers and ``jnp.nonzero``
    lower to the scalar core and cost milliseconds each at ~1e6 candidates.
    Per-segment results are packed as 10-channel rows
    ``[gap, n(3), p(3), mu, body_a, body_b]`` and compacted by one stable
    argsort (:func:`~chrono_tpu.collision.cell_list.topk_select`).
    """
    sp = coll.spheres
    S = sp.n
    centers = _sphere_world(sp, state)                     # (S,3)

    segs_pack, segs_ok = [], []

    def pack(ok, a, b, gap, n, p, mu, r_eff):
        rows = jnp.stack([
            gap, n[..., 0], n[..., 1], n[..., 2],
            p[..., 0], p[..., 1], p[..., 2], mu,
            jnp.broadcast_to(r_eff, gap.shape),
            a.astype(jnp.float32), b.astype(jnp.float32)], axis=-1)
        segs_pack.append(rows.reshape(-1, 11))
        segs_ok.append(ok.reshape(-1))

    if S > 0:
        # channels: [x, y, z, radius, mu, body, index, valid]
        feat = jnp.stack([
            centers[:, 0], centers[:, 1], centers[:, 2],
            sp.radius, sp.mu, sp.body.astype(jnp.float32),
            jnp.arange(S, dtype=jnp.float32), jnp.ones((S,), jnp.float32),
        ], axis=1)
        table, _ovf = build_feature_table(coll.grid, centers, feat,
                                          coll.max_per_cell)
        qijk = cell_ijk(coll.grid, centers)
        nf, in_range = neighbor_feature_rows(coll.grid, table, qijk,
                                             coll.max_per_cell, 8)
        # neighbor channels (S, 27, K); self quantities broadcast (S, 1, 1)
        cb = jnp.stack([nf[..., 0], nf[..., 1], nf[..., 2]], axis=-1)
        ca = centers[:, None, None, :]
        gap, n, p = nphase.sphere_sphere(
            ca, sp.radius[:, None, None], cb, nf[..., 3])
        i_f = jnp.arange(S, dtype=jnp.float32)[:, None, None]
        pair_ok = ((nf[..., 7] > 0.0) & in_range[..., None]
                   & (nf[..., 6] > i_f)                    # dedupe i<j
                   & (nf[..., 5] != sp.body.astype(jnp.float32)[
                       :, None, None])                     # no self-body
                   & (gap < coll.envelope))
        ra_ = sp.radius[:, None, None]
        rb_ = nf[..., 3]
        pack(pair_ok,
             jnp.broadcast_to(sp.body.astype(jnp.float32)[:, None, None],
                              gap.shape),
             nf[..., 5], gap, n, p,
             jnp.minimum(sp.mu[:, None, None], nf[..., 4]),
             ra_ * rb_ / jnp.maximum(ra_ + rb_, 1e-30))

    # sphere-box dense pairs
    if S > 0 and coll.boxes is not None and coll.boxes.n > 0:
        bx = coll.boxes
        B = bx.n
        bpos = state.x[bx.body] + Q.qrotate(state.q[bx.body], bx.pos)
        brot = Q.qmul(state.q[bx.body], bx.rot)
        gap_b, n_b, p_b = nphase.sphere_box(
            centers[:, None, :], sp.radius[:, None],
            bpos[None, :, :], brot[None, :, :], bx.half[None, :, :],
        )                                                   # (S, B)
        sb_ok = (gap_b < coll.envelope) & (
            sp.body[:, None] != bx.body[None, :])
        pack(sb_ok,
             jnp.broadcast_to(sp.body[:, None], (S, B)),
             jnp.broadcast_to(bx.body[None, :], (S, B)),
             gap_b, n_b, p_b,
             jnp.minimum(sp.mu[:, None], bx.mu[None, :]),
             jnp.broadcast_to(sp.radius[:, None], (S, B)))

    # general convex shapes via MPR: convex-convex (dense i<j) + convex-sphere
    if coll.convex is not None and coll.convex.n > 0:
        import numpy as _np
        cv = coll.convex
        K = cv.n
        cpos = state.x[cv.body] + Q.qrotate(state.q[cv.body], cv.pos)
        crot = Q.qmul(state.q[cv.body], cv.rot)
        world = ConvexShape(kind=cv.kind, pos=cpos, rot=crot,
                            data=cv.data, verts=cv.verts)
        if K > 1:
            iu, ju = _np.triu_indices(K, k=1)
            iu = jnp.asarray(iu); ju = jnp.asarray(ju)
            A = jax.tree_util.tree_map(lambda x: x[iu], world)
            Bsh = jax.tree_util.tree_map(lambda x: x[ju], world)
            gap_cc, n_cc, p_cc = mpr_contact_batch(A, Bsh)
            cc_ok = (gap_cc < jnp.minimum(coll.envelope, 0.0)) & (
                cv.body[iu] != cv.body[ju])
            if cv.family is not None:
                fam = cv.family
                cc_ok &= ~((fam[iu] == fam[ju]) & (fam[iu] > 0))
            pack(cc_ok, cv.body[iu], cv.body[ju], gap_cc, n_cc, p_cc,
                 jnp.minimum(cv.mu[iu], cv.mu[ju]),
                 jnp.full_like(gap_cc, DEFAULT_EFF_RADIUS))
        if S > 0:
            V = cv.verts.shape[1]
            ii = jnp.repeat(jnp.arange(S), K)
            jj = jnp.tile(jnp.arange(K), S)
            sph = ConvexShape(
                kind=jnp.full((S * K,), _MPR_SPHERE, jnp.int32),
                pos=centers[ii],
                rot=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (S * K, 4)),
                data=jnp.stack([sp.radius[ii], jnp.zeros(S * K),
                                jnp.zeros(S * K)], -1),
                verts=jnp.zeros((S * K, V, 3)))
            cvx = jax.tree_util.tree_map(lambda x: x[jj], world)
            gap_sc, n_sc, p_sc = mpr_contact_batch(sph, cvx)
            sc_ok = (gap_sc < jnp.minimum(coll.envelope, 0.0)) & (
                sp.body[ii] != cv.body[jj])
            pack(sc_ok, sp.body[ii], cv.body[jj], gap_sc, n_sc, p_sc,
                 jnp.minimum(sp.mu[ii], cv.mu[jj]), sp.radius[ii])

    # triangle-mesh shapes: sphere–triangle closed form + convex–triangle
    # via MPR (triangle = 3-vertex hull)
    if coll.meshes is not None and coll.meshes.n > 0:
        ms = coll.meshes
        T = ms.n
        mb = ms.body
        w0 = state.x[mb] + Q.qrotate(state.q[mb], ms.v0)   # (T,3) world
        w1 = state.x[mb] + Q.qrotate(state.q[mb], ms.v1)
        w2 = state.x[mb] + Q.qrotate(state.q[mb], ms.v2)
        cen_t = (w0 + w1 + w2) / 3.0
        rad_t = jnp.sqrt(jnp.maximum(jnp.maximum(
            jnp.sum((w0 - cen_t) ** 2, axis=1),
            jnp.sum((w1 - cen_t) ** 2, axis=1)),
            jnp.sum((w2 - cen_t) ** 2, axis=1)))
        Kc = coll.mesh_candidates
        if S > 0 and Kc and Kc < T:
            # bounding-sphere scored candidates: exact narrowphase only on
            # the Kc nearest triangles per sphere
            d2 = jnp.sum((centers[:, None, :] - cen_t[None]) ** 2, axis=2)
            score = d2 - (rad_t[None] + sp.radius[:, None]
                          + coll.envelope) ** 2
            _, tidx = jax.lax.top_k(-score, Kc)            # (S, Kc)
            gap_t, n_t, p_t = nphase.sphere_triangle(
                centers[:, None, :], sp.radius[:, None],
                w0[tidx], w1[tidx], w2[tidx])              # (S, Kc)
            st_ok = (gap_t < coll.envelope) & (
                sp.body[:, None] != mb[tidx])
            pack(st_ok,
                 jnp.broadcast_to(sp.body[:, None], (S, Kc)),
                 mb[tidx], gap_t, n_t, p_t,
                 jnp.minimum(sp.mu[:, None], ms.mu[tidx]),
                 jnp.broadcast_to(sp.radius[:, None], (S, Kc)))
        elif S > 0:
            gap_t, n_t, p_t = nphase.sphere_triangle(
                centers[:, None, :], sp.radius[:, None],
                w0[None], w1[None], w2[None])              # (S, T)
            st_ok = (gap_t < coll.envelope) & (
                sp.body[:, None] != mb[None, :])
            pack(st_ok,
                 jnp.broadcast_to(sp.body[:, None], (S, T)),
                 jnp.broadcast_to(mb[None, :], (S, T)),
                 gap_t, n_t, p_t,
                 jnp.minimum(sp.mu[:, None], ms.mu[None, :]),
                 jnp.broadcast_to(sp.radius[:, None], (S, T)))
        if coll.convex is not None and coll.convex.n > 0:
            # support-plane narrowphase (mpr.convex_triangle) — NOT MPR:
            # the portal depth of MPR measured along its interior-point ray
            # overestimates shallow penetrations against off-center
            # triangles (2 cm reported as 23 cm with a tilted normal)
            from chrono_tpu.collision.mpr import convex_triangle_batch
            cv = coll.convex
            K = cv.n
            cpos = state.x[cv.body] + Q.qrotate(state.q[cv.body], cv.pos)
            crot = Q.qmul(state.q[cv.body], cv.rot)
            world = ConvexShape(kind=cv.kind, pos=cpos, rot=crot,
                                data=cv.data, verts=cv.verts)
            if Kc and Kc < T:
                # same candidate pruning for convex-vs-triangle: shape
                # bounding radius from its data/verts (coarse upper bound)
                r_cv = jnp.maximum(
                    jnp.sqrt(jnp.sum(cv.data ** 2, axis=1)),
                    jnp.sqrt(jnp.max(jnp.sum(cv.verts ** 2, axis=2),
                                     axis=1)))
                d2c = jnp.sum((cpos[:, None, :] - cen_t[None]) ** 2,
                              axis=2)
                scc = d2c - (rad_t[None] + r_cv[:, None]
                             + coll.envelope) ** 2
                _, tjj = jax.lax.top_k(-scc, Kc)           # (K, Kc)
                ii = jnp.repeat(jnp.arange(K), Kc)
                jj = tjj.reshape(-1)
            else:
                ii = jnp.repeat(jnp.arange(K), T)
                jj = jnp.tile(jnp.arange(T), K)
            cvx = jax.tree_util.tree_map(lambda x: x[ii], world)
            # (K·T, 5) manifold points per pair (perturbed-support face
            # manifold + edge fallback)
            gap_ct, n_ct, p_ct, ok_m = convex_triangle_batch(
                cvx, w0[jj], w1[jj], w2[jj])
            ct_ok = (ok_m & (gap_ct < coll.envelope)
                     & (cv.body[ii] != mb[jj])[:, None])
            pack(ct_ok,
                 jnp.broadcast_to(cv.body[ii][:, None], gap_ct.shape),
                 jnp.broadcast_to(mb[jj][:, None], gap_ct.shape),
                 gap_ct, n_ct, p_ct,
                 jnp.broadcast_to(
                     jnp.minimum(cv.mu[ii], ms.mu[jj])[:, None],
                     gap_ct.shape),
                 jnp.full_like(gap_ct, DEFAULT_EFF_RADIUS))

    if not segs_ok:
        # geometry-free scene (contacts supplied entirely through
        # extra_contacts_fn, e.g. 2-D profile or gear engagement rows).
        # The dummy row needs a UNIT normal — a zero normal NaNs the
        # tangent-basis construction even on inactive rows.
        dummy = jnp.zeros((1, 11), state.x.dtype)
        dummy = dummy.at[0, 0].set(1.0)        # gap = +1 (separated)
        dummy = dummy.at[0, 3].set(1.0)        # normal = +z
        segs_ok = [jnp.zeros((1,), bool)]
        segs_pack = [dummy]
    all_ok = jnp.concatenate(segs_ok)
    all_rows = jnp.concatenate(segs_pack, axis=0)          # (n_tot, 11)
    sel, active, count = topk_select(all_ok, coll.max_contacts)
    got = all_rows[sel]                                    # one row gather

    return Contacts(
        body_a=got[:, 9].astype(jnp.int32),
        body_b=got[:, 10].astype(jnp.int32),
        point=got[:, 4:7], normal=got[:, 1:4], gap=got[:, 0],
        mu=got[:, 7], r_eff=got[:, 8], active=active, count=count,
    )


def _tangent_basis(n: Array):
    """Robust orthonormal tangent pair for each normal (branch-free)."""
    # pick the axis least aligned with n
    a = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0], n.dtype),
                  jnp.asarray([0.0, 1.0, 0.0], n.dtype))
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return t1, t2


def contact_rows(contacts: Contacts, state: BodyState, h,
                 stab_factor: float = 0.2,
                 max_recovery_speed: float = 1e30) -> ConstraintRows:
    """Lower contacts to (normal, t1, t2) cone triples.

    Row order: contact-major ``[n0,u0,v0, n1,u1,v1, ...]`` — the projector in
    chrono_tpu.solver.projection assumes this layout.  rhs of the normal row is
    the clamped penetration-recovery speed (the reference clamps C/h by
    ``max_penetration_recovery_speed``, ChSystem.cpp:1626).
    """
    a, b = contacts.body_a, contacts.body_b
    Cn = contacts.normal
    t1, t2 = _tangent_basis(Cn)
    ra = contacts.point - state.x[a]
    rb = contacts.point - state.x[b]

    def rows_for(d):
        # gap rate along d: d·(v_b + ω_b×r_b − v_a − ω_a×r_a)
        Ja_v = -d
        Jb_v = d
        Ja_w = -Q.qrotate_inv(state.q[a], jnp.cross(ra, d))
        Jb_w = Q.qrotate_inv(state.q[b], jnp.cross(rb, d))
        return Ja_v, Ja_w, Jb_v, Jb_w

    n_rows = rows_for(Cn)
    t1_rows = rows_for(t1)
    t2_rows = rows_for(t2)

    pen = jnp.minimum(contacts.gap, 0.0)
    rhs_n = jnp.minimum(-(stab_factor / h) * pen, max_recovery_speed)
    zero = jnp.zeros_like(rhs_n)

    def interleave(xs):
        # (C,·) triples → (3C,·) contact-major
        return jnp.stack(xs, axis=1).reshape(
            (-1,) + xs[0].shape[1:])

    act = contacts.active
    return ConstraintRows.two_body(
        body_a=interleave([a, a, a]),
        body_b=interleave([b, b, b]),
        Ja_v=interleave([n_rows[0], t1_rows[0], t2_rows[0]]),
        Ja_w=interleave([n_rows[1], t1_rows[1], t2_rows[1]]),
        Jb_v=interleave([n_rows[2], t1_rows[2], t2_rows[2]]),
        Jb_w=interleave([n_rows[3], t1_rows[3], t2_rows[3]]),
        rhs=interleave([rhs_n, zero, zero]),
        active=interleave([act, act, act]),
    )


def rolling_rows(contacts: Contacts, state: BodyState) -> ConstraintRows:
    """Rolling/spinning reaction rows — 3 per contact, contact-major
    ``[spin(n), roll(t1), roll(t2)]``, appended AFTER the sliding triples.

    The reference's ChContactNSCrolling adds 3 torque multipliers per
    contact (/root/reference/src/chrono/physics/ChContactNSCrolling.h:26)
    whose Jacobians act on relative angular velocity about the contact
    frame; the cone projection lives in solver.projection.make_projector.
    """
    a, b = contacts.body_a, contacts.body_b
    Cn = contacts.normal
    t1, t2 = _tangent_basis(Cn)

    def wrows(d):
        return (-Q.qrotate_inv(state.q[a], d), Q.qrotate_inv(state.q[b], d))

    n_r = wrows(Cn)
    u_r = wrows(t1)
    v_r = wrows(t2)
    zero3 = jnp.zeros_like(Cn)
    zrhs = jnp.zeros_like(contacts.gap)

    def interleave(xs):
        return jnp.stack(xs, axis=1).reshape((-1,) + xs[0].shape[1:])

    act = contacts.active
    return ConstraintRows.two_body(
        body_a=interleave([a, a, a]),
        body_b=interleave([b, b, b]),
        Ja_v=interleave([zero3, zero3, zero3]),
        Ja_w=interleave([n_r[0], u_r[0], v_r[0]]),
        Jb_v=interleave([zero3, zero3, zero3]),
        Jb_w=interleave([n_r[1], u_r[1], v_r[1]]),
        rhs=interleave([zrhs, zrhs, zrhs]),
        active=interleave([act, act, act]),
    )


def concat_contacts(a: Contacts, b: Contacts) -> Contacts:
    """Concatenate two fixed-capacity contact buffers."""
    return Contacts(*[jnp.concatenate([x, y]) for x, y in
                      zip(a[:-1], b[:-1])],
                    count=a.count + b.count)


def nsc_step(model, coll: CollisionModel, state: BodyState, t, h,
             settings=None, gamma_warm=None, extra_contacts_fn=None):
    """One NSC (DVI) step with contacts: detect → lower → mixed VI solve.

    Equivalent of ``ChSystem::AdvanceDynamics`` with collision
    (ChSystem.cpp:1581).  Returns (new_state, contacts, StepInfo).

    ``extra_contacts_fn(state) -> Contacts``: optional analytic contact
    generator appended to the detected set (e.g. sprocket-tooth pin
    engagement, vehicle.track_shoes.sprocket_gear_contacts).  NOTE: its
    capacity adds to ``coll.max_contacts`` in the cone row count, so the
    caller's solver settings see the combined buffer.
    """
    from chrono_tpu.physics.system import (
        SolverSettings, step_euler_implicit_linearized,
    )

    if settings is None:
        settings = SolverSettings(solver="apgd", stab_factor=0.2)
    contacts = detect_contacts(coll, state)
    if extra_contacts_fn is not None:
        contacts = concat_contacts(contacts, extra_contacts_fn(state))
    n_c = contacts.gap.shape[0]          # detected + analytic capacity
    rows = contact_rows(contacts, state, h, settings.stab_factor,
                        settings.max_recovery_speed)
    n_rolling = 0
    if coll.use_rolling:
        # 3 rolling reaction rows per contact, appended AFTER the sliding
        # triples (reference: ChContactNSCrolling.h:26)
        from chrono_tpu.physics.constraints import concat_rows
        rows = concat_rows([rows, rolling_rows(contacts, state)])
        n_rolling = n_c
    new_state, info = step_euler_implicit_linearized(
        model, state, t, h, settings,
        extra_rows=rows, n_contacts=n_c,
        contact_mu=contacts.mu, gamma_warm=gamma_warm,
        n_rolling=n_rolling, mu_roll=coll.mu_roll, mu_spin=coll.mu_spin,
    )
    return new_state, contacts, info
