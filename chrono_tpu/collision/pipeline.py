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
    GridSpec, build_cell_list, cell_ijk, neighbor_candidates,
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
class CollisionModel:
    """All collision geometry of a scene + static pipeline capacities."""

    spheres: SphereShapes
    boxes: Optional[BoxShapes]
    convex: Optional[ConvexShapes] = None
    grid: GridSpec = static_field(default=GridSpec())
    max_per_cell: int = static_field(default=8)
    max_contacts: int = static_field(default=1024)
    envelope: float = static_field(default=0.0)  # detection margin


class Contacts(NamedTuple):
    """Fixed-capacity contact manifold (masked)."""

    body_a: Array   # (C,) int32
    body_b: Array   # (C,) int32
    point: Array    # (C, 3) world
    normal: Array   # (C, 3) world, A→B
    gap: Array      # (C,) signed (<0 penetrating)
    mu: Array       # (C,) combined friction
    active: Array   # (C,) bool
    count: Array    # () int32 — true number found (may exceed capacity)


def _sphere_world(shapes: SphereShapes, state: BodyState):
    b = shapes.body
    c = state.x[b] + Q.qrotate(state.q[b], shapes.offset)
    return c


def detect_contacts(coll: CollisionModel, state: BodyState) -> Contacts:
    """Broadphase (uniform grid) + narrowphase → masked contact buffer.

    Sphere–sphere via the cell list; sphere–box dense (few boxes). Friction is
    combined with the minimum rule (conservative; the reference's composition
    strategy is configurable — ChContactMaterial composition).
    """
    sp = coll.spheres
    S = sp.n
    centers = _sphere_world(sp, state)                     # (S,3)

    # per-segment flat buffers [ok, body_a, body_b, gap, normal, point, mu];
    # all segments concatenate, then ONE fixed-capacity nonzero select
    segs = []
    if S > 0:
        cl = build_cell_list(coll.grid, centers)
        qijk = cell_ijk(coll.grid, centers)
        cand, valid = neighbor_candidates(coll.grid, cl, qijk,
                                          coll.max_per_cell)
        C = cand.shape[1]

        # sphere-sphere candidate filtering
        i_idx = jnp.broadcast_to(jnp.arange(S)[:, None], (S, C))
        j_idx = cand
        pair_ok = valid & (j_idx > i_idx)                  # dedupe i<j
        # no self-body contacts (e.g. multi-sphere rigid clusters)
        pair_ok &= sp.body[i_idx] != sp.body[jnp.maximum(j_idx, 0)]
        gap, n, p = nphase.sphere_sphere(
            centers[i_idx], sp.radius[i_idx],
            centers[jnp.maximum(j_idx, 0)],
            sp.radius[jnp.maximum(j_idx, 0)],
        )
        j_safe = jnp.maximum(j_idx, 0)
        segs.append(dict(
            ok=(pair_ok & (gap < coll.envelope)).reshape(-1),
            a=sp.body[i_idx].reshape(-1), b=sp.body[j_safe].reshape(-1),
            gap=gap.reshape(-1), n=n.reshape(-1, 3), p=p.reshape(-1, 3),
            mu=jnp.minimum(sp.mu[i_idx], sp.mu[j_safe]).reshape(-1),
        ))

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
        segs.append(dict(
            ok=sb_ok.reshape(-1),
            a=jnp.broadcast_to(sp.body[:, None], (S, B)).reshape(-1),
            b=jnp.broadcast_to(bx.body[None, :], (S, B)).reshape(-1),
            gap=gap_b.reshape(-1), n=n_b.reshape(-1, 3), p=p_b.reshape(-1, 3),
            mu=jnp.minimum(sp.mu[:, None], bx.mu[None, :]).reshape(-1),
        ))

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
            segs.append(dict(
                ok=cc_ok, a=cv.body[iu], b=cv.body[ju],
                gap=gap_cc, n=n_cc, p=p_cc,
                mu=jnp.minimum(cv.mu[iu], cv.mu[ju]),
            ))
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
            segs.append(dict(
                ok=sc_ok, a=sp.body[ii], b=cv.body[jj],
                gap=gap_sc, n=n_sc, p=p_sc,
                mu=jnp.minimum(sp.mu[ii], cv.mu[jj]),
            ))

    all_ok = jnp.concatenate([s["ok"] for s in segs])
    n_tot = all_ok.shape[0]
    K_cap = coll.max_contacts
    sel = jnp.nonzero(all_ok, size=K_cap, fill_value=n_tot)[0]
    safe = jnp.minimum(sel, n_tot - 1)

    def gather(key):
        return jnp.concatenate([s[key] for s in segs])[safe]

    return Contacts(
        body_a=gather("a"), body_b=gather("b"), point=gather("p"),
        normal=gather("n"), gap=gather("gap"), mu=gather("mu"),
        active=sel < n_tot,
        count=jnp.sum(all_ok).astype(jnp.int32),
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


def nsc_step(model, coll: CollisionModel, state: BodyState, t, h,
             settings=None, gamma_warm=None):
    """One NSC (DVI) step with contacts: detect → lower → mixed VI solve.

    Equivalent of ``ChSystem::AdvanceDynamics`` with collision
    (ChSystem.cpp:1581).  Returns (new_state, contacts, StepInfo).
    """
    from chrono_tpu.physics.system import (
        SolverSettings, step_euler_implicit_linearized,
    )

    if settings is None:
        settings = SolverSettings(solver="apgd", stab_factor=0.2)
    contacts = detect_contacts(coll, state)
    rows = contact_rows(contacts, state, h, settings.stab_factor,
                        settings.max_recovery_speed)
    new_state, info = step_euler_implicit_linearized(
        model, state, t, h, settings,
        extra_rows=rows, n_contacts=coll.max_contacts,
        contact_mu=contacts.mu, gamma_warm=gamma_warm,
    )
    return new_state, contacts, info
