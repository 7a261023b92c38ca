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
class CollisionModel:
    """All collision geometry of a scene + static pipeline capacities."""

    spheres: SphereShapes
    boxes: Optional[BoxShapes]
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
    cl = build_cell_list(coll.grid, centers)
    qijk = cell_ijk(coll.grid, centers)
    cand, valid = neighbor_candidates(coll.grid, cl, qijk, coll.max_per_cell)
    C = cand.shape[1]

    # sphere-sphere candidate filtering
    i_idx = jnp.broadcast_to(jnp.arange(S)[:, None], (S, C))
    j_idx = cand
    pair_ok = valid & (j_idx > i_idx)                      # dedupe i<j
    # no self-body contacts (e.g. multi-sphere rigid clusters)
    pair_ok &= sp.body[i_idx] != sp.body[jnp.maximum(j_idx, 0)]
    gap, n, p = nphase.sphere_sphere(
        centers[i_idx], sp.radius[i_idx],
        centers[jnp.maximum(j_idx, 0)], sp.radius[jnp.maximum(j_idx, 0)],
    )
    touching = pair_ok & (gap < coll.envelope)

    flat_ok = touching.reshape(-1)
    n_ss = S * C
    count_ss = jnp.sum(flat_ok)

    # sphere-box dense pairs
    if coll.boxes is not None and coll.boxes.n > 0:
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
        count_sb = jnp.sum(sb_ok)
    else:
        B = 0
        count_sb = 0

    # pack into fixed-capacity buffer via nonzero(size=)
    K = coll.max_contacts
    if B > 0:
        all_ok = jnp.concatenate([flat_ok, sb_ok.reshape(-1)])
    else:
        all_ok = flat_ok
    sel = jnp.nonzero(all_ok, size=K, fill_value=n_ss + S * B)[0]  # (K,)
    is_ss = sel < n_ss
    sel_ss = jnp.minimum(sel, n_ss - 1)
    i_ss = sel_ss // C
    j_ss = cand.reshape(-1)[sel_ss]
    j_ss = jnp.maximum(j_ss, 0)

    out_a = sp.body[i_ss]
    out_b = sp.body[j_ss]
    out_gap = gap.reshape(-1)[sel_ss]
    out_n = n.reshape(S * C, 3)[sel_ss]
    out_p = p.reshape(S * C, 3)[sel_ss]
    out_mu = jnp.minimum(sp.mu[i_ss], sp.mu[j_ss])

    if B > 0:
        sel_sb = jnp.clip(sel - n_ss, 0, S * B - 1)
        i_sb = sel_sb // B
        b_sb = sel_sb % B
        out_a = jnp.where(is_ss, out_a, sp.body[i_sb])
        out_b = jnp.where(is_ss, out_b, bx.body[b_sb])
        out_gap = jnp.where(is_ss, out_gap, gap_b.reshape(-1)[sel_sb])
        out_n = jnp.where(is_ss[:, None], out_n, n_b.reshape(S * B, 3)[sel_sb])
        out_p = jnp.where(is_ss[:, None], out_p, p_b.reshape(S * B, 3)[sel_sb])
        out_mu = jnp.where(is_ss, out_mu,
                           jnp.minimum(sp.mu[i_sb], bx.mu[b_sb]))

    active = sel < (n_ss + S * B if B > 0 else n_ss)
    return Contacts(
        body_a=out_a, body_b=out_b, point=out_p, normal=out_n,
        gap=out_gap, mu=out_mu, active=active,
        count=(count_ss + count_sb).astype(jnp.int32),
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
