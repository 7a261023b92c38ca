"""Joint (bilateral constraint) library.

TPU-native equivalent of the reference's ``ChLinkLock*`` / ``ChLinkMate*`` family
(/root/reference/src/chrono/physics/ChLinkLock.h, ChLinkMate.h): each joint type is a
position-level gap function; exact velocity Jacobians come from forward-mode autodiff
(see chrono_tpu.physics.constraints.lower_gap_function).  Joints of one type are
stored as batched arrays and lowered with ``vmap`` — no per-object virtual dispatch.

Conventions: each joint stores a *joint frame* on each body, expressed in that body's
local coordinates. The joint's functional axis is the frame's **z axis** (matching the
reference's ChLinkMateGeneric convention).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.constraints import ConstraintRows, lower_gap_function


@pytree_dataclass
class JointData:
    """Batched parameters of J joints of one type."""

    body_a: Array  # (J,) int32
    body_b: Array  # (J,) int32
    fa_pos: Array  # (J, 3) joint frame origin in body-a local coords
    fa_rot: Array  # (J, 4) joint frame rotation in body-a local coords
    fb_pos: Array  # (J, 3)
    fb_rot: Array  # (J, 4)
    aux: Array     # (J,) type-specific scalar (e.g. distance)

    @property
    def n(self) -> int:
        return self.body_a.shape[0]


def _joint_world(x, q, f_pos, f_rot):
    """World-space joint frame: origin p, axes (ex, ey, ez)."""
    p = x + Q.qrotate(q, f_pos)
    qf = Q.qmul(q, f_rot)
    R = Q.q_to_matrix(qf)  # columns are world axes
    return p, R[..., :, 0], R[..., :, 1], R[..., :, 2]


def _rotlock3(xa, ya, za, xb, yb, zb):
    """Three smooth scalar equations that vanish iff frames a,b are aligned
    (valid chart away from 180° relative rotation)."""
    return jnp.stack([ya @ zb, za @ xb, xa @ yb])


# --- gap functions: c(x_a, q_a, x_b, q_b, params) -> (n_rows,) ----------------

def _gap_spherical(x_a, q_a, x_b, q_b, p):
    pa = x_a + Q.qrotate(q_a, p["fa_pos"])
    pb = x_b + Q.qrotate(q_b, p["fb_pos"])
    return pa - pb


def _gap_revolute(x_a, q_a, x_b, q_b, p):
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return jnp.concatenate([pa - pb, jnp.stack([za @ xb, za @ yb])])


def _gap_universal(x_a, q_a, x_b, q_b, p):
    # cross axes: x of a, y of b stay perpendicular (Hooke joint)
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return jnp.concatenate([pa - pb, jnp.stack([xa @ yb])])


def _gap_prismatic(x_a, q_a, x_b, q_b, p):
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    dp = pb - pa
    return jnp.concatenate(
        [jnp.stack([xa @ dp, ya @ dp]), _rotlock3(xa, ya, za, xb, yb, zb)]
    )


def _gap_cylindrical(x_a, q_a, x_b, q_b, p):
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    dp = pb - pa
    return jnp.stack([xa @ dp, ya @ dp, za @ xb, za @ yb])


def _gap_weld(x_a, q_a, x_b, q_b, p):
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return jnp.concatenate([pa - pb, _rotlock3(xa, ya, za, xb, yb, zb)])


def _gap_distance(x_a, q_a, x_b, q_b, p):
    pa = x_a + Q.qrotate(q_a, p["fa_pos"])
    pb = x_b + Q.qrotate(q_b, p["fb_pos"])
    d = pb - pa
    return jnp.stack([jnp.sqrt(jnp.sum(d * d) + 1e-18) - p["aux"]])


def _gap_planar(x_a, q_a, x_b, q_b, p):
    # point of b confined to the z=0 plane of frame a; plane normals locked
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    dp = pb - pa
    return jnp.stack([za @ dp, za @ xb, za @ yb])


def _gap_point_line(x_a, q_a, x_b, q_b, p):
    # point of b confined to the z axis of frame a
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb = x_b + Q.qrotate(q_b, p["fb_pos"])
    dp = pb - pa
    return jnp.stack([xa @ dp, ya @ dp])


def _gap_point_plane(x_a, q_a, x_b, q_b, p):
    # point of b confined to the z=0 plane of frame a (ChLinkLockPointPlane)
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb = x_b + Q.qrotate(q_b, p["fb_pos"])
    return jnp.stack([za @ (pb - pa)])


def _gap_rev_spherical(x_a, q_a, x_b, q_b, p):
    # point of b at fixed distance aux from the revolute axis (z of frame a),
    # confined to the plane normal to that axis through the frame origin
    # (ChLinkRevoluteSpherical, /root/reference/src/chrono/physics/
    # ChLinkRevoluteSpherical.h: 2 constraint rows)
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb = x_b + Q.qrotate(q_b, p["fb_pos"])
    d = pb - pa
    dn = za @ d
    r2 = jnp.maximum(d @ d - dn * dn, 1e-18)
    return jnp.stack([dn, jnp.sqrt(r2) - p["aux"]])


def _gap_oldham(x_a, q_a, x_b, q_b, p):
    # Oldham coupling (ChLinkLockOldham): frames stay aligned in rotation,
    # translation free only in the common x-y plane
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return jnp.concatenate(
        [jnp.stack([za @ (pb - pa)]), _rotlock3(xa, ya, za, xb, yb, zb)])


def _gap_parallel(x_a, q_a, x_b, q_b, p):
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return jnp.stack([za @ xb, za @ yb])


def _gap_perpendicular(x_a, q_a, x_b, q_b, p):
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return jnp.stack([za @ zb])


def _gap_align(x_a, q_a, x_b, q_b, p):
    # orientation-only weld: rotations locked, translation free
    # (ChLinkLockAlign, /root/reference/src/chrono/physics/ChLinkLock.h)
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return _rotlock3(xa, ya, za, xb, yb, zb)


def _gap_rev_prismatic(x_a, q_a, x_b, q_b, p):
    # free translation along x of frame a AND free rotation about z
    # (ChLinkLockRevolutePrismatic): 2 translation + 2 rotation rows
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    dp = pb - pa
    return jnp.stack([ya @ dp, za @ dp, za @ xb, za @ yb])


def _gap_mate_xdistance(x_a, q_a, x_b, q_b, p):
    # point of b held at signed distance aux along frame a's z axis
    # (ChLinkMateXdistance role, /root/reference/src/chrono/physics/
    # ChLinkMate.h — a 1-row offset mate)
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb = x_b + Q.qrotate(q_b, p["fb_pos"])
    return jnp.stack([za @ (pb - pa) - p["aux"]])


#: joint type registry: name -> (gap_fn, n_rows)
JOINT_TYPES = {
    "spherical": (_gap_spherical, 3),
    "revolute": (_gap_revolute, 5),
    "universal": (_gap_universal, 4),
    "prismatic": (_gap_prismatic, 5),
    "cylindrical": (_gap_cylindrical, 4),
    "weld": (_gap_weld, 6),
    "distance": (_gap_distance, 1),
    "planar": (_gap_planar, 3),
    "point_line": (_gap_point_line, 2),
    "point_plane": (_gap_point_plane, 1),
    "rev_spherical": (_gap_rev_spherical, 2),
    "oldham": (_gap_oldham, 4),
    "parallel": (_gap_parallel, 2),
    "perpendicular": (_gap_perpendicular, 1),
    "align": (_gap_align, 3),
    "rev_prismatic": (_gap_rev_prismatic, 4),
    "mate_xdistance": (_gap_mate_xdistance, 1),
}

_LOWERERS = {
    name: lower_gap_function(fn, nr) for name, (fn, nr) in JOINT_TYPES.items()
}


def joint_rows(kind: str, data: JointData, state_x, state_q, h,
               stab_factor=1.0, deadband=0.0) -> ConstraintRows:
    """Lower all joints of one type to stabilized constraint rows."""
    params = {
        "fa_pos": data.fa_pos, "fa_rot": data.fa_rot,
        "fb_pos": data.fb_pos, "fb_rot": data.fb_rot,
        "aux": data.aux,
    }
    return _LOWERERS[kind](
        state_x, state_q, data.body_a, data.body_b, params, h, stab_factor,
        deadband,
    )


# --- velocity-level couplers ---------------------------------------------------
#
# Transmission constraints (gear, pulley, rack-pinion, screw) couple RATES, not
# poses; the reference implements them as velocity(phase)-level constraints
# (/root/reference/src/chrono/physics/ChLinkLockGear.h, ChLinkLockPulley.h,
# ChLinkLockScrew.h, ChLinkRackpinion.h).  Lowering them at velocity level keeps
# them wrap-free across multiple revolutions (a position-level atan2 chart would
# jump at ±π).  Data layout reuses JointData; `aux` carries the signed ratio /
# radius / pitch.

def _coupler_gear(xw, qw, data, i):
    """aux·(ω_a·za) + (ω_b·zb) = 0 — signed ratio aux = ±ra/rb
    (negative for internal gears / belt pulleys)."""
    za_l = Q.q_to_matrix(data.fa_rot[i])[:, 2]
    zb_l = Q.q_to_matrix(data.fb_rot[i])[:, 2]
    zero = jnp.zeros((3,), za_l.dtype)
    return (data.aux[i] * za_l, zero, zb_l, zero)


def _coupler_rack_pinion(xw, qw, data, i):
    """r·(ω_a·za) + zb·(v_b − v_a) = 0 — pinion a (radius aux) drives rack b
    translating along its joint-frame z axis."""
    a, b = data.body_a[i], data.body_b[i]
    za_l = Q.q_to_matrix(data.fa_rot[i])[:, 2]
    zb_w = Q.qrotate(Q.qmul(qw[b], data.fb_rot[i]),
                     jnp.array([0.0, 0.0, 1.0], xw.dtype))
    return (data.aux[i] * za_l, -zb_w, jnp.zeros_like(za_l), zb_w)


def _coupler_screw(xw, qw, data, i):
    """za·(v_b − v_a) = (pitch/2π)·za·(ω_b − ω_a): translation/rotation coupling
    along the common z axis (combine with a cylindrical joint)."""
    a, b = data.body_a[i], data.body_b[i]
    c = data.aux[i] / (2.0 * jnp.pi)
    za_w = Q.qrotate(Q.qmul(qw[a], data.fa_rot[i]),
                     jnp.array([0.0, 0.0, 1.0], xw.dtype))
    Ra = Q.q_to_matrix(qw[a])
    Rb = Q.q_to_matrix(qw[b])
    return (c * (Ra.T @ za_w), -za_w, -c * (Rb.T @ za_w), za_w)


#: coupler registry: name -> per-coupler (Ja_w, Ja_v, Jb_w, Jb_v) builder
COUPLER_TYPES = {
    "gear": _coupler_gear,
    "pulley": _coupler_gear,          # identical row; sign convention in aux
    "rack_pinion": _coupler_rack_pinion,
    "screw": _coupler_screw,
}


def coupler_rows(kind: str, data: JointData, state_x, state_q) -> ConstraintRows:
    """Lower all couplers of one kind to single velocity-level rows (rhs = 0)."""
    import jax

    fn = COUPLER_TYPES[kind]

    def one(i):
        return fn(state_x, state_q, data, i)

    Ja_w, Ja_v, Jb_w, Jb_v = jax.vmap(one)(jnp.arange(data.n))
    return ConstraintRows.two_body(
        body_a=data.body_a, body_b=data.body_b,
        Ja_v=Ja_v, Ja_w=Ja_w, Jb_v=Jb_v, Jb_w=Jb_w,
        rhs=jnp.zeros((data.n,), Ja_v.dtype),
        active=jnp.ones((data.n,), bool),
    )


def joint_violation(kind: str, data: JointData, state_x, state_q) -> Array:
    """Position-level constraint violation C for validation/tests (J, n_rows)."""
    import jax

    gap_fn, _ = JOINT_TYPES[kind]

    def one(i):
        p = {
            "fa_pos": data.fa_pos[i], "fa_rot": data.fa_rot[i],
            "fb_pos": data.fb_pos[i], "fb_rot": data.fb_rot[i],
            "aux": data.aux[i],
        }
        a, b = data.body_a[i], data.body_b[i]
        return gap_fn(state_x[a], state_q[a], state_x[b], state_q[b], p)

    return jax.vmap(one)(jnp.arange(data.n))
