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


def _gap_parallel(x_a, q_a, x_b, q_b, p):
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return jnp.stack([za @ xb, za @ yb])


def _gap_perpendicular(x_a, q_a, x_b, q_b, p):
    pa, xa, ya, za = _joint_world(x_a, q_a, p["fa_pos"], p["fa_rot"])
    pb, xb, yb, zb = _joint_world(x_b, q_b, p["fb_pos"], p["fb_rot"])
    return jnp.stack([za @ zb])


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
    "parallel": (_gap_parallel, 2),
    "perpendicular": (_gap_perpendicular, 1),
}

_LOWERERS = {
    name: lower_gap_function(fn, nr) for name, (fn, nr) in JOINT_TYPES.items()
}


def joint_rows(kind: str, data: JointData, state_x, state_q, h,
               stab_factor=1.0) -> ConstraintRows:
    """Lower all joints of one type to stabilized constraint rows."""
    params = {
        "fa_pos": data.fa_pos, "fa_rot": data.fa_rot,
        "fb_pos": data.fb_pos, "fb_rot": data.fb_rot,
        "aux": data.aux,
    }
    return _LOWERERS[kind](
        state_x, state_q, data.body_a, data.body_b, params, h, stab_factor
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
