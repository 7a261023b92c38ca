"""Motors: driven rotational / linear constraints.

Equivalent of the reference's ``ChLinkMotorRotation{Speed,Angle}`` and
``ChLinkMotorLinear{Speed,Position}`` plus the torque/force variants
(/root/reference/src/chrono/physics/ChLinkMotorRotationSpeed.h etc.).

Constraint motors add ONE velocity-level row along the joint-frame z axis whose
rhs is the motor set-point; the guiding joint (revolute/prismatic) is added
separately by the builder.  Torque/force motors apply a pure load instead.
The motor profile is any :mod:`chrono_tpu.core.functions` MotionFunction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.constraints import ConstraintRows


@pytree_dataclass
class MotorData:
    """Batched parameters of M motors of one kind (kind is the dict key in Model)."""

    body_a: Array  # (M,) int32  — the driven body
    body_b: Array  # (M,) int32  — the reference body
    fa_pos: Array  # (M, 3)
    fa_rot: Array  # (M, 4)
    fb_pos: Array  # (M, 3)
    fb_rot: Array  # (M, 4)
    profile: object  # MotionFunction evaluated at sim time (batched params allowed)

    @property
    def n(self) -> int:
        return self.body_a.shape[0]


def _axis_world(q, f_rot):
    return Q.qrotate(Q.qmul(q, f_rot), jnp.asarray([0.0, 0.0, 1.0], q.dtype))


def relative_angle_about_axis(x_a, q_a, x_b, q_b, fa_rot, fb_rot) -> Array:
    """Rotation of frame b relative to frame a about their common z axis (wrapped)."""
    qa = Q.qmul(q_a, fa_rot)
    qb = Q.qmul(q_b, fb_rot)
    Ra = Q.q_to_matrix(qa)
    xb_w = Q.q_to_matrix(qb)[..., :, 0]
    # project b's x axis into a's (x,y) plane
    return jnp.arctan2(
        jnp.sum(Ra[..., :, 1] * xb_w, axis=-1),
        jnp.sum(Ra[..., :, 0] * xb_w, axis=-1),
    )


def relative_displacement_along_axis(x_a, q_a, x_b, q_b, fa_pos, fa_rot, fb_pos):
    pa = x_a + Q.qrotate(q_a, fa_pos)
    pb = x_b + Q.qrotate(q_b, fb_pos)
    za = _axis_world(q_a, fa_rot)
    return jnp.sum(za * (pb - pa), axis=-1)


def motor_rows(kind: str, data: MotorData, state_x, state_q, t, h,
               stab_factor=1.0, vel_scale=1.0) -> ConstraintRows:
    """Lower one motor kind to constraint rows.

    Kinds: ``rot_speed`` | ``rot_angle`` | ``lin_speed`` | ``lin_pos``.
    Row convention: positive γ drives body b forward relative to body a.
    ``vel_scale=0`` with ``h=1, stab_factor=1`` yields pure position-error
    rows (rhs = −err) for post-step position projection.
    """
    a, b = data.body_a, data.body_b
    x_a, q_a = state_x[a], state_q[a]
    x_b, q_b = state_x[b], state_q[b]
    za = _axis_world(q_a, data.fa_rot)  # (M, 3) world axis
    dtype = state_x.dtype
    M = data.n

    if kind in ("rot_speed", "rot_angle"):
        # row: za·(ω_w_b - ω_w_a) = rhs;  ω_w = R(q) w_local
        Ja_w = -Q.qrotate_inv(q_a, za)
        Jb_w = Q.qrotate_inv(q_b, za)
        Ja_v = jnp.zeros((M, 3), dtype)
        Jb_v = jnp.zeros((M, 3), dtype)
        if kind == "rot_speed":
            rhs = vel_scale * jnp.broadcast_to(
                jnp.asarray(data.profile.value(t), dtype), (M,))
        else:
            angle = relative_angle_about_axis(
                x_a, q_a, x_b, q_b, data.fa_rot, data.fb_rot
            )
            target = jnp.asarray(data.profile.value(t), dtype)
            target_v = jnp.asarray(data.profile.deriv(t), dtype)
            # wrap error to (-pi, pi] so angle targets work across branch cuts
            err = jnp.mod(angle - target + jnp.pi, 2 * jnp.pi) - jnp.pi
            rhs = (vel_scale * jnp.broadcast_to(target_v, (M,))
                   - (stab_factor / h) * err)
    elif kind in ("lin_speed", "lin_pos"):
        # row: za·(v_pb - v_pa) = rhs  with attachment-point velocities
        ra = Q.qrotate(q_a, data.fa_pos)  # world lever arms
        rb = Q.qrotate(q_b, data.fb_pos)
        Ja_v = -za
        Jb_v = za
        Ja_w = -Q.qrotate_inv(q_a, jnp.cross(ra, za))
        Jb_w = Q.qrotate_inv(q_b, jnp.cross(rb, za))
        if kind == "lin_speed":
            rhs = vel_scale * jnp.broadcast_to(
                jnp.asarray(data.profile.value(t), dtype), (M,))
        else:
            disp = relative_displacement_along_axis(
                x_a, q_a, x_b, q_b, data.fa_pos, data.fa_rot, data.fb_pos
            )
            target = jnp.asarray(data.profile.value(t), dtype)
            target_v = jnp.asarray(data.profile.deriv(t), dtype)
            rhs = (vel_scale * jnp.broadcast_to(target_v, (M,))
                   - (stab_factor / h) * (disp - target))
    else:
        raise ValueError(f"unknown motor kind {kind!r}")

    return ConstraintRows.two_body(
        body_a=a, body_b=b,
        Ja_v=Ja_v, Ja_w=Ja_w, Jb_v=Jb_v, Jb_w=Jb_w,
        rhs=rhs, active=jnp.ones((M,), bool),
    )


def motor_loads(kind: str, data: MotorData, state_x, state_q, t):
    """Torque/force motors: return per-motor world-frame loads.

    Kinds: ``rot_torque`` (applies ±τ·axis) | ``lin_force`` (applies ±F·axis).
    Returns (force_a, torque_a, force_b, torque_b) each (M, 3) world frame.
    """
    a, b = data.body_a, data.body_b
    q_a = state_q[a]
    za = _axis_world(q_a, data.fa_rot)
    val = jnp.asarray(data.profile.value(t), state_x.dtype)
    val = jnp.broadcast_to(val, (data.n,))[:, None]
    zero = jnp.zeros_like(za)
    if kind == "rot_torque":
        return zero, -val * za, zero, val * za
    elif kind == "lin_force":
        return -val * za, zero, val * za, zero
    raise ValueError(f"unknown motor load kind {kind!r}")
