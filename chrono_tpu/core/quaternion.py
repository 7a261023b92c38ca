"""Quaternion algebra for rigid-body rotations (scalar-first ``(w, x, y, z)``).

Functional equivalents of the reference's ``ChQuaternion`` operations
(/root/reference/src/chrono/core/ChQuaternion.h) expressed as pure, batched JAX ops:
every function broadcasts over leading axes so whole body populations rotate in one
fused XLA op instead of per-object virtual calls.

Conventions:
  * unit quaternion ``q`` maps body-local vectors to world: ``v_w = R(q) v_l``.
  * angular velocity is kept in the *body-local* frame throughout chrono_tpu
    (matches the reference's ``ChBody`` local ``Wvel_loc``), so
    ``q_dot = 0.5 * q ⊗ (0, ω_l)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def qidentity(shape=(), dtype=jnp.float32) -> Array:
    """Identity quaternion(s) of batch shape ``shape`` → shape ``shape + (4,)``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def qmul(a: Array, b: Array) -> Array:
    """Hamilton product ``a ⊗ b`` (broadcasts over leading axes)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def qconj(q: Array) -> Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: Array, eps: float = 1e-12) -> Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def qrotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q``: local → world.

    Uses the 2-cross-product form (15 mul + 15 add, cheaper than building R).
    """
    u = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def qrotate_inv(q: Array, v: Array) -> Array:
    """Rotate by the inverse: world → local."""
    return qrotate(qconj(q), v)


def q_to_matrix(q: Array) -> Array:
    """Unit quaternion → 3×3 rotation matrix (batched: ``(..., 3, 3)``)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def q_from_matrix(m: Array) -> Array:
    """3×3 rotation matrix → unit quaternion (batched, branch-free Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate 4*q*q_k formulations; pick the numerically largest pivot.
    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)
    pivots = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                        1 - m00 - m11 + m22], axis=-1)
    case = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cases, 4 comps)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return qnormalize(q)


def q_from_axis_angle(axis: Array, angle: Array) -> Array:
    """Unit quaternion from (unit) axis and angle (radians); broadcasts."""
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def q_from_euler_xyz(rpy: Array) -> Array:
    """Intrinsic X-Y-Z (roll, pitch, yaw) Euler angles → quaternion."""
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            cr * cp * cy - sr * sp * sy,
            sr * cp * cy + cr * sp * sy,
            cr * sp * cy - sr * cp * sy,
            cr * cp * sy + sr * sp * cy,
        ],
        axis=-1,
    )


def qexp_half(w: Array, eps: float = 1e-12) -> Array:
    """Exponential map: rotation-vector ``w`` (angle·axis) → quaternion exp([0,w/2]).

    Stable at ``|w| → 0`` (sinc expansion); used by the symplectic orientation
    update ``q⁺ = q ⊗ qexp_half(h ω_l)``.
    """
    # differentiation-safe to ALL orders: sqrt(x + tiny) has exploding higher
    # derivatives at x = 0 (3rd derivative overflows fp32 → NaN through any
    # where()), so the exact branch must see a SANITIZED angle² (double-where
    # pattern) and the small branch must be a polynomial in angle².  Needed
    # by e.g. the FEA corotational beam, whose Newton matrix differentiates
    # a Rayleigh-damping jvp of the energy gradient (3rd derivative).
    angle2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = angle2 < 1e-12
    angle2_safe = jnp.where(small, 1.0, angle2)
    angle = jnp.sqrt(angle2_safe)
    half = 0.5 * angle
    cos_half = jnp.where(small, 1.0 - angle2 / 8.0 + angle2 * angle2 / 384.0,
                         jnp.cos(half))
    sinc = jnp.where(small, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    return jnp.concatenate([cos_half, w * sinc], axis=-1)


def qlog2(q: Array, eps: float = 1e-12) -> Array:
    """Inverse of :func:`qexp_half`: unit quaternion → rotation vector."""
    w = q[..., 0:1]
    v = q[..., 1:]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(n, w)
    scale = jnp.where(n < 1e-6, 2.0 / jnp.maximum(w, eps), angle / jnp.maximum(n, eps))
    return v * scale


def qdot_from_local_omega(q: Array, w_local: Array) -> Array:
    """Kinematic equation ``q̇ = ½ q ⊗ (0, ω_local)``."""
    zero = jnp.zeros_like(w_local[..., :1])
    return 0.5 * qmul(q, jnp.concatenate([zero, w_local], axis=-1))


def integrate_quat(q: Array, w_local: Array, h) -> Array:
    """Geometric orientation update on SO(3): ``q ⊗ exp(½ h ω_l)``, renormalized."""
    return qnormalize(qmul(q, qexp_half(w_local * h)))
