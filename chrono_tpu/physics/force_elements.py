"""Force elements: translational / rotational spring-damper-actuators and body loads.

Equivalent of the reference's ``ChLinkTSDA`` / ``ChLinkRSDA``
(/root/reference/src/chrono/physics/ChLinkTSDA.h, ChLinkRSDA.h) and ``ChForce``:
smooth force elements that accumulate into per-body force/torque arrays (world-frame
force at COM, body-local torque), vectorized over all elements with segment-sum
scatter instead of per-object AddForce calls.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.motors import relative_angle_about_axis


@pytree_dataclass
class TSDAData:
    """K translational spring-damper-actuators between body anchor points."""

    body_a: Array   # (K,) int32
    body_b: Array   # (K,) int32
    pa_loc: Array   # (K, 3) anchor in body-a local coords
    pb_loc: Array   # (K, 3)
    k: Array        # (K,) spring stiffness
    c: Array        # (K,) damping
    rest_len: Array  # (K,)
    f_act: Array    # (K,) constant actuation force (+ = repulsive along axis)

    @property
    def n(self) -> int:
        return self.body_a.shape[0]


@pytree_dataclass
class RSDAData:
    """K rotational spring-damper-actuators about a joint-frame z axis."""

    body_a: Array
    body_b: Array
    fa_rot: Array   # (K, 4) axis frame in body a
    fb_rot: Array   # (K, 4)
    k: Array
    c: Array
    rest_angle: Array
    t_act: Array    # constant actuation torque

    @property
    def n(self) -> int:
        return self.body_a.shape[0]


def accumulate_tsda(data: TSDAData, state, f_world: Array, tau_local: Array):
    """Add TSDA forces into accumulators; returns updated (f_world, tau_local)."""
    a, b = data.body_a, data.body_b
    ra = Q.qrotate(state.q[a], data.pa_loc)         # world lever arms from COM
    rb = Q.qrotate(state.q[b], data.pb_loc)
    pa = state.x[a] + ra
    pb = state.x[b] + rb
    d = pb - pa
    length = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-18)
    u = d / length[:, None]
    # anchor-point velocities (w is body-local → world angular velocity R w)
    wa_w = Q.qrotate(state.q[a], state.w[a])
    wb_w = Q.qrotate(state.q[b], state.w[b])
    va = state.v[a] + jnp.cross(wa_w, ra)
    vb = state.v[b] + jnp.cross(wb_w, rb)
    speed = jnp.sum(u * (vb - va), axis=-1)
    # scalar force along u, positive pulls bodies together (spring in tension)
    fmag = data.k * (length - data.rest_len) + data.c * speed + data.f_act
    f_on_a = u * fmag[:, None]
    f_on_b = -f_on_a
    f_world = f_world.at[a].add(f_on_a).at[b].add(f_on_b)
    tau_local = (
        tau_local
        .at[a].add(Q.qrotate_inv(state.q[a], jnp.cross(ra, f_on_a)))
        .at[b].add(Q.qrotate_inv(state.q[b], jnp.cross(rb, f_on_b)))
    )
    return f_world, tau_local


def accumulate_rsda(data: RSDAData, state, f_world: Array, tau_local: Array):
    """Add RSDA torques about the world axis za into the accumulators."""
    a, b = data.body_a, data.body_b
    za = Q.qrotate(Q.qmul(state.q[a], data.fa_rot),
                   jnp.asarray([0.0, 0.0, 1.0], state.x.dtype))
    angle = relative_angle_about_axis(
        state.x[a], state.q[a], state.x[b], state.q[b], data.fa_rot, data.fb_rot
    )
    wa_w = Q.qrotate(state.q[a], state.w[a])
    wb_w = Q.qrotate(state.q[b], state.w[b])
    rate = jnp.sum(za * (wb_w - wa_w), axis=-1)
    tmag = data.k * (angle - data.rest_angle) + data.c * rate - data.t_act
    tau_w_on_b = -za * tmag[:, None]
    tau_local = (
        tau_local
        .at[b].add(Q.qrotate_inv(state.q[b], tau_w_on_b))
        .at[a].add(Q.qrotate_inv(state.q[a], -tau_w_on_b))
    )
    return f_world, tau_local


def tsda_length(data: TSDAData, state) -> Array:
    a, b = data.body_a, data.body_b
    pa = state.x[a] + Q.qrotate(state.q[a], data.pa_loc)
    pb = state.x[b] + Q.qrotate(state.q[b], data.pb_loc)
    return jnp.linalg.norm(pb - pa, axis=-1)


@pytree_dataclass
class BushingData:
    """K compliant 6-DOF bushings between body frames (reference
    ChLinkBushing, /root/reference/src/chrono/physics/ChLinkBushing.h):
    diagonal translational/rotational stiffness + damping expressed in the
    body-a bushing frame — the smooth alternative to a joint for mounts,
    silent-blocks, engine mounts."""

    body_a: Array   # (K,) int32
    body_b: Array   # (K,) int32
    fa_pos: Array   # (K, 3) frame origin in body-a local coords
    fa_rot: Array   # (K, 4)
    fb_pos: Array   # (K, 3)
    fb_rot: Array   # (K, 4)
    k_t: Array      # (K, 3) translational stiffness along frame axes
    c_t: Array      # (K, 3)
    k_r: Array      # (K, 3) rotational stiffness about frame axes
    c_r: Array      # (K, 3)


def accumulate_bushing(data: BushingData, state, f_world: Array,
                       tau_local: Array):
    """Add bushing forces/moments into the accumulators."""
    a, b = data.body_a, data.body_b
    qa = Q.qmul(state.q[a], data.fa_rot)          # world bushing frame (on a)
    qb = Q.qmul(state.q[b], data.fb_rot)
    ra = Q.qrotate(state.q[a], data.fa_pos)
    rb = Q.qrotate(state.q[b], data.fb_pos)
    pa = state.x[a] + ra
    pb = state.x[b] + rb

    # translational: displacement of b's anchor in a's bushing frame
    d_world = pb - pa
    d_loc = Q.qrotate_inv(qa, d_world)
    va = state.v[a] + jnp.cross(Q.qrotate(state.q[a], state.w[a]), ra)
    vb = state.v[b] + jnp.cross(Q.qrotate(state.q[b], state.w[b]), rb)
    dv_loc = Q.qrotate_inv(qa, vb - va)
    f_loc = -(data.k_t * d_loc + data.c_t * dv_loc)
    f_w = Q.qrotate(qa, f_loc)                    # force ON body b

    # rotational: small-rotation chart of the relative frame rotation
    q_rel = Q.qmul(Q.qconj(qa), qb)
    q_rel = jnp.where(q_rel[..., 0:1] < 0, -q_rel, q_rel)
    th = 2.0 * q_rel[..., 1:4]                    # ≈ rotation vector (a frame)
    w_rel = Q.qrotate_inv(qa, Q.qrotate(state.q[b], state.w[b])
                          - Q.qrotate(state.q[a], state.w[a]))
    m_loc = -(data.k_r * th + data.c_r * w_rel)
    m_w = Q.qrotate(qa, m_loc)                    # moment ON body b (world)

    f_world = f_world.at[b].add(f_w).at[a].add(-f_w)
    tau_b = Q.qrotate_inv(state.q[b], m_w + jnp.cross(rb, f_w))
    tau_a = Q.qrotate_inv(state.q[a], -m_w + jnp.cross(ra, -f_w))
    tau_local = tau_local.at[b].add(tau_b).at[a].add(tau_a)
    return f_world, tau_local
