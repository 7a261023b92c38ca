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
