"""Rigid-body population state and properties (struct-of-arrays pytrees).

Replaces the reference's per-object ``ChBody`` (/root/reference/src/chrono/physics/
ChBody.h) with batched arrays over the whole body population, so the entire update
is one fused XLA program.

Conventions:
  * linear state in world frame; angular velocity ``w`` in BODY-LOCAL frame
    (matches reference ``Wvel_loc``), inertia diagonal in the body principal frame.
  * fixed bodies are encoded with ``inv_mass == 0`` and ``inv_inertia == 0``
    (the reference's ``SetFixed``), so no special-casing in kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q


@pytree_dataclass
class BodyState:
    """Dynamic state of N rigid bodies."""

    x: Array  # (N, 3) position of COM, world
    q: Array  # (N, 4) orientation, scalar-first unit quaternion
    v: Array  # (N, 3) linear velocity of COM, world
    w: Array  # (N, 3) angular velocity, body-local

    @property
    def n(self) -> int:
        return self.x.shape[0]


@pytree_dataclass
class BodyProps:
    """Constant (per-step) mass properties of N bodies."""

    inv_mass: Array     # (N,)  1/m, 0 if fixed
    inertia: Array      # (N, 3) principal inertia diagonal (body frame)
    inv_inertia: Array  # (N, 3) reciprocal, 0 if fixed


def make_body_state(x, q=None, v=None, w=None, dtype=jnp.float32) -> BodyState:
    x = jnp.asarray(x, dtype=dtype)
    n = x.shape[0]
    q = Q.qidentity((n,), dtype) if q is None else jnp.asarray(q, dtype=dtype)
    v = jnp.zeros((n, 3), dtype) if v is None else jnp.asarray(v, dtype=dtype)
    w = jnp.zeros((n, 3), dtype) if w is None else jnp.asarray(w, dtype=dtype)
    return BodyState(x=x, q=q, v=v, w=w)


def gyroscopic_torque(props: BodyProps, state: BodyState) -> Array:
    """Euler term ``-ω × (I ω)`` in the body-local frame (N, 3)."""
    Iw = props.inertia * state.w
    return -jnp.cross(state.w, Iw)


def kinetic_energy(props: BodyProps, state: BodyState) -> Array:
    """Total kinetic energy (scalar). Fixed bodies contribute zero."""
    m = jnp.where(props.inv_mass > 0, 1.0 / jnp.maximum(props.inv_mass, 1e-30), 0.0)
    lin = 0.5 * jnp.sum(m * jnp.sum(state.v**2, axis=-1))
    rot = 0.5 * jnp.sum(
        jnp.where(props.inv_mass[:, None] > 0, props.inertia, 0.0) * state.w**2
    )
    return lin + rot


def integrate_positions(state: BodyState, h) -> BodyState:
    """Semi-implicit position update: x += h v, q ← q ⊗ exp(h ω_l / 2)."""
    return state.replace(
        x=state.x + h * state.v,
        q=Q.integrate_quat(state.q, state.w, h),
    )


def integrate_positions_compensated(state: BodyState, h, cx, cq):
    """Kahan-compensated position update for long fp32 runs.

    fp32 ``x += h v`` drops the increment's low bits every step (ulp(x)/2,
    systematically — up to N·eps·|x| over N steps, the dominant fp32 error
    source in the 5e5-step golden scenarios).  Two-sum compensation carries
    the dropped bits in ``cx``/``cq`` (x_true = x + cx), restoring O(eps)
    accumulation — the summation analogue of the DEM module's cell-local
    coordinates (SURVEY §7 "compensated summation").  The quaternion update
    is compensated in additive form (dq = q⊗exp(½hω) − q, exact to O(eps)
    per step) with the normalization factor folded into the carry.

    Returns (new_state, new_cx, new_cq).
    """
    y = h * state.v - cx
    t = state.x + y
    cx2 = (t - state.x) - y
    q1 = Q.qmul(state.q, Q.qexp_half(state.w * h))
    dq = q1 - state.q
    yq = dq - cq
    tq = state.q + yq
    cq2 = (tq - state.q) - yq
    inv_n = 1.0 / jnp.sqrt(jnp.sum(tq * tq, axis=-1, keepdims=True))
    # the carry tracks dropped ADDITION bits only; rescale it through the
    # (intentional) normalization so the convention q_true = q − cq holds
    return state.replace(x=t, q=tq * inv_n), cx2, cq2 * inv_n
