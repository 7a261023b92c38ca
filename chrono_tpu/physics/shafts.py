"""1-D drivetrain (shaft) elements inside the MBS solve.

TPU-native counterpart of the reference's ChShaft family
(/root/reference/src/chrono/physics/ChShaft.h:30 — 1-DOF rotational inertia
variables — plus ChShaftsGear.h, ChShaftsPlanetary.h, ChShaftsClutch.h,
ChShaftsBody.h, ChShaftsTorsionSpring.h, ChShaftsMotor*.h): the reference
gives shafts their own ChVariables type; here a shaft IS a rigid body whose
mass properties disable every DOF except spin about its local z
(inv_mass = 0, inv_inertia = (0, 0, 1/J)) — so the whole existing descriptor/
solver machinery (and autodiff) covers drivetrains with zero special-casing.
Shaft angle = body quaternion (pure z rotation); shaft speed = w_z.

Couplings are velocity-level constraint rows (gear, planetary — a genuine
3-variable row, ChShaftsPlanetary.h — shaft↔body) or applied-torque pairs
(clutch, torsion spring, motor torque), evaluated batched.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.constraints import ConstraintRows


# ---------------------------------------------------------------------------
# constraint-type couplings
# ---------------------------------------------------------------------------

@pytree_dataclass
class ShaftGearData:
    """ω_a = ratio · ω_b  (ChShaftsGear; ratio < 0 = reversing mesh)."""

    shaft_a: Array   # (G,) int32 body index of shaft a
    shaft_b: Array
    ratio: Array     # (G,)


@pytree_dataclass
class ShaftPlanetaryData:
    """r_c ω_c + r_s ω_s + r_r ω_r = 0 (carrier/sun/ring Willis equation,
    ChShaftsPlanetary.h).  Coefficients stored per constraint."""

    carrier: Array   # (P,) int32
    sun: Array
    ring: Array
    c_carrier: Array  # (P,)
    c_sun: Array
    c_ring: Array


@pytree_dataclass
class ShaftBodyData:
    """Shaft spin locked to a body's angular velocity about a body-local axis
    (ChShaftsBody.h): ω_shaft − a·w_body = 0."""

    shaft: Array     # (S,) int32
    body: Array      # (S,) int32
    axis_local: Array  # (S, 3)


def shaft_gear_rows(data: ShaftGearData, dtype=jnp.float32) -> ConstraintRows:
    n = data.shaft_a.shape[0]
    ez = jnp.zeros((n, 3), dtype).at[:, 2].set(1.0)
    return ConstraintRows.two_body(
        body_a=data.shaft_a, body_b=data.shaft_b,
        Ja_v=jnp.zeros((n, 3), dtype), Ja_w=ez,
        Jb_v=jnp.zeros((n, 3), dtype),
        Jb_w=jnp.zeros((n, 3), dtype).at[:, 2].set(-data.ratio),
        rhs=jnp.zeros((n,), dtype), active=jnp.ones((n,), bool),
    )


def shaft_planetary_rows(data: ShaftPlanetaryData,
                         dtype=jnp.float32) -> ConstraintRows:
    n = data.carrier.shape[0]
    z = jnp.zeros((n, 3), dtype)
    col = lambda c: jnp.zeros((n, 3), dtype).at[:, 2].set(c)
    return ConstraintRows(
        body_a=data.carrier, body_b=data.sun, body_c=data.ring,
        Ja_v=z, Ja_w=col(data.c_carrier),
        Jb_v=z, Jb_w=col(data.c_sun),
        Jc_w=col(data.c_ring),
        rhs=jnp.zeros((n,), dtype), active=jnp.ones((n,), bool),
    )


def shaft_body_rows(data: ShaftBodyData, dtype=jnp.float32) -> ConstraintRows:
    n = data.shaft.shape[0]
    z = jnp.zeros((n, 3), dtype)
    return ConstraintRows.two_body(
        body_a=data.shaft, body_b=data.body,
        Ja_v=z, Ja_w=jnp.zeros((n, 3), dtype).at[:, 2].set(1.0),
        Jb_v=z, Jb_w=-data.axis_local,
        rhs=jnp.zeros((n,), dtype), active=jnp.ones((n,), bool),
    )


SHAFT_ROW_GENERATORS = {
    "gear": shaft_gear_rows,
    "planetary": shaft_planetary_rows,
    "shaft_body": shaft_body_rows,
}


# ---------------------------------------------------------------------------
# torque-type couplings (smooth loads)
# ---------------------------------------------------------------------------

@pytree_dataclass
class ShaftTorqueElements:
    """Batched clutch + torsion-spring + constant-torque elements.

    clutch:  τ = clip(c_slip · (ω_b − ω_a), ±τ_max · engagement)
             (viscous-locking approximation of ChShaftsClutch)
    spring:  τ = k (θ_b − θ_a − rest) + c (ω_b − ω_a)   (ChShaftsTorsionSpring)
    torque:  constant applied pair (ChShaftsAppliedTorque / motor torque mode)
    """

    shaft_a: Array        # (T,) int32
    shaft_b: Array
    kind: Array           # (T,) 0=clutch, 1=spring, 2=torque
    k: Array              # spring k | clutch c_slip | torque value
    c: Array              # spring c | clutch τ_max  | unused
    rest: Array           # spring rest angle | clutch engagement (0..1)


def shaft_angle(q: Array) -> Array:
    """Rotation angle about local z of a pure-z-rotation quaternion.

    Shaft bodies only ever rotate about z (all other inverse inertias are 0),
    and the angle is CONTINUOUS only modulo 2π — torsion springs wind
    correctly because the integrator keeps q on the unit circle, but rest
    angles beyond ±π must be tracked by the caller (same caveat as the
    reference's GetPos on wrapped shafts).
    """
    return 2.0 * jnp.arctan2(q[..., 3], q[..., 0])


def shaft_torques(data: ShaftTorqueElements, state_q, state_w, n_bodies):
    """Accumulate shaft-element torque pairs → (N, 3) body-local torques."""
    a, b = data.shaft_a, data.shaft_b
    w_a = state_w[a][:, 2]
    w_b = state_w[b][:, 2]
    th_a = shaft_angle(state_q[a])
    th_b = shaft_angle(state_q[b])
    dw = w_b - w_a
    dth = th_b - th_a
    # wrap the angle difference to (−π, π] so springs don't jump at ±π
    dth = dth - 2.0 * jnp.pi * jnp.round(dth / (2.0 * jnp.pi))

    tau_clutch = jnp.clip(data.k * dw, -data.c * data.rest,
                          data.c * data.rest)
    tau_spring = data.k * (dth - data.rest) + data.c * dw
    tau_const = data.k
    tau = jnp.where(data.kind == 0, tau_clutch,
                    jnp.where(data.kind == 1, tau_spring, tau_const))

    out = jnp.zeros((n_bodies, 3), state_w.dtype)
    out = out.at[a, 2].add(tau)
    out = out.at[b, 2].add(-tau)
    return out
