"""Analytic DEM boundary conditions (walls).

Capability match for the reference's BC suite
(/root/reference/src/chrono_dem/gpu/ChDemBoundaryConditions.cuh: plane, sphere,
cone, plate, z-cylinder, with force observation and time-offset motion):
each BC type is a batched array; every particle is tested against every BC
(B ≤ 32 walls → a dense (N, B) pass the VPU eats for free) and per-BC reaction
forces come out of the same pass as masked segment sums.

Each BC returns a signed gap (<0 penetrating), a unit normal pointing INTO the
domain (the push-out direction for particles) and the wall surface velocity.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class PlaneBCs:
    """B half-space walls: particles kept on the +normal side."""

    point: Array    # (B, 3)
    normal: Array   # (B, 3) unit, into the domain
    vel: Array      # (B, 3) wall velocity (conveyor/piston motion)


@pytree_dataclass
class CylinderBCs:
    """B infinite cylinders along z, particles kept INSIDE (r < R)."""

    center: Array   # (B, 2) xy
    radius: Array   # (B,)
    vel: Array      # (B, 3)


@pytree_dataclass
class SphereBCs:
    """B spherical obstacles: particles kept OUTSIDE."""

    center: Array   # (B, 3)
    radius: Array   # (B,)
    vel: Array      # (B, 3)


@pytree_dataclass
class ConeBCs:
    """B z-axis cones (apex up or down); particles kept INSIDE the cone.

    Surface: r_xy = slope · (z − apex_z) for z on the open side; ``slope`` =
    tan(half-angle).  The reference's cone BC (ChDemBoundaryConditions.cuh).
    """

    apex: Array     # (B, 3) apex point
    slope: Array    # (B,) tan(half-angle), >0 opens upward (+z)
    vel: Array      # (B, 3)


@pytree_dataclass
class WheelBCs:
    """B finite oriented cylinders (wheels/rollers), particles kept OUTSIDE.

    The moving-obstacle BC the reference's GranularTerrain role needs
    (/root/reference/src/chrono_vehicle/terrain/GranularTerrain.h — vehicle
    wheels interacting with a granular patch): pose/velocity leaves are traced,
    so a coupled program updates them from body states every outer step without
    recompiling.  Lateral surface, end caps and rim edges all resolve through
    one branch-free 2-D (radial, axial) signed-distance field.
    """

    center: Array   # (B, 3) cylinder center
    axis: Array     # (B, 3) unit axis (wheel y)
    radius: Array   # (B,)
    half_width: Array  # (B,)
    vel: Array      # (B, 3) body translational velocity
    omega: Array    # (B, 3) body angular velocity (world frame)


@pytree_dataclass
class DEMBoundaries:
    planes: Optional[PlaneBCs] = None
    cylinders: Optional[CylinderBCs] = None
    spheres: Optional[SphereBCs] = None
    cones: Optional[ConeBCs] = None
    wheels: Optional[WheelBCs] = None


class BCContact(NamedTuple):
    gap: Array      # (N, B) signed (particle surface vs wall)
    normal: Array   # (N, B, 3) into-domain push direction
    vel: Array      # (N, B, 3) wall surface velocity


def plane_contacts(bc: PlaneBCs, pos: Array, radius) -> BCContact:
    d = jnp.einsum("nj,bj->nb", pos, bc.normal) - jnp.sum(
        bc.point * bc.normal, axis=-1)[None, :]
    gap = d - radius
    n = jnp.broadcast_to(bc.normal[None], (pos.shape[0],) + bc.normal.shape)
    v = jnp.broadcast_to(bc.vel[None], n.shape)
    return BCContact(gap, n, v)


def cylinder_contacts(bc: CylinderBCs, pos: Array, radius) -> BCContact:
    d = pos[:, None, :2] - bc.center[None, :, :]          # (N, B, 2)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    gap = (bc.radius[None, :] - r) - radius               # inside: r < R
    n_xy = -d / r[..., None]                              # push toward axis
    n = jnp.concatenate([n_xy, jnp.zeros_like(n_xy[..., :1])], axis=-1)
    v = jnp.broadcast_to(bc.vel[None], n.shape)
    return BCContact(gap, n, v)


def sphere_bc_contacts(bc: SphereBCs, pos: Array, radius) -> BCContact:
    d = pos[:, None, :] - bc.center[None, :, :]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    gap = (r - bc.radius[None, :]) - radius               # outside: r > R
    n = d / r[..., None]
    v = jnp.broadcast_to(bc.vel[None], n.shape)
    return BCContact(gap, n, v)


def cone_contacts(bc: ConeBCs, pos: Array, radius) -> BCContact:
    """Distance of each particle to the cone surface (inside = positive gap).

    For a z-cone opening along +z with slope m: a point at height h = z−apex_z
    and cylinder radius ρ is inside when ρ < m·h; the normal to the surface
    tilts inward by the half-angle.
    """
    d = pos[:, None, :] - bc.apex[None, :, :]           # (N, B, 3)
    h = d[..., 2] * jnp.sign(bc.slope)[None, :]          # along opening dir
    m = jnp.abs(bc.slope)[None, :]
    rho = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2 + 1e-12)
    # signed distance from the surface (inside positive), exact for a cone:
    # dist = (m·h − ρ) / √(1+m²)
    dist = (m * h - rho) / jnp.sqrt(1.0 + m * m)
    gap = dist - radius
    # inward normal: radially inward + axial component toward the opening
    n_r = -d[..., :2] / rho[..., None]
    denom = jnp.sqrt(1.0 + m * m)
    n = jnp.concatenate(
        [n_r / denom[..., None],
         (m / denom * jnp.sign(bc.slope)[None, :])[..., None]], axis=-1)
    v = jnp.broadcast_to(bc.vel[None], n.shape)
    return BCContact(gap, n, v)


def wheel_contacts(bc: WheelBCs, pos: Array, radius) -> BCContact:
    """Particle vs finite solid cylinder (outside-keeping), branch-free.

    2-D SDF in (radial, axial) coordinates: ``dr = ρ−R``, ``da = |ax|−hw``;
    outside distance = hypot(max(dr,0), max(da,0)), inside = max(dr,da).
    The push-out normal is the SDF gradient (radial on the tread, axial on the
    caps, blended on the rim edge).  Surface velocity includes the spin term
    ``ω × (p_c − c)`` so friction against a driven wheel drags particles —
    exactly how the wheel does work on the bed.
    """
    d = pos[:, None, :] - bc.center[None, :, :]              # (N, B, 3)
    a = bc.axis[None, :, :]
    ax = jnp.sum(d * a, axis=-1)                             # (N, B)
    rad = d - ax[..., None] * a
    rho = jnp.sqrt(jnp.sum(rad * rad, axis=-1) + 1e-12)
    r_hat = rad / rho[..., None]
    dr = rho - bc.radius[None, :]
    da = jnp.abs(ax) - bc.half_width[None, :]
    drp = jnp.maximum(dr, 0.0)
    dap = jnp.maximum(da, 0.0)
    out = jnp.sqrt(drp * drp + dap * dap + 1e-18)
    sd = jnp.where((dr > 0) | (da > 0), out, jnp.maximum(dr, da))
    ax_hat = jnp.sign(ax)[..., None] * a
    n_out = jnp.where(((dr > 0) | (da > 0))[..., None],
                      (drp[..., None] * r_hat + dap[..., None] * ax_hat)
                      / out[..., None],
                      jnp.where((dr >= da)[..., None], r_hat, ax_hat))
    gap = sd - radius
    p_c = pos[:, None, :] - sd[..., None] * n_out            # surface point
    v = bc.vel[None, :, :] + jnp.cross(
        jnp.broadcast_to(bc.omega[None, :, :], p_c.shape),
        p_c - bc.center[None, :, :])
    return BCContact(gap, n_out, v)


def box_boundaries(lo, hi, dtype=jnp.float32) -> PlaneBCs:
    """Convenience: 6 inward-facing planes of an axis-aligned box domain."""
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)
    eye = jnp.eye(3, dtype=dtype)
    points = jnp.concatenate([jnp.tile(lo, (3, 1)), jnp.tile(hi, (3, 1))])
    normals = jnp.concatenate([eye, -eye])
    return PlaneBCs(point=points, normal=normals,
                    vel=jnp.zeros((6, 3), dtype))


def conveyor_plane(point, normal, surface_vel, dtype=jnp.float32) -> PlaneBCs:
    """A plane BC whose SURFACE moves tangentially (reference ChConveyor,
    /root/reference/src/chrono/physics/ChConveyor.h): friction against the
    moving surface drags particles along — the PlaneBCs velocity field does
    all the work in the shared wall-force pass."""
    return PlaneBCs(point=jnp.asarray([point], dtype),
                    normal=jnp.asarray([normal], dtype),
                    vel=jnp.asarray([surface_vel], dtype))
