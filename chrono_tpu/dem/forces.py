"""Hertz–Mindlin contact forces with persistent tangential history.

The TPU-native successor of the reference DEM force kernels
(/root/reference/src/chrono_dem/gpu/ChDemSMC.cuh:629-696
``computeSphereContactForces`` / matBased variants): instead of one CUDA block
per subdomain iterating neighbor subdomains with atomics, forces come from a
masked (N, K) neighbor-row reduction — pure gather + VPU math + row sum, zero
scatter — plus a dense (N, B) wall pass.  Both directions of every pair are
evaluated (see dem/neighbors.py), so Newton's third law holds by construction
of antisymmetric inputs rather than by shared accumulation.

Force model (same physics as the reference's material-based path):
  normal      F_n = k_n(δ)·δ − γ_n(δ)·v_n,  k_n = kn_pref √δ, γ_n = gn_pref δ^¼
  tangential  F_t = k_t(δ)·ξ − γ_t(δ)·v_t   capped at μ|F_n| with history
              rescale on slip (multi-step mode), or pure Coulomb-capped
              viscous (single-step mode)
  rolling     Schwartz-style torque opposing relative rolling velocity
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.dem.params import DEMParams, hertz_coefficients, user_coefficients
from chrono_tpu.dem.bc import (
    DEMBoundaries, plane_contacts, cylinder_contacts, sphere_bc_contacts,
    cone_contacts, wheel_contacts,
)


def _pair_force(params: DEMParams, n, overlap, v_rel, xi, active, kn, gn, kt, gt):
    """Shared Hertz–Mindlin force for particle-particle and particle-wall.

    n: unit normal from this particle toward the other surface;
    v_rel: velocity of the other surface relative to this particle at contact;
    xi: (…,3) tangential history.  Returns (force, new_xi, fn_scalar).
    """
    delta = jnp.maximum(overlap, 0.0)
    sq = jnp.sqrt(delta)
    # damping δ-scaling: matBased γ ∝ δ^¼ (Hertz S(δ) in √(S m*)); the
    # reference's user-stiffness model multiplies Γ·m_eff by the same
    # hertz_force_factor √(δ/R) as the stiffness (ChDemSMC.cuh:637) → δ^½
    q4 = sq if params.force_model == "user" else jnp.sqrt(sq)
    vn_s = jnp.sum(v_rel * n, axis=-1)
    vn = vn_s[..., None] * n
    vt = v_rel - vn

    fn_scalar = kn * sq * delta - gn * q4 * vn_s            # ≥0 push-out
    fn_scalar = jnp.maximum(fn_scalar, 0.0)                 # no cohesion
    f_normal = -fn_scalar[..., None] * n                    # on this particle

    if params.friction_mode == "frictionless":
        zeros = jnp.zeros_like(xi)
        f = jnp.where(active[..., None], f_normal, 0.0)
        return f, zeros, fn_scalar

    # advance tangential history and keep it in the tangent plane
    xi = xi + vt * params.dt
    xi = xi - jnp.sum(xi * n, axis=-1, keepdims=True) * n
    if params.friction_mode == "single_step":
        xi = vt * params.dt

    ft = kt * sq[..., None] * xi + gt * q4[..., None] * vt
    ft_mag = jnp.sqrt(jnp.sum(ft * ft, axis=-1) + 1e-18)
    cap = params.material.mu_s * fn_scalar
    slip = ft_mag > cap
    scale = jnp.where(slip, cap / ft_mag, 1.0)
    ft = ft * scale[..., None]
    xi = xi * scale[..., None]                              # history truncation
    xi = jnp.where(active[..., None], xi, 0.0)

    f = jnp.where(active[..., None], f_normal + ft, 0.0)
    return f, xi, jnp.where(active, fn_scalar, 0.0)


def particle_forces(params: DEMParams, pos, vel, omega, nbr_idx, nbr_valid,
                    tan_disp, roll_disp=None):
    """(N,K)-row pair forces → per-particle force/torque + updated history.

    ``roll_disp``: (N,K,3) rolling-spring history, required only for
    rolling_mode="elastic_plastic" (returned updated as the 4th output in
    that mode)."""
    r = params.radius
    m_eff = 0.5 * params.mass
    r_eff = 0.5 * r
    if params.force_model == "user":
        kn, gn, kt, gt = user_coefficients(params.material, m_eff, r)
    else:
        kn, gn, kt, gt = hertz_coefficients(params.material, m_eff, r_eff)

    j = jnp.maximum(nbr_idx, 0)
    pj = pos[j]                                             # (N,K,3)
    d = pj - pos[:, None, :]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-18)
    n = d / dist[..., None]
    overlap = 2.0 * r - dist
    active = nbr_valid & (overlap > 0)

    arm = r - 0.5 * overlap                                 # contact lever arm
    # surface velocity of the other particle minus ours at the contact point
    v_rel = (vel[j] + jnp.cross(omega[j], -arm[..., None] * n)
             - (vel[:, None, :] + jnp.cross(omega[:, None, :],
                                            arm[..., None] * n)))

    f_pair, xi_new, fn_scalar = _pair_force(
        params, n, overlap, v_rel, tan_disp, active, kn, gn, kt, gt)

    force = jnp.sum(f_pair, axis=1)
    # torque from the tangential component acting at the contact point
    tau = jnp.sum(jnp.cross(arm[..., None] * n, f_pair), axis=1)

    if params.rolling_mode == "schwartz":
        w_rel = omega[j] - omega[:, None, :]
        w_mag = jnp.sqrt(jnp.sum(w_rel * w_rel, axis=-1) + 1e-12)
        # dead zone below 1e-4 m/s rolling velocity, as in the reference
        # (ChDemHelpers.cuh computeRollingAngAcc SCHWARTZ branch) — without
        # it the constant-magnitude velocity-opposing torque chatters at
        # w → 0 and the assembly never reaches KE rest
        rolling = (arm * w_mag) > 1e-4
        t_roll = (params.material.mu_r * arm * fn_scalar / w_mag)[..., None] \
            * w_rel
        keep = (active & rolling)[..., None]
        tau = tau + jnp.sum(jnp.where(keep, t_roll, 0.0), axis=1)
    elif params.rolling_mode == "elastic_plastic":
        # rolling spring with plastic cap (the reference's ELASTIC_PLASTIC
        # mode, ChDemDefines.h:48): the accumulated rolling displacement
        # winds a torsional spring, saturated at μ_r·Fn·arm (then it slips —
        # history truncated like the tangential Coulomb cap)
        if roll_disp is None:
            raise ValueError("elastic_plastic rolling needs roll_disp state")
        w_rel = omega[j] - omega[:, None, :]
        xi_r = roll_disp + w_rel * params.dt
        k_roll = kt * params.radius * params.radius     # torsional stiffness
        t_mag = k_roll * jnp.sqrt(jnp.sum(xi_r * xi_r, axis=-1) + 1e-18)
        cap = params.material.mu_r * fn_scalar * arm
        scale = jnp.minimum(1.0, cap / jnp.maximum(t_mag, 1e-18))
        xi_r = jnp.where(active[..., None], xi_r * scale[..., None], 0.0)
        t_roll = k_roll * xi_r
        tau = tau + jnp.sum(jnp.where(active[..., None], t_roll, 0.0), axis=1)
        return force, tau, xi_new, xi_r

    return force, tau, xi_new


def _wall_reactions(pos, arm, n, f_pair):
    """Per-wall reaction (force, torque-about-origin): the BC force
    observation (ChSystemDem.h GetBCReactionForces) plus the torque needed by
    moving-obstacle coupling (GranularTerrain wheels) — shift to a body
    center c via τ_c = τ_0 − c × F."""
    react_f = -jnp.sum(f_pair, axis=0)                       # (B, 3)
    p_c = pos[:, None, :] + arm[..., None] * n               # contact points
    react_tau = -jnp.sum(jnp.cross(p_c, f_pair), axis=0)     # (B, 3)
    return react_f, react_tau


def wall_forces(params: DEMParams, bcs: DEMBoundaries, pos, vel, omega,
                bc_tan_disp, bc_roll_disp=None):
    """Dense particle×wall pass; returns force/torque, new history, and the
    total reaction force per wall (the reference's BC force observation,
    ChSystemDem.h GetBCReactionForces)."""
    r = params.radius
    m_eff = params.mass                                     # wall: m* = m
    r_eff = r
    if params.force_model == "user":
        kn, gn, kt, gt = user_coefficients(params.wall_material, m_eff, r)
    else:
        kn, gn, kt, gt = hertz_coefficients(params.wall_material, m_eff, r_eff)

    parts = []
    if bcs.planes is not None:
        parts.append(plane_contacts(bcs.planes, pos, r))
    if bcs.cylinders is not None:
        parts.append(cylinder_contacts(bcs.cylinders, pos, r))
    if bcs.spheres is not None:
        parts.append(sphere_bc_contacts(bcs.spheres, pos, r))
    if bcs.cones is not None:
        parts.append(cone_contacts(bcs.cones, pos, r))
    if bcs.wheels is not None:
        parts.append(wheel_contacts(bcs.wheels, pos, r))
    if not parts:
        z = jnp.zeros_like(pos)
        zb = jnp.zeros((0, 3), pos.dtype)
        return z, z, bc_tan_disp, (zb, zb)

    gap = jnp.concatenate([p.gap for p in parts], axis=1)       # (N, B)
    n_into = jnp.concatenate([p.normal for p in parts], axis=1)  # (N, B, 3)
    wall_v = jnp.concatenate([p.vel for p in parts], axis=1)

    overlap = -gap
    active = overlap > 0
    # normal from particle toward wall surface = -n_into
    n = -n_into
    arm = r - 0.5 * overlap
    v_rel = wall_v - (vel[:, None, :]
                      + jnp.cross(omega[:, None, :], arm[..., None] * n))

    f_pair, xi_new, _ = _pair_force(
        params, n, overlap, v_rel, bc_tan_disp, active, kn, gn, kt, gt)

    force = jnp.sum(f_pair, axis=1)
    tau = jnp.sum(jnp.cross(arm[..., None] * n, f_pair), axis=1)

    fn_scalar = jnp.where(active, jnp.maximum(
        kn * jnp.sqrt(jnp.maximum(overlap, 0.0)) * jnp.maximum(overlap, 0.0),
        0.0), 0.0)
    if params.rolling_mode == "schwartz":
        w_rel = -omega[:, None, :]                       # walls don't spin
        w_mag = jnp.sqrt(jnp.sum(w_rel * w_rel, axis=-1) + 1e-12)
        rolling = (arm * w_mag) > 1e-4                   # dead zone (see above)
        t_roll = (params.wall_material.mu_r * arm * fn_scalar
                  / w_mag)[..., None] * w_rel
        keep = (active & rolling)[..., None]
        tau = tau + jnp.sum(jnp.where(keep, t_roll, 0.0), axis=1)
    elif params.rolling_mode == "elastic_plastic" and bc_roll_disp is not None:
        # rolling spring vs the (static) wall, plastic-capped at μ_r·Fn·arm
        xi_r = bc_roll_disp + (-omega[:, None, :]) * params.dt
        k_roll = kt * params.radius * params.radius
        t_mag = k_roll * jnp.sqrt(jnp.sum(xi_r * xi_r, axis=-1) + 1e-18)
        cap = params.wall_material.mu_r * fn_scalar * arm
        scale = jnp.minimum(1.0, cap / jnp.maximum(t_mag, 1e-18))
        xi_r = jnp.where(active[..., None], xi_r * scale[..., None], 0.0)
        tau = tau + jnp.sum(jnp.where(active[..., None], k_roll * xi_r, 0.0),
                            axis=1)
        return force, tau, xi_new, _wall_reactions(pos, arm, n, f_pair), xi_r

    return force, tau, xi_new, _wall_reactions(pos, arm, n, f_pair)
