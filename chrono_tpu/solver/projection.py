"""Projection operators onto the feasible multiplier set.

Vectorized friction-cone projection in the spirit of the reference's
per-contact ``Project`` (/root/reference/src/chrono/solver/
ChConstraintContactNormal.cpp:47, Anitescu–Tasora cone projection), applied to
all contacts at once on the VPU instead of a per-constraint loop.

Multiplier layout used by the mixed solvers:
``gamma = [gamma_bilateral (Mb,), gamma_contact (3·Mc,)]`` with contact triples
``(γ_n, γ_u, γ_v)`` contiguous.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def project_friction_cone(gc: Array, mu: Array, eps: float = 1e-12) -> Array:
    """Project contact triples onto the Coulomb cone ``|γ_t| ≤ μ γ_n``.

    gc: (Mc, 3) triples, mu: (Mc,). Three regimes (Anitescu–Tasora):
      inside the cone        → unchanged
      inside the polar cone  → zero
      otherwise              → closest point on the cone surface
    Frictionless (μ=0) degenerates to ``γ_n ← max(γ_n, 0), γ_t ← 0``.
    """
    gn = gc[:, 0]
    gt = gc[:, 1:]
    tnorm = jnp.sqrt(jnp.sum(gt * gt, axis=-1) + eps)

    inside = tnorm <= mu * gn
    in_polar = mu * tnorm <= -gn

    # projection onto the cone surface
    gn_s = (tnorm * mu + gn) / (mu * mu + 1.0)
    gn_s = jnp.maximum(gn_s, 0.0)
    scale_t = mu * gn_s / tnorm
    gn_new = jnp.where(inside, gn, jnp.where(in_polar, 0.0, gn_s))
    t_scale = jnp.where(inside, 1.0, jnp.where(in_polar, 0.0, scale_t))
    return jnp.concatenate([gn_new[:, None], gt * t_scale[:, None]], axis=-1)


def make_projector(n_bilateral: int, n_contacts: int, mu: Array | None,
                   n_rolling: int = 0, mu_roll=0.0, mu_spin=0.0):
    """Build ``project(gamma) -> gamma`` for the mixed multiplier vector.

    Bilateral rows are unconstrained (equality constraints, free multiplier);
    the next ``3·n_contacts`` entries are cone-projected per (n, u, v)
    triple.  With ``n_rolling = n_contacts`` a trailing block of 3-row
    rolling triples ``(τ_spin, τ_u, τ_v)`` is projected onto the
    spinning/rolling friction cones against the SAME normal multiplier,
    updating it — the reference's ChConstraintRollingNormal::Project
    (/root/reference/src/chrono/solver/ChConstraintRollingNormal.cpp:46):
    spinning cone first, rolling cone second, each the Anitescu–Tasora
    generator projection (identical algebra to the sliding cone with the
    torque in the tangential role; μ_roll/μ_spin carry length units —
    torque limit = μ·γ_n).
    """
    if n_contacts == 0:
        return lambda g: g

    def project(gamma: Array) -> Array:
        gb = gamma[:n_bilateral]
        gc = gamma[n_bilateral:n_bilateral + 3 * n_contacts].reshape(
            n_contacts, 3)
        gc = project_friction_cone(gc, mu)
        if n_rolling == 0:
            return jnp.concatenate([gb, gc.reshape(-1)])
        gr = gamma[n_bilateral + 3 * n_contacts:].reshape(n_rolling, 3)
        gn = gc[:, 0]
        # spinning cone on (γ_n, τ_spin)
        zero = jnp.zeros_like(gn)
        sp = project_friction_cone(
            jnp.stack([gn, gr[:, 0], zero], axis=1),
            jnp.full_like(gn, mu_spin))
        gn, t_spin = sp[:, 0], sp[:, 1]
        # rolling cone on (γ_n, τ_u, τ_v)
        rl = project_friction_cone(
            jnp.concatenate([gn[:, None], gr[:, 1:3]], axis=1),
            jnp.full_like(gn, mu_roll))
        gn, t_uv = rl[:, 0], rl[:, 1:3]
        gc = jnp.concatenate([gn[:, None], gc[:, 1:3]], axis=1)
        gr = jnp.concatenate([t_spin[:, None], t_uv], axis=1)
        return jnp.concatenate([gb, gc.reshape(-1), gr.reshape(-1)])

    return project
