"""Matrix-free Schur-complement machinery over constraint rows.

TPU-native replacement for the reference descriptor's ``SchurComplementProduct``
(/root/reference/src/chrono/solver/ChSystemDescriptor.cpp:519): where the reference
loops over constraint objects accumulating ``q += M⁻¹ Cqᵀ λ`` per body, here the
operator ``N·γ = D M⁻¹ Dᵀ γ`` is three fused batched steps:

    1. scatter:  per-row impulse ``J·γ`` summed into per-body 6-vectors
       (``segment_sum``-style ``at[].add`` — XLA lowers this to sorted scatter);
    2. scale:    per-body ``M⁻¹`` (diagonal mass, diagonal body-frame inertia);
    3. gather:   per-row ``J · u`` dot products.

All rows (bilateral joints, motors, contact normal/tangential triples) share this
path, so one solver covers the whole mixed cone-complementarity problem.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.physics.body import BodyProps
from chrono_tpu.physics.constraints import ConstraintRows


def apply_DT(rows: ConstraintRows, gamma: Array, n_bodies: int):
    """``Dᵀ γ``: per-body generalized impulses (f_world (N,3), tau_local (N,3))."""
    g = jnp.where(rows.active, gamma, 0.0)[:, None]
    f = jnp.zeros((n_bodies, 3), gamma.dtype)
    tau = jnp.zeros((n_bodies, 3), gamma.dtype)
    f = f.at[rows.body_a].add(rows.Ja_v * g).at[rows.body_b].add(rows.Jb_v * g)
    tau = tau.at[rows.body_a].add(rows.Ja_w * g).at[rows.body_b].add(rows.Jb_w * g)
    tau = tau.at[rows.body_c].add(rows.Jc_w * g)
    return f, tau


def apply_Minv(props: BodyProps, f: Array, tau: Array):
    """Block-diagonal ``M⁻¹``: (N,3)×2 → velocity-space (dv, dw)."""
    return f * props.inv_mass[:, None], tau * props.inv_inertia


def apply_D(rows: ConstraintRows, v: Array, w: Array) -> Array:
    """``D u``: per-row constraint-space velocities (M,)."""
    out = (
        jnp.sum(rows.Ja_v * v[rows.body_a], axis=-1)
        + jnp.sum(rows.Ja_w * w[rows.body_a], axis=-1)
        + jnp.sum(rows.Jb_v * v[rows.body_b], axis=-1)
        + jnp.sum(rows.Jb_w * w[rows.body_b], axis=-1)
        + jnp.sum(rows.Jc_w * w[rows.body_c], axis=-1)
    )
    return jnp.where(rows.active, out, 0.0)


def schur_product(rows: ConstraintRows, props: BodyProps, gamma: Array) -> Array:
    """``N γ = D M⁻¹ Dᵀ γ`` (matrix-free)."""
    n = props.inv_mass.shape[0]
    f, tau = apply_DT(rows, gamma, n)
    dv, dw = apply_Minv(props, f, tau)
    return apply_D(rows, dv, dw)


def schur_rhs(rows: ConstraintRows, v_free: Array, w_free: Array) -> Array:
    """Right-hand side of the velocity-level VI:  ``r = D v_free - b``.

    ``v_free = v + h M⁻¹ f`` is the unconstrained velocity after applied forces;
    ``b = rows.rhs`` carries stabilization and motor set-points.  The VI solved is
    find γ ∈ K: ``(N γ + r)ᵀ (γ' - γ) ≥ 0 ∀ γ' ∈ K``, so at the solution
    ``D v⁺ = b`` on the active set.
    """
    return jnp.where(rows.active, apply_D(rows, v_free, w_free) - rows.rhs, 0.0)


def velocity_update(rows: ConstraintRows, props: BodyProps, gamma: Array,
                    v_free: Array, w_free: Array):
    """Final velocities ``u⁺ = u_free + M⁻¹ Dᵀ γ`` → (v (N,3), w_local (N,3))."""
    n = props.inv_mass.shape[0]
    f, tau = apply_DT(rows, gamma, n)
    dv, dw = apply_Minv(props, f, tau)
    return v_free + dv, w_free + dw


def diag_N(rows: ConstraintRows, props: BodyProps) -> Array:
    """Diagonal of N (per-row ``J M⁻¹ Jᵀ``) for Jacobi/PSOR preconditioning.

    Exact: diagonal entries don't couple rows, so computed row-locally.
    """
    ima = props.inv_mass[rows.body_a][:, None]
    imb = props.inv_mass[rows.body_b][:, None]
    iia = props.inv_inertia[rows.body_a]
    iib = props.inv_inertia[rows.body_b]
    d = (
        jnp.sum(rows.Ja_v**2 * ima, axis=-1)
        + jnp.sum(rows.Ja_w**2 * iia, axis=-1)
        + jnp.sum(rows.Jb_v**2 * imb, axis=-1)
        + jnp.sum(rows.Jb_w**2 * iib, axis=-1)
        + jnp.sum(rows.Jc_w**2 * props.inv_inertia[rows.body_c], axis=-1)
    )
    return jnp.where(rows.active, d, 1.0)


def dense_D(rows: ConstraintRows, n_bodies: int) -> Array:
    """Assemble the dense Jacobian D (M, 6N) for the direct solver path.

    Layout: body u = [v (world), w (local)] interleaved per body.  Only used for
    small bilateral-only systems where a dense MXU factorization wins over
    iteration (the reference's direct-LS path, ChSystemDescriptor.h:367).
    """
    m = rows.m
    D = jnp.zeros((m, n_bodies, 6), rows.Ja_v.dtype)
    r = jnp.arange(m)
    mask = rows.active[:, None]
    D = D.at[r, rows.body_a, 0:3].add(jnp.where(mask, rows.Ja_v, 0.0))
    D = D.at[r, rows.body_a, 3:6].add(jnp.where(mask, rows.Ja_w, 0.0))
    D = D.at[r, rows.body_b, 0:3].add(jnp.where(mask, rows.Jb_v, 0.0))
    D = D.at[r, rows.body_b, 3:6].add(jnp.where(mask, rows.Jb_w, 0.0))
    D = D.at[r, rows.body_c, 3:6].add(jnp.where(mask, rows.Jc_w, 0.0))
    return D.reshape(m, n_bodies * 6)
