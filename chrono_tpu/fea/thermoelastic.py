"""Thermo-elastic coupling on solid meshes (multiphysics PDE layer).

Role of the reference's thermo-deformation multiphysics
(/root/reference/src/chrono/fea/multiphysics — scalar thermal field PDE
coupled into the structural problem): the temperature field from
``fea/thermal.py`` enters the hexahedral SVK energy as a thermal eigenstrain
ε_th = α (T − T_ref) I, and the mechanical strain E_m = E_gl − ε_th drives
the stress.  Forces stay pure autodiff (−∂U/∂q), so the coupled tangent is
exact for the statics Newton."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.fea.solid import SolidMesh, _N, _dN, _G2


def element_energy_thermal(q_elem, q0_elem, T_elem, a, b, c, E, nu,
                           alpha, T_ref):
    """SVK strain energy with thermal eigenstrain; T_elem (8,) nodal."""
    u = q_elem[:, 0:3] - q0_elem[:, 0:3]
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))

    def density(xi, eta, zeta):
        dxi, deta, dzeta = _dN(xi, eta, zeta)
        hx = (dxi[:, None] * u).sum(0) * (2.0 / a)
        hy = (deta[:, None] * u).sum(0) * (2.0 / b)
        hz = (dzeta[:, None] * u).sum(0) * (2.0 / c)
        H = jnp.stack([hx, hy, hz], axis=1)
        Egl = 0.5 * (H + H.T + H.T @ H)
        dT = jnp.sum(_N(xi, eta, zeta) * T_elem) - T_ref
        Em = Egl - alpha * dT * jnp.eye(3, dtype=Egl.dtype)
        tr = jnp.trace(Em)
        return 0.5 * lam * tr * tr + mu * jnp.sum(Em * Em)

    U = 0.0
    for gx in _G2:
        for gy in _G2:
            for gz in _G2:
                U = U + density(gx, gy, gz)
    return U * (a / 2) * (b / 2) * (c / 2)


def thermoelastic_energy(mesh: SolidMesh, q: Array, T: Array, alpha,
                         T_ref=0.0) -> Array:
    qe = q[mesh.elems]
    q0e = mesh.q0[mesh.elems]
    Te = T[mesh.elems]
    p = mesh.props
    return jnp.sum(jax.vmap(
        lambda qq, q0, tt, a, b, c, E, nu: element_energy_thermal(
            qq, q0, tt, a, b, c, E, nu, alpha, T_ref)
    )(qe, q0e, Te, p.a, p.b, p.c, p.E, p.nu))


def thermoelastic_forces(mesh: SolidMesh, q: Array, T: Array, alpha,
                         T_ref=0.0) -> Array:
    """−∂U/∂q with the thermal eigenstrain (Nn, 6)."""
    return -jax.grad(
        lambda qq: thermoelastic_energy(mesh, qq, T, alpha, T_ref))(q)


def thermoelastic_static_solve(mesh: SolidMesh, q0: Array, T: Array, alpha,
                               T_ref=0.0, fixed=None, n_iters=8,
                               f_ext=None):
    """Newton statics under a (given) temperature field — one-way coupled
    thermo-deformation (solve the thermal PDE first with fea.thermal,
    then deform).  ``fixed``: (Nn,) bool — fully clamped nodes."""
    n = q0.shape[0]
    if fixed is None:
        fixed = jnp.zeros((n,), bool)
    free = (~fixed)[:, None] & jnp.asarray([True] * 3 + [False] * 3)[None, :]
    freef = free.reshape(-1)

    def resid(qf):
        qq = jnp.where(free, qf.reshape(n, 6), q0)
        r = thermoelastic_forces(mesh, qq, T, alpha, T_ref)
        if f_ext is not None:
            r = r + f_ext
        return jnp.where(free, r, 0.0).reshape(-1)

    q = q0.reshape(-1)
    eye = jnp.eye(6 * n, dtype=q0.dtype)
    for _ in range(n_iters):
        r = resid(q)
        J = jax.jacfwd(resid)(q)
        J = jnp.where(jnp.outer(freef, freef), J,
                      eye * jnp.where(freef, 0.0, 1.0)[:, None])
        q = q + jnp.linalg.solve(J, -r) * freef
    return jnp.where(free, q.reshape(n, 6), q0)
