"""Scalar-field thermal FEA on solid meshes (conduction).

Counterpart of the reference's multiphysics PDE layer
(/root/reference/src/chrono/fea/multiphysics: ChFEModelThermal — scalar
temperature field on the FEA mesh with conduction + capacity).  The field
lives on the hexa mesh of chrono_tpu.fea.solid; conduction comes from the
quadratic energy ½k∫|∇T|² dV (stiffness by autodiff — consistent with how
every mechanical element here works), capacity is lumped, and the implicit
Euler step is a matrix-free CG solve of (M/dt + K) Tⁿ⁺¹ = M/dt Tⁿ + q.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.fea.solid import SolidMesh, _dN, _G2
from chrono_tpu.solver.krylov import solve_cg


def conduction_energy(mesh: SolidMesh, T: Array, k_cond) -> Array:
    """½ k ∫ |∇T|² dV over the (reference-configuration) mesh."""
    Te = T[mesh.elems]                       # (E, 8)
    p = mesh.props

    def elem(Te_, a, b, c):
        def density(xi, eta, zeta):
            dxi, deta, dzeta = _dN(xi, eta, zeta)
            gx = jnp.dot(dxi, Te_) * (2.0 / a)
            gy = jnp.dot(deta, Te_) * (2.0 / b)
            gz = jnp.dot(dzeta, Te_) * (2.0 / c)
            return gx * gx + gy * gy + gz * gz

        U = 0.0
        for gx_ in _G2:
            for gy_ in _G2:
                for gz_ in _G2:
                    U = U + density(gx_, gy_, gz_)
        return 0.5 * k_cond * U * (a / 2) * (b / 2) * (c / 2)

    return jnp.sum(jax.vmap(elem)(Te, p.a, p.b, p.c))


def lumped_capacity(mesh: SolidMesh, n_nodes: int, rho_c) -> Array:
    """(Nn,) lumped heat capacity ρc·V/8 per corner."""
    p = mesh.props
    c_el = rho_c * p.a * p.b * p.c / 8.0
    w = jnp.zeros((n_nodes,))
    for k in range(8):
        w = w.at[mesh.elems[:, k]].add(c_el)
    return w


def make_thermal_step(mesh: SolidMesh, n_nodes: int, h: float,
                      k_cond: float, rho_c: float,
                      dirichlet_mask=None, cg_iters: int = 200,
                      tol: float = 1e-7):
    """Implicit-Euler conduction step ``step(T, q_source) -> T⁺``.

    ``dirichlet_mask``: (Nn,) bool — nodes held at their current value
    (default: the mesh's fixed nodes double as thermal Dirichlet nodes).
    """
    C = lumped_capacity(mesh, n_nodes, rho_c)
    hold = mesh.fixed if dirichlet_mask is None else jnp.asarray(
        dirichlet_mask)
    free = ~hold

    grad_U = jax.grad(lambda T: conduction_energy(mesh, T, k_cond))

    def A(T):
        # (C/h + K) with Dirichlet rows as identity
        out = C / h * T + jax.jvp(grad_U, (jnp.zeros((n_nodes,)),),
                                  (T,))[1]
        return jnp.where(free, out, T)

    @jax.jit
    def step(T, q_source):
        b = jnp.where(free, C / h * T + q_source, T)
        sol = solve_cg(A, b, x0=T, Minv=lambda r: r / (C / h + 1e-30),
                       max_iter=cg_iters, tol=tol)
        return sol.x

    return step
