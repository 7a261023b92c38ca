"""Implicit FEA dynamics: Newmark / HHT(-α) transient + static Newton solves.

Counterpart of the reference's HHT timestepper + Newton machinery
(/root/reference/src/chrono/timestepper/ChTimestepperHHT.cpp:93-213 and the
static analyses ChStaticAnalysis.cpp) for the FEA subsystem: where the
reference hand-assembles sparse K/R/M blocks and calls a sparse direct solver,
here the residual is a pure function of the acceleration unknown and the exact
Newton matrix comes from forward-mode autodiff (dense, MXU-factorized) — right
for the 10²–10⁴-DOF flexible bodies this layer targets.

Fixed DOFs are eliminated by row/col masking (identity rows), so clamps are
data, not structure.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.fea.cable import CableMesh


def _mesh_ops(mesh):
    """Dispatch element kernels by mesh type (cable / shell / solid share
    the (Nn, 6) node layout, so the whole Newton/HHT machinery is generic)."""
    from chrono_tpu.fea import (beam, bst, cable, iga, reissner, shell,
                                solid, tetra)

    if isinstance(mesh, reissner.ReissnerMesh):
        return reissner.internal_forces, reissner.mass_matrix
    if isinstance(mesh, bst.BSTMesh):
        return bst.internal_forces, bst.mass_matrix
    if isinstance(mesh, shell.ShellMesh):
        return shell.internal_forces, shell.mass_matrix
    if isinstance(mesh, solid.SolidMesh):
        return solid.internal_forces, solid.mass_matrix
    if isinstance(mesh, tetra.TetraMesh):
        return tetra.internal_forces, tetra.mass_matrix
    if isinstance(mesh, beam.BeamMesh):
        return beam.internal_forces, beam.mass_matrix
    if isinstance(mesh, iga.IGABeamMesh):
        return iga.internal_forces, iga.mass_matrix
    return cable.internal_forces, cable.mass_matrix


def internal_forces(mesh, q):
    return _mesh_ops(mesh)[0](mesh, q)


def mass_matrix(mesh, n_nodes):
    return _mesh_ops(mesh)[1](mesh, n_nodes)


class FEAStepOut(NamedTuple):
    q: Array
    qd: Array
    qdd: Array
    iterations: Array
    residual: Array


def _fixed_dof_mask(mesh, n_nodes: int) -> Array:
    from chrono_tpu.fea import bst, solid, tetra

    fx = mesh.fixed
    m = fx.reshape(-1) if fx.ndim == 2 else jnp.repeat(fx, 6)
    if isinstance(mesh, (solid.SolidMesh, tetra.TetraMesh, bst.BSTMesh)):
        # solid nodes carry translations only: directors are inert DOFs and
        # must be masked (their energy gradient is identically zero)
        m = m.reshape(n_nodes, 6).at[:, 3:6].set(True).reshape(-1)
    return m


def _masked_solve(J, r, free):
    """Solve J Δ = r on free DOFs (fixed rows/cols → identity)."""
    nd = r.shape[0]
    Jm = jnp.where(free[:, None] & free[None, :], J, 0.0)
    Jm = Jm + jnp.diag(jnp.where(free, 0.0, 1.0))
    rm = jnp.where(free, r, 0.0)
    return jnp.linalg.solve(Jm, rm)


def make_force_fn(mesh: CableMesh, n_nodes: int):
    """Returns f(q_flat, qd_flat) = internal + Rayleigh damping forces."""
    if hasattr(mesh, "props"):
        beta_k = jnp.mean(mesh.props.damping)
    else:                       # BST / IGA meshes carry damping directly
        beta_k = jnp.mean(mesh.damping)

    def f_int(q_flat):
        return internal_forces(mesh, q_flat.reshape(n_nodes, 6)).reshape(-1)

    def force(q_flat, qd_flat):
        fi = f_int(q_flat)
        # stiffness-proportional damping: β_K · (∂f_int/∂q) · v  (= −β_K K v)
        _, fd = jax.jvp(f_int, (q_flat,), (qd_flat,))
        return fi + beta_k * fd

    return force


def static_solve(mesh: CableMesh, q0: Array, f_ext: Array,
                 n_load_steps: int = 5, newton_iters: int = 20,
                 tol: float = 1e-6) -> Array:
    """Nonlinear static equilibrium with load continuation
    (reference ChStaticNonLinearAnalysis)."""
    n_nodes = q0.shape[0]
    free = ~_fixed_dof_mask(mesh, n_nodes)
    fe = f_ext.reshape(-1)

    def f_int(q_flat):
        return internal_forces(mesh, q_flat.reshape(n_nodes, 6)).reshape(-1)

    jac = jax.jacfwd(f_int)

    def newton(q_flat, load):
        def body(carry):
            q, k, res = carry
            r = f_int(q) + load * fe
            J = jac(q)
            dq = _masked_solve(-J, r, free)
            q = q + dq
            res = jnp.linalg.norm(jnp.where(free, f_int(q) + load * fe, 0.0))
            return (q, k + 1, res)

        def cond(carry):
            _, k, res = carry
            return (k < newton_iters) & (res > tol)

        q, _, _ = lax.while_loop(cond, body,
                                 (q_flat, jnp.zeros((), jnp.int32),
                                  jnp.asarray(jnp.inf, q_flat.dtype)))
        return q

    q = q0.reshape(-1)
    for k in range(1, n_load_steps + 1):
        q = newton(q, k / n_load_steps)
    return q.reshape(n_nodes, 6)


def make_hht_step(mesh: CableMesh, n_nodes: int, h: float,
                  alpha: float = -0.2, newton_iters: int = 10,
                  tol: float = 1e-5, f_state_fn=None,
                  linear_solver: str = "dense", krylov_iters: int = 200,
                  krylov_tol: float = 1e-7, precond: str = "mass",
                  lumped_mass: bool = False):
    """Build a jitted HHT-α step (α ∈ [-1/3, 0]; α=0 → Newmark trapezoidal).

    Unknown = end-of-step acceleration; exact Newton matrix by autodiff.
    Returns ``step(q, qd, qdd, f_ext) -> FEAStepOut``.

    ``f_state_fn(q (Nn,6), qd (Nn,6)) -> (Nn,6)``: optional state-dependent
    load (e.g. node-cloud penalty contact, fea.contact) evaluated INSIDE the
    residual, so Newton sees its exact tangent.

    ``linear_solver``: "dense" (autodiff Jacobian + LU — right at 10²–10⁴
    DOF) or a matrix-free Krylov engine over JVPs — "cg" (symmetric
    tangents: conservative elements + structural damping) or "bicgstab"
    (nonsymmetric, e.g. friction contact loads).  The Krylov path never
    materializes J — the reference's large-FEA route (MINRES/GMRES over
    ChSystemDescriptor::SystemProduct, ChIterativeSolverLS.h:108) with the
    SPMV replaced by an autodiff Jacobian-vector product.

    ``precond`` (Krylov path): "mass" (inverse mass diagonal) or "block"
    (node-block Jacobi — the 6x6 diagonal blocks of the Newton matrix,
    estimated by 6 block-probing JVPs per Newton iteration, batch-inverted
    on the MXU; the TPU answer to the reference's sparse-ILU/diagonal
    preconditioner menu, ChIterativeSolverLS.h:61-66.  Probing seeds every
    node simultaneously, so neighbor columns alias into the block — exact
    for the mass term, approximate for the stiffness coupling — which is
    the usual probing trade: a 2-5x iteration cut for 6 extra JVPs).
    """
    beta = (1.0 - alpha) ** 2 / 4.0
    gamma = 0.5 - alpha
    if lumped_mass:
        # diagonal (HRZ-lumped) mass: the (6Nn)² consistent matrix is never
        # built — required at 10k+ DOF where dense M alone is ~GB-scale
        from chrono_tpu.fea import shell as _shell
        if not isinstance(mesh, _shell.ShellMesh):
            raise NotImplementedError("lumped_mass: shell meshes only")
        mdiag = _shell.mass_diag_lumped(mesh, n_nodes)
        Mmul = lambda a: mdiag * a                       # noqa: E731
        diagM = mdiag
    else:
        M = mass_matrix(mesh, n_nodes)
        Mmul = lambda a: M @ a                           # noqa: E731
        diagM = jnp.diag(M)
    free = ~_fixed_dof_mask(mesh, n_nodes)
    force = make_force_fn(mesh, n_nodes)
    if f_state_fn is not None:
        _inner = force

        def force(q_flat, qd_flat, _inner=_inner):
            extra = f_state_fn(q_flat.reshape(n_nodes, 6),
                               qd_flat.reshape(n_nodes, 6)).reshape(-1)
            return _inner(q_flat, qd_flat) + extra

    def residual(a_new, q, qd, qdd, fe):
        q_new = q + h * qd + h * h * ((0.5 - beta) * qdd + beta * a_new)
        v_new = qd + h * ((1.0 - gamma) * qdd + gamma * a_new)
        F_new = force(q_new, v_new) + fe
        F_old = force(q, qd) + fe
        return (Mmul(a_new) - (1.0 + alpha) * F_new + alpha * F_old,
                (q_new, v_new))

    res_only = lambda a, *args: residual(a, *args)[0]
    jac = jax.jacfwd(res_only)
    if linear_solver != "dense":
        from chrono_tpu.solver import krylov
        dinv_m = 1.0 / jnp.maximum(diagM, 1e-12)
        ksolve = {"cg": krylov.solve_cg,
                  "bicgstab": krylov.solve_bicgstab}[linear_solver]

    @jax.jit
    def step(q, qd, qdd, f_ext) -> FEAStepOut:
        qf, vf, af = q.reshape(-1), qd.reshape(-1), qdd.reshape(-1)
        fe = f_ext.reshape(-1)

        def body(carry):
            a, k, res = carry
            r, _ = residual(a, qf, vf, af, fe)
            if linear_solver == "dense":
                J = jac(a, qf, vf, af, fe)
                da = _masked_solve(-J, r, free)
            else:
                def Av(v):
                    vm = jnp.where(free, v, 0.0)
                    jv = jax.jvp(lambda aa: res_only(aa, qf, vf, af, fe),
                                 (a,), (vm,))[1]
                    return jnp.where(free, jv, v)
                if precond == "block":
                    # 6x6 node-block diagonal by probing: seed e_k on every
                    # node at once -> column k of every diagonal block
                    cols = [Av(jnp.tile(jnp.eye(6, dtype=qf.dtype)[k],
                                        n_nodes))
                            for k in range(6)]
                    B = jnp.stack([c.reshape(n_nodes, 6) for c in cols],
                                  axis=2)                 # (Nn, 6, 6)
                    B = 0.5 * (B + jnp.swapaxes(B, 1, 2))  # SPD-ify for CG
                    fb = free.reshape(n_nodes, 6).astype(qf.dtype)
                    mask2 = fb[:, :, None] * fb[:, None, :]
                    eye = jnp.eye(6, dtype=qf.dtype)
                    B = B * mask2 + eye * (1.0 - fb[:, :, None] * eye)
                    B = B + 1e-8 * eye * jnp.maximum(
                        jnp.abs(B).max(axis=(1, 2), keepdims=True), 1.0)
                    Binv = jnp.linalg.inv(B)

                    def Minv(x, Binv=Binv):
                        return jnp.einsum(
                            "nij,nj->ni", Binv,
                            x.reshape(n_nodes, 6)).reshape(-1)
                else:
                    def Minv(x):
                        return dinv_m * x
                sol = ksolve(Av, -jnp.where(free, r, 0.0), Minv=Minv,
                             max_iter=krylov_iters, tol=krylov_tol)
                da = jnp.where(free, sol.x, 0.0)
            a = a + da
            res = jnp.linalg.norm(jnp.where(free, residual(a, qf, vf, af,
                                                           fe)[0], 0.0))
            return (a, k + 1, res)

        def cond(carry):
            _, k, res = carry
            return (k < newton_iters) & (res > tol)

        a0 = jnp.where(free, af, 0.0)
        a, iters, res = lax.while_loop(
            cond, body, (a0, jnp.zeros((), jnp.int32),
                         jnp.asarray(jnp.inf, qf.dtype)))
        _, (q_new, v_new) = residual(a, qf, vf, af, fe)
        q_new = jnp.where(free, q_new, qf)
        v_new = jnp.where(free, v_new, 0.0)
        a = jnp.where(free, a, 0.0)
        return FEAStepOut(q=q_new.reshape(n_nodes, 6),
                          qd=v_new.reshape(n_nodes, 6),
                          qdd=a.reshape(n_nodes, 6),
                          iterations=iters, residual=res)

    return step


def gravity_loads(mesh: CableMesh, n_nodes: int, g) -> Array:
    """Consistent gravity load vector (lumped to position DOFs)."""
    # lumped: each element contributes ρA·L/2 to each node's translation
    w = jnp.zeros((n_nodes,))
    half = mesh.props.rhoA * mesh.props.L * 0.5
    w = w.at[mesh.elems[:, 0]].add(half)
    w = w.at[mesh.elems[:, 1]].add(half)
    f = jnp.zeros((n_nodes, 6))
    f = f.at[:, 0:3].set(w[:, None] * jnp.asarray(g)[None, :])
    return f
