"""ISPH: implicit (incompressible) SPH via pressure projection.

TPU-native counterpart of the reference's implicit SPH path
(/root/reference/src/chrono_fsi/sph/physics/SphForceISPH.cu — V_star_Predictor
:253, Pressure_Equation :447, Velocity_Correction_and_update :625, with the
Krylov solvers of sph/math/SphLinearSolver{BiCGStab,GMRES}.cpp).  Where the
reference assembles a CSR matrix on device and runs a standalone solver, here
the pressure Poisson equation stays MATRIX-FREE: the Laplacian is a masked
(N, K) gather-reduce over the shared neighbor list, solved with the in-program
CG of chrono_tpu.solver.krylov — the whole projection step is one fused XLA
program.

Scheme (projection / Chorin splitting with density-invariance source):

    1. predictor:   v* = v + dt (viscous + gravity + external)
    2. PPE:         −∇²p = −(ρ0/dt) ∇·v*  − β (ρ0 − ρ_sum)/dt²
                    solved over ALL markers (walls included ⇒ symmetric
                    Neumann graph-Laplacian; small diagonal α pins the
                    nullspace)
    3. correction:  v⁺ = v* − (dt/ρ0) ∇p ;  x += dt v⁺ (+ XSPH shift)

The incompressible branch removes the acoustic CFL bound: dt is limited only
by advection and viscous diffusion (see ``suggest_isph_dt``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from chrono_tpu.collision.cell_list import GridSpec, min_image, wrap_positions
from chrono_tpu.fsi.sph.state import SPHParams, SPHState, FLUID
from chrono_tpu.fsi.sph.kernels import KERNELS, grad_w
from chrono_tpu.fsi.sph import wcsph
from chrono_tpu.solver.krylov import solve_cg, solve_bicgstab


def _pair_geometry(params: SPHParams, grid: GridSpec, pos, nbr_idx, nbr_valid):
    _, dw_fn, _ = KERNELS[params.kernel]
    j = jnp.maximum(nbr_idx, 0)
    d = min_image(grid, pos[:, None, :] - pos[j])     # x_i − x_j
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(r2 + 1e-12)
    gw = grad_w(dw_fn, d, r, params.h)                # ∇_i W_ij
    return j, d, r2, gw


def viscous_predictor(params: SPHParams, grid: GridSpec, pos, vel, rho, kind,
                      nbr_idx, nbr_valid, body_acc=None):
    """v* rate: Morris laminar viscosity (Adami no-slip ghosts) + gravity.

    Solid markers keep their prescribed velocity (not integrated).
    """
    m = wcsph.particle_mass(params)
    is_fluid = kind == FLUID
    _, _, v_bc = wcsph.adami_bc(params, grid, pos, vel, rho, kind,
                                nbr_idx, nbr_valid, body_acc)
    j, d, r2, gw = _pair_geometry(params, grid, pos, nbr_idx, nbr_valid)
    rho_i = rho[:, None]
    rho_j = rho[j]
    v_ij = vel[:, None, :] - jnp.where(is_fluid[j][..., None], vel[j], v_bc[j])
    coef = m * 2.0 * params.mu / (rho_i * rho_j) * jnp.sum(d * gw, axis=-1) \
        / (r2 + 0.01 * params.h ** 2)
    dv = jnp.sum(jnp.where(nbr_valid[..., None], coef[..., None] * v_ij, 0.0),
                 axis=1)
    dv = dv + params.gravity[None, :]
    return jnp.where(is_fluid[:, None], dv, 0.0)


def isph_substep(params: SPHParams, grid: GridSpec, state: SPHState,
                 body_acc=None, beta_density: float = 0.5,
                 cg_iters: int = 200, cg_tol: float = 1e-5,
                 clamp_tensile: bool = True, linear_solver: str = "cg"):
    """One projection step.  Returns (state⁺, pressure, cg_iterations)."""
    h_dt = params.dt
    m = wcsph.particle_mass(params)
    is_fluid = (state.kind == FLUID)
    pos, vel, rho, kind = state.pos, state.vel, state.rho, state.kind
    nbr_idx, nbr_valid = state.nbr.idx, state.nbr.valid

    # 1. predictor (reference V_star_Predictor)
    dv_visc = viscous_predictor(params, grid, pos, vel, rho, kind,
                                nbr_idx, nbr_valid, body_acc)
    v_star = jnp.where(is_fluid[:, None], vel + h_dt * dv_visc, vel)

    # 2. PPE (reference Pressure_Equation + Krylov solve)
    j, d, r2, gw = _pair_geometry(params, grid, pos, nbr_idx, nbr_valid)
    rho0 = params.rho0
    # divergence of v* (walls carry their prescribed velocity)
    div = -(m / rho0) * jnp.sum(
        jnp.where(nbr_valid,
                  jnp.sum((v_star[:, None, :] - v_star[j]) * gw, axis=-1),
                  0.0), axis=1)
    # density-invariance source from summation density (fluid only).
    # Only genuine COMPRESSION is penalized: free-surface particles have a
    # support deficit (ρ_sum < ρ0) that is not compression, and the 1/dt²
    # scaling would turn it into an enormous spurious sink.  Compression is
    # also capped at 5 % so one bad sample cannot destabilize the solve.
    rho_sum = wcsph.summation_density(params, grid, pos, kind,
                                      nbr_idx, nbr_valid)
    compression = jnp.clip(rho_sum - rho0, 0.0, 0.05 * rho0)
    src_rho = jnp.where(is_fluid, beta_density * compression
                        / (h_dt * h_dt), 0.0)
    b = -(rho0 / h_dt) * div + src_rho

    # Free surface = Dirichlet p=0 (standard ISPH): fluid particles with a
    # support deficit are pinned to zero pressure, which absorbs the net flux
    # injected by wall sheets and makes the operator nonsingular.  Fully
    # confined flows (no surface detected) fall back to the pure-Neumann
    # operator with a range-projected rhs (the pressure level is then gauge).
    has_nbr = jnp.any(nbr_valid, axis=1)
    n_act = jnp.maximum(jnp.sum(has_nbr), 1)
    # 0.88: low enough that particle disorder (summation density dips to
    # ~0.93 ρ0 in settled interiors) is not mistaken for a free surface
    surface = is_fluid & (rho_sum < 0.88 * rho0)
    n_surf = jnp.sum(surface)
    confined = (n_surf == 0).astype(b.dtype)
    interior = has_nbr & ~surface
    b = jnp.where(interior, b, 0.0)
    b = b - confined * jnp.sum(b) / n_act

    # Laplacian weights c_ij = −(2 m/ρ0)(d·∇W)/(r²+ηh²) ≥ 0
    coeffs = -(2.0 * m / rho0) * jnp.sum(d * gw, axis=-1) / (
        r2 + 0.01 * params.h ** 2)
    row_sum = jnp.sum(jnp.where(nbr_valid, coeffs, 0.0), axis=1)
    # α pins pinned/isolated rows; it must stay far below the physical
    # eigenvalues or the Laplacian turns into a screened (Helmholtz) operator
    # whose pressure decays exponentially instead of hydrostatically
    alpha = 1e-8 * jnp.sum(row_sum) / n_act + 1e-20
    j_nbr = jnp.maximum(nbr_idx, 0)
    int_j = interior[j_nbr]
    scale = jnp.sum(row_sum) / n_act + alpha

    def A(pv):
        # Dirichlet rows: p_i (scaled); interior rows: Laplacian with
        # surface-neighbor pressures eliminated (= 0)
        diff = pv[:, None] - jnp.where(int_j, pv[j_nbr], 0.0)
        lap = jnp.sum(jnp.where(nbr_valid, coeffs * diff, 0.0),
                      axis=1) + alpha * pv
        return jnp.where(interior, lap, scale * pv)

    diag = jnp.where(interior, row_sum + alpha, scale)
    dinv = 1.0 / jnp.maximum(diag, 1e-30)
    # solver menu mirrors the reference's SphLinearSolver{BiCGStab,GMRES}
    # (+ Jacobi-preconditioned CG, the symmetric default)
    solve = {"cg": solve_cg, "bicgstab": solve_bicgstab}[linear_solver]
    sol = solve(A, b, Minv=lambda r_: dinv * r_, max_iter=cg_iters,
                tol=cg_tol)
    p = sol.x
    # pure-Neumann gauge: shift so min p = 0 (no-op when a surface exists)
    p_min = jnp.min(jnp.where(has_nbr, p, jnp.inf))
    p = jnp.where(has_nbr, p - confined * p_min, 0.0)
    if clamp_tensile:
        p = jnp.maximum(p, 0.0)

    # 3. correction (reference Velocity_Correction_and_update)
    pterm = (p[:, None] + p[j]) / (rho0 * rho0)
    dv_p = -jnp.sum(jnp.where(nbr_valid[..., None],
                              (m * pterm)[..., None] * gw, 0.0), axis=1)
    v_new = jnp.where(is_fluid[:, None], v_star + h_dt * dv_p, vel)

    vt = wcsph.xsph_velocity(params, grid, pos, v_new, rho, kind,
                             nbr_idx, nbr_valid)
    pos_new = jnp.where(is_fluid[:, None], pos + h_dt * vt, pos)
    pos_new = wrap_positions(grid, pos_new)

    # incompressible: ρ stays at ρ0 (ρ_sum only feeds the PPE source term)
    new_state = state.replace(pos=pos_new, vel=v_new,
                              time=state.time + h_dt)
    return new_state, p, sol.iterations


def make_isph_advance_fn(params: SPHParams, grid: GridSpec,
                         beta_density: float = 0.5, cg_iters: int = 200,
                         cg_tol: float = 1e-5, clamp_tensile: bool = True,
                         linear_solver: str = "cg"):
    """Jitted ``advance(state, n_cycles) -> (state, overflow, cg_iters)``."""
    from chrono_tpu.fsi.sph.system import rebuild_sph_neighbors

    def one_cycle(state, _):
        state = rebuild_sph_neighbors(params, grid, state)

        def inner(st, __):
            st2, _, iters = isph_substep(params, grid, st, None,
                                         beta_density, cg_iters, cg_tol,
                                         clamp_tensile, linear_solver)
            return st2, iters

        state, iters = lax.scan(inner, state, None,
                                length=params.rebuild_every)
        return state, (state.nbr.overflow, iters.max())

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state, n_cycles: int):
        state, (overflows, iters) = lax.scan(one_cycle, state, None,
                                             length=n_cycles)
        return state, overflows.max(), iters.max()

    return advance


def suggest_isph_dt(params: SPHParams, v_max: float = 1.0,
                    safety: float = 0.25) -> float:
    """Advective + viscous + body-force bounds — NO acoustic term (the whole
    point of the implicit pressure solve; reference SphFluidDynamics.cu:93
    keeps c_s in the bound only for the explicit schemes)."""
    h = float(params.h)
    dt_adv = h / max(v_max, 1e-9)
    mu = float(params.mu)
    rho = float(params.rho0)
    dt_visc = 0.125 * h * h * rho / max(mu, 1e-12)
    g = float(np.linalg.norm(np.asarray(params.gravity)))
    dt_g = np.sqrt(h / max(g, 1e-12))
    return safety * min(dt_adv, dt_visc, dt_g)


def isph_solid_reaction(params: SPHParams, grid: GridSpec, state: SPHState,
                        p: Array):
    """Fluid reaction acceleration at SOLID markers from the PPE pressure
    (the ISPH counterpart of the WCSPH solid dv/dt used by the BCE force
    reduction): symmetric pressure gradient + Morris viscous term evaluated
    at the solid markers (reference SphForceISPH + CalcRigidForces_D)."""
    m = wcsph.particle_mass(params)
    is_fluid = state.kind == FLUID
    pos, vel, rho = state.pos, state.vel, state.rho
    nbr_idx, nbr_valid = state.nbr.idx, state.nbr.valid
    _, _, v_bc = wcsph.adami_bc(params, grid, pos, vel, rho, state.kind,
                                nbr_idx, nbr_valid)
    j, d, r2, gw = _pair_geometry(params, grid, pos, nbr_idx, nbr_valid)
    rho0 = params.rho0
    pterm = (p[:, None] + p[j]) / (rho0 * rho0)
    dv = -jnp.sum(jnp.where(nbr_valid[..., None],
                            (m * pterm)[..., None] * gw, 0.0), axis=1)
    v_ij = vel[:, None, :] - jnp.where(is_fluid[j][..., None], vel[j],
                                       v_bc[j])
    coef = m * 2.0 * params.mu / (rho0 * rho0) * jnp.sum(d * gw, axis=-1) \
        / (r2 + 0.01 * params.h ** 2)
    dv = dv + jnp.sum(jnp.where(nbr_valid[..., None],
                                coef[..., None] * v_ij, 0.0), axis=1)
    return dv
