"""WCSPH right-hand side: continuity + momentum with Adami boundary treatment.

TPU-native re-design of the reference's WCSPH force kernel
(/root/reference/src/chrono_fsi/sph/physics/SphForceWCSPH.cu: CfdAdamiBC :723,
CfdRHS :1640, Calc_Shifting :1875): the CUDA neighbor-loop kernels become two
masked (N, K) gather-reduce passes —

  pass 1  solid-marker pressure/velocity extrapolation from fluid neighbors
          (Adami et al. generalized wall BC)
  pass 2  continuity (+ δ-SPH diffusion) and momentum (pressure gradient +
          laminar/artificial viscosity) for every marker; solid markers get a
          fluid-reaction acceleration used for the BCE force reduction.

All markers (fluid, fixed boundary, rigid BCE) share the passes with masks —
no divergent code paths, no scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.fsi.sph.state import (
    SPHParams, SPHState, FLUID, tait_pressure, tait_density,
)
from chrono_tpu.fsi.sph.kernels import KERNELS, grad_w
from chrono_tpu.collision.cell_list import GridSpec, min_image


def particle_mass(params: SPHParams):
    return params.rho0 * params.d0**3


def adami_bc(params: SPHParams, grid: GridSpec, pos, vel, rho, kind,
             nbr_idx, nbr_valid, body_acc=None):
    """Extrapolate pressure/density/velocity onto solid markers.

    Returns (p_all, rho_all, v_bc_all): fluid markers keep their own EOS
    pressure and velocity; solid markers get the Adami ghost values
    (v_bc = 2 v_wall − ⟨v_fluid⟩ for the viscous term).
    ``body_acc``: (N,3) prescribed acceleration of solid markers (moving BCE).
    """
    w_fn, dw_fn, _ = KERNELS[params.kernel]
    is_fluid = kind == FLUID
    p_own = tait_pressure(params, rho)

    j = jnp.maximum(nbr_idx, 0)
    d = min_image(grid, pos[:, None, :] - pos[j])     # (N,K,3) x_i − x_j
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    Wij = w_fn(r, params.h)
    fluid_nbr = nbr_valid & is_fluid[j]
    Wf = jnp.where(fluid_nbr, Wij, 0.0)
    denom = jnp.sum(Wf, axis=1)
    has_fluid = denom > 1e-12
    denom = jnp.maximum(denom, 1e-12)

    g = params.gravity
    acc_w = -g[None, :] if body_acc is None else body_acc - g[None, :]
    # hydrostatic correction: ρ_f (g − a_w)·(x_w − x_f) = −ρ_f acc_w·d ... d = x_w − x_f
    hydro = jnp.sum((-acc_w[:, None, :]) * d, axis=-1) * rho[j]
    if params.boundary_model == "holmes":
        # Holmes et al. wall treatment (reference SphForceWCSPH.cu:819):
        # plain Shepard pressure extrapolation, no acceleration/hydrostatic
        # term — appropriate for confined flows where the wall-normal body
        # force is negligible
        hydro = jnp.zeros_like(hydro)
    p_solid = jnp.sum(Wf * (p_own[j] + hydro), axis=1) / denom
    p_solid = jnp.where(has_fluid, p_solid, 0.0)

    v_avg = jnp.sum(Wf[..., None] * vel[j], axis=1) / denom[:, None]
    v_bc_solid = 2.0 * vel - v_avg                    # no-slip ghost velocity
    v_bc_solid = jnp.where(has_fluid[:, None], v_bc_solid, vel)

    p_all = jnp.where(is_fluid, p_own, p_solid)
    rho_all = jnp.where(is_fluid, rho, tait_density(params, p_all))
    v_bc_all = jnp.where(is_fluid[:, None], vel, v_bc_solid)
    return p_all, rho_all, v_bc_all


def continuity_rhs(params: SPHParams, grid: GridSpec, pos, vel, rho, kind,
                   nbr_idx, nbr_valid):
    """dρ/dt alone (continuity + δ-SPH), using raw/prescribed velocities.

    Split out so the symplectic integrator can evaluate it AT THE UPDATED
    velocities — the stable semi-implicit pairing for the acoustic subsystem
    (v first from p(ρⁿ), then ρ from vⁿ⁺¹); evaluating both at the old state
    is explicit Euler on the p↔v oscillator and grows unconditionally.
    """
    w_fn, dw_fn, _ = KERNELS[params.kernel]
    m = particle_mass(params)
    is_fluid = kind == FLUID
    j = jnp.maximum(nbr_idx, 0)
    d = min_image(grid, pos[:, None, :] - pos[j])
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(r2 + 1e-12)
    gw = grad_w(dw_fn, d, r, params.h)
    act = nbr_valid
    v_ij = vel[:, None, :] - vel[j]
    drho = jnp.sum(jnp.where(act, m * jnp.sum(v_ij * gw, axis=-1), 0.0), axis=1)
    rho_i = rho[:, None]
    rho_j = rho[j]
    psi = 2.0 * (rho_j - rho_i) * jnp.sum(-d * gw, axis=-1) / (r2 + 1e-12)
    diff_ok = act & is_fluid[j] & is_fluid[:, None]
    drho = drho + params.delta_sph * params.h * params.c_s * jnp.sum(
        jnp.where(diff_ok, m / rho_j * psi, 0.0), axis=1)
    return jnp.where(is_fluid, drho, 0.0)


def wcsph_rhs(params: SPHParams, grid: GridSpec, pos, vel, rho, kind,
              nbr_idx, nbr_valid, body_acc=None):
    """(dρ/dt, dv/dt) for all markers.

    Fluid: full continuity+momentum.  Solid: dρ/dt = 0 and dv/dt is the fluid
    reaction (for the BCE body-force reduction, see fsi/bce.py), NOT integrated.
    """
    w_fn, dw_fn, _ = KERNELS[params.kernel]
    m = particle_mass(params)
    is_fluid = kind == FLUID

    p_all, rho_all, v_bc = adami_bc(
        params, grid, pos, vel, rho, kind, nbr_idx, nbr_valid, body_acc)

    j = jnp.maximum(nbr_idx, 0)
    d = min_image(grid, pos[:, None, :] - pos[j])
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(r2 + 1e-12)
    gw = grad_w(dw_fn, d, r, params.h)                # (N,K,3) ∇_i W_ij
    act = nbr_valid

    rho_i = rho_all[:, None]
    rho_j = rho_all[j]
    p_i = p_all[:, None]
    p_j = p_all[j]
    # Adami: continuity uses the PRESCRIBED solid velocity; the no-slip ghost
    # velocity enters only the viscous term
    v_i = vel[:, None, :]
    v_ij_cont = v_i - vel[j]
    v_ij = v_i - jnp.where(is_fluid[j][..., None], vel[j], v_bc[j])

    # continuity: dρ_i/dt = Σ m (v_i − v_j)·∇W
    drho = jnp.sum(jnp.where(act, m * jnp.sum(v_ij_cont * gw, axis=-1), 0.0),
                   axis=1)

    # δ-SPH density diffusion (Molteni–Colagrossi), fluid-fluid pairs only
    delta_sph = params.delta_sph
    psi = 2.0 * (rho_j - rho_i) * jnp.sum(-d * gw, axis=-1) / (r2 + 1e-12)
    diff_ok = act & is_fluid[j] & is_fluid[:, None]
    drho = drho + delta_sph * params.h * params.c_s * jnp.sum(
        jnp.where(diff_ok, m / rho_j * psi, 0.0), axis=1)

    # momentum: pressure gradient (symmetric form)
    pterm = p_i / (rho_i**2) + p_j / (rho_j**2)
    dv = -jnp.sum(jnp.where(act[..., None], (m * pterm)[..., None] * gw, 0.0),
                  axis=1)

    if params.viscosity_model == "laminar":
        # Morris et al. laminar viscosity
        mu2 = 2.0 * params.mu
        coef = m * mu2 / (rho_i * rho_j) * jnp.sum(d * gw, axis=-1) / (
            r2 + 0.01 * params.h**2)
        dv = dv + jnp.sum(jnp.where(act[..., None], coef[..., None] * v_ij, 0.0),
                          axis=1)
    else:
        # Monaghan artificial viscosity (approaching pairs only)
        v_dot_r = jnp.sum(v_ij * d, axis=-1)
        mu_ij = params.h * v_dot_r / (r2 + 0.01 * params.h**2)
        Pi = jnp.where(v_dot_r < 0,
                       -params.alpha_visc * params.c_s * mu_ij
                       / (0.5 * (rho_i + rho_j)), 0.0)
        dv = dv - jnp.sum(jnp.where(act[..., None], (m * Pi)[..., None] * gw,
                                    0.0), axis=1)

    # gravity on FLUID only: solid-marker dv_dt is the pure fluid reaction
    # (pressure+viscous) used for the BCE body-force reduction — the body's
    # own weight lives in the MBS, adding g here would double-count it
    dv = jnp.where(is_fluid[:, None], dv + params.gravity[None, :], dv)
    drho = jnp.where(is_fluid, drho, 0.0)
    return drho, dv


def xsph_velocity(params: SPHParams, grid: GridSpec, pos, vel, rho, kind,
                  nbr_idx, nbr_valid):
    """XSPH-corrected transport velocity (particle shifting, fluid only).

    The reference's default shifting method (ChFsiDefinitionsSPH.h:51 XSPH).
    """
    w_fn, _, _ = KERNELS[params.kernel]
    m = particle_mass(params)
    is_fluid = kind == FLUID
    j = jnp.maximum(nbr_idx, 0)
    d = min_image(grid, pos[:, None, :] - pos[j])
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    Wij = w_fn(r, params.h)
    ok = nbr_valid & is_fluid[j] & is_fluid[:, None]
    rho_avg = 0.5 * (rho[:, None] + rho[j])
    corr = jnp.sum(
        jnp.where(ok[..., None],
                  (m / rho_avg * Wij)[..., None] * (vel[j] - vel[:, None, :]),
                  0.0), axis=1)
    return jnp.where(is_fluid[:, None], vel + params.xsph_eps * corr, vel)


def ppst_shift(params: SPHParams, grid: GridSpec, pos, vel, rho, kind,
               nbr_idx, nbr_valid):
    """PPST particle shifting (Lind et al.; reference shifting method PPST,
    ChFsiDefinitionsSPH.h:51): δr = −D ∇C with concentration C = Σ (m/ρ) W
    and D = A h |v| dt; shifts are capped at 0.1 d0 and suppressed for
    surface-deficient particles (their one-sided ∇C would eject them)."""
    w_fn, dw_fn, _ = KERNELS[params.kernel]
    m = particle_mass(params)
    is_fluid = kind == FLUID
    j = jnp.maximum(nbr_idx, 0)
    d = min_image(grid, pos[:, None, :] - pos[j])
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    gw = grad_w(dw_fn, d, r, params.h)
    vol = m / jnp.maximum(rho[j], 1e-9)
    gradC = jnp.sum(jnp.where(nbr_valid[..., None], vol[..., None] * gw,
                              0.0), axis=1)
    C = jnp.sum(jnp.where(nbr_valid, vol * w_fn(r, params.h), 0.0), axis=1) \
        + m / jnp.maximum(rho, 1e-9) * w_fn(jnp.zeros_like(rho), params.h)
    interior = C > 0.9 * jnp.max(jnp.where(is_fluid, C, 0.0))
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1))
    D = 2.0 * params.h * speed * params.dt
    shift = -D[:, None] * gradC
    cap = 0.1 * params.d0
    mag = jnp.sqrt(jnp.sum(shift * shift, axis=-1, keepdims=True) + 1e-20)
    shift = shift * jnp.minimum(1.0, cap / mag)
    return jnp.where((is_fluid & interior)[:, None], shift, 0.0)


def summation_density(params: SPHParams, grid: GridSpec, pos, kind,
                      nbr_idx, nbr_valid):
    """ρ_i = Σ m W_ij (periodic density re-initialization,
    reference calcRho_kernel SphForceWCSPH.cu:584)."""
    w_fn, _, _ = KERNELS[params.kernel]
    m = particle_mass(params)
    j = jnp.maximum(nbr_idx, 0)
    d = min_image(grid, pos[:, None, :] - pos[j])
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    W_self = w_fn(jnp.zeros_like(r[:, 0]), params.h)
    Wij = jnp.where(nbr_valid, w_fn(r, params.h), 0.0)
    return m * (W_self + jnp.sum(Wij, axis=1))
