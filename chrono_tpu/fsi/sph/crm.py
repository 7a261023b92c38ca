"""CRM: continuum granular material as elastoplastic SPH.

TPU-native counterpart of the reference's CRM path
(/root/reference/src/chrono_fsi/sph/physics/SphForceWCSPH.cu: CrmRHS :1396 with
per-particle stress tensors tauXxYyZzD/tauXyXzYzD and CrmAdamiBC :658; rheology
menu ChFsiDefinitionsSPH.h:79): each granular particle carries a full Cauchy
stress evolved with a Jaumann (co-rotational) elastic rate and projected onto
the Drucker–Prager cone (radial return) — the standard Bui-style elastoplastic
SPH that the reference's CRM terrain is built on.

Same (N, K) gather-reduce structure as the CFD path; the stress tensor rides
along as two (N, 3) arrays (diagonal + off-diagonal), updated in the same pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.collision.cell_list import GridSpec, min_image
from chrono_tpu.fsi.sph.state import SPHParams, FLUID, FROZEN
from chrono_tpu.fsi.sph.kernels import KERNELS, grad_w
from chrono_tpu.fsi.sph.wcsph import particle_mass


@pytree_dataclass
class CRMParams:
    """Granular material constants (SI)."""

    youngs: Array = 1e6          # elastic modulus E [Pa]
    poisson: Array = 0.3
    friction_angle: Array = 0.6  # internal friction tan(φ)
    cohesion: Array = 0.0        # [Pa]
    dilatancy: Array = 0.0       # tan(ψ) (0 = non-associated, no dilation)

    @property
    def shear_G(self):
        return self.youngs / (2.0 * (1.0 + self.poisson))

    @property
    def bulk_K(self):
        return self.youngs / (3.0 * (1.0 - 2.0 * self.poisson))


def _unpack_stress(tau_d: Array, tau_o: Array) -> Array:
    """(N,3)+(N,3) → (N,3,3) symmetric Cauchy stress."""
    sxx, syy, szz = tau_d[:, 0], tau_d[:, 1], tau_d[:, 2]
    sxy, sxz, syz = tau_o[:, 0], tau_o[:, 1], tau_o[:, 2]
    row0 = jnp.stack([sxx, sxy, sxz], axis=-1)
    row1 = jnp.stack([sxy, syy, syz], axis=-1)
    row2 = jnp.stack([sxz, syz, szz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _pack_stress(s: Array):
    return (jnp.stack([s[:, 0, 0], s[:, 1, 1], s[:, 2, 2]], axis=-1),
            jnp.stack([s[:, 0, 1], s[:, 0, 2], s[:, 1, 2]], axis=-1))


def velocity_gradient(params: SPHParams, grid: GridSpec, pos, vel, rho,
                      nbr_idx, nbr_valid) -> Array:
    """SPH velocity gradient ∇v per particle, (N,3,3)."""
    _, dw_fn, _ = KERNELS[params.kernel]
    m = particle_mass(params)
    j = jnp.maximum(nbr_idx, 0)
    d = min_image(grid, pos[:, None, :] - pos[j])
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    gw = grad_w(dw_fn, d, r, params.h)                # (N,K,3) ∇_i W_ij
    dv = vel[j] - vel[:, None, :]                     # (N,K,3)
    w = jnp.where(nbr_valid, m / rho[j], 0.0)
    # ∇v_i = Σ_j (m/ρ_j)(v_j − v_i) ⊗ ∇_i W_ij  — note ∇_i W points along d
    return jnp.einsum("nk,nka,nkb->nab", w, dv, gw)


def drucker_prager_return(s: Array, p: CRMParams) -> Array:
    """Radial return of (N,3,3) stresses onto the Drucker–Prager cone.

    Yield: √J₂ ≤ α·p_mean + k  with p_mean = −tr(σ)/3 (compression positive).
    Tension cut-off: if p_mean < −k/α the stress collapses to the apex.
    """
    tr = jnp.trace(s, axis1=-2, axis2=-1)
    p_mean = -tr / 3.0                                # compression > 0
    eye = jnp.eye(3, dtype=s.dtype)
    dev = s + p_mean[:, None, None] * eye
    J2 = 0.5 * jnp.sum(dev * dev, axis=(-2, -1))
    sqrtJ2 = jnp.sqrt(J2 + 1e-20)
    alpha = p.friction_angle / jnp.sqrt(9.0 + 3.0 * p.friction_angle**2)
    k_c = 3.0 * p.cohesion / jnp.sqrt(9.0 + 3.0 * p.friction_angle**2)

    # tension cutoff: move the pressure to the apex
    p_apex = -k_c / jnp.maximum(alpha, 1e-9)
    p_new = jnp.maximum(p_mean, p_apex)
    yield_lim = alpha * p_new + k_c
    scale = jnp.minimum(1.0, yield_lim / sqrtJ2)
    dev_new = dev * scale[:, None, None]
    return dev_new - p_new[:, None, None] * eye


@pytree_dataclass
class CRMState:
    """Granular SPH state: kinematics + per-particle stress."""

    pos: Array
    vel: Array
    rho: Array
    kind: Array       # FLUID code = granular here; BOUNDARY = walls
    body_id: Array
    bce_local: Array
    tau_d: Array      # (N,3) σxx σyy σzz
    tau_o: Array      # (N,3) σxy σxz σyz
    nbr: object
    time: Array

    @property
    def n(self):
        return self.pos.shape[0]


def make_crm_state(sph_state, dtype=jnp.float32) -> CRMState:
    n = sph_state.n
    return CRMState(
        pos=sph_state.pos, vel=sph_state.vel, rho=sph_state.rho,
        kind=sph_state.kind, body_id=sph_state.body_id,
        bce_local=sph_state.bce_local,
        tau_d=jnp.zeros((n, 3), dtype), tau_o=jnp.zeros((n, 3), dtype),
        nbr=sph_state.nbr, time=sph_state.time,
    )


def crm_forces(params: SPHParams, crm: CRMParams, grid: GridSpec,
               state: CRMState):
    """Acceleration of every marker (granular: full dynamics; solid: the
    granular reaction used for the BCE force reduction).

    Granular = FLUID or FROZEN markers (frozen ones contribute stress/density
    as neighbors but are not integrated — the active-domain mechanism).
    """
    _, dw_fn, _ = KERNELS[params.kernel]
    m = particle_mass(params)
    is_gran = (state.kind == FLUID) | (state.kind == FROZEN)

    j = jnp.maximum(state.nbr.idx, 0)
    valid = state.nbr.valid
    d = min_image(grid, state.pos[:, None, :] - state.pos[j])
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(r2 + 1e-12)
    gw = grad_w(dw_fn, d, r, params.h)

    sig = _unpack_stress(state.tau_d, state.tau_o)     # (N,3,3)

    # --- momentum: divergence of stress (symmetric SPH form) ---
    # wall markers carry no evolved stress: mirror the granular particle's own
    # stress onto them (dummy-particle boundary, Bui et al.)
    is_gran_j = is_gran[j]
    sig_j = jnp.where(is_gran_j[..., None, None], sig[j],
                      jnp.broadcast_to(sig[:, None], sig[j].shape))
    rho_i = state.rho[:, None]
    rho_j = state.rho[j]
    sig_term = (sig[:, None] / (rho_i**2)[..., None, None]
                + sig_j / (rho_j**2)[..., None, None])   # (N,K,3,3)
    dv = jnp.einsum("nkab,nkb->na",
                    jnp.where(valid[..., None, None], sig_term, 0.0),
                    m * gw)
    # artificial viscosity for shock handling (reference CRM uses α term too)
    v_ij = state.vel[:, None, :] - state.vel[j]
    v_dot_r = jnp.sum(v_ij * d, axis=-1)
    mu_ij = params.h * v_dot_r / (r2 + 0.01 * params.h**2)
    Pi = jnp.where(v_dot_r < 0,
                   -params.alpha_visc * params.c_s * mu_ij
                   / (0.5 * (rho_i + rho_j)), 0.0)
    dv = dv - jnp.sum(jnp.where(valid[..., None], (m * Pi)[..., None] * gw,
                                0.0), axis=1)

    # short-range boundary penalty (Monaghan-style): mirrored stress alone
    # cannot support stress-free material falling onto a wall.  Mixed pairs
    # only: granular i gets pushed away from solid j, and solid i collects the
    # equal-and-opposite reaction from granular j (for the BCE reduction).
    # Near-critical normal damping (approach-only) kills the elastic bounce a
    # bare penalty would give a body dropped onto the bed.
    r0 = params.d0
    mixed = is_gran[:, None] != is_gran_j
    close = valid & mixed & (r < r0)
    overlap = jnp.where(close, (r0 - r) / r0, 0.0)
    k_bc = params.c_s**2 / r0                       # acceleration scale
    nhat = d / r[..., None]
    vn_rel = jnp.sum(v_ij * nhat, axis=-1)          # <0 ⇒ approaching
    c_bc = 3.0 * jnp.sqrt(k_bc / r0)                # over-critical [1/s]
    # full damping on approach, 30 % on separation (granular contact has
    # near-zero restitution; a small separation term is viscous, not sticky)
    damp = jnp.where(close,
                     -c_bc * vn_rel * jnp.where(vn_rel < 0, 1.0, 0.3), 0.0)
    dv = dv + jnp.sum((k_bc * overlap + damp)[..., None] * nhat, axis=1)
    return dv


def crm_step(params: SPHParams, crm: CRMParams, grid: GridSpec,
             state: CRMState) -> CRMState:
    """Explicit elastoplastic step (kick-drift, like the CFD symplectic path)."""
    _, dw_fn, _ = KERNELS[params.kernel]
    m = particle_mass(params)
    h = params.dt
    integrate = state.kind == FLUID                    # active granular only
    is_gran = integrate | (state.kind == FROZEN)

    j = jnp.maximum(state.nbr.idx, 0)
    valid = state.nbr.valid
    d = min_image(grid, state.pos[:, None, :] - state.pos[j])
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(r2 + 1e-12)
    gw = grad_w(dw_fn, d, r, params.h)

    sig = _unpack_stress(state.tau_d, state.tau_o)     # (N,3,3)

    dv = crm_forces(params, crm, grid, state)
    dv = dv + jnp.asarray(params.gravity)[None, :]

    vel = jnp.where(integrate[:, None], state.vel + h * dv, state.vel)

    # --- stress update at the new velocities (stable pairing, cf. wcsph) ---
    gradv = velocity_gradient(params, grid, state.pos, vel, state.rho,
                              state.nbr.idx, valid)
    D = 0.5 * (gradv + jnp.swapaxes(gradv, -1, -2))
    Wspin = 0.5 * (gradv - jnp.swapaxes(gradv, -1, -2))
    eye = jnp.eye(3, dtype=state.pos.dtype)
    trD = jnp.trace(D, axis1=-2, axis2=-1)
    devD = D - (trD / 3.0)[:, None, None] * eye
    sig_dot = (2.0 * crm.shear_G * devD
               + crm.bulk_K * trD[:, None, None] * eye
               + jnp.einsum("nab,nbc->nac", Wspin, sig)
               - jnp.einsum("nab,nbc->nac", sig, Wspin))
    sig_new = sig + h * sig_dot
    sig_new = drucker_prager_return(sig_new, crm)
    sig_new = jnp.where(integrate[:, None, None], sig_new, sig)

    # --- continuity & transport ---
    v_ij_new = vel[:, None, :] - vel[j]
    drho = jnp.sum(jnp.where(valid, m * jnp.sum(v_ij_new * gw, axis=-1), 0.0),
                   axis=1)
    rho = jnp.where(integrate, state.rho + h * drho, state.rho)
    rho = jnp.clip(rho, 0.5 * params.rho0, 2.0 * params.rho0)
    pos = jnp.where(integrate[:, None], state.pos + h * vel, state.pos)

    tau_d, tau_o = _pack_stress(sig_new)
    return state.replace(pos=pos, vel=vel, rho=rho, tau_d=tau_d, tau_o=tau_o,
                         time=state.time + h)


def lithostatic_init(state: CRMState, params: SPHParams, crm: CRMParams,
                     surface_z) -> CRMState:
    """Initialize the stress field to the lithostatic (at-rest) profile:
    σ_zz = −ρ g (H − z), lateral = K₀ σ_zz with K₀ = ν/(1−ν) — the standard
    CRM pre-settled state (the reference settles its terrain before use)."""
    g = jnp.abs(params.gravity[2])
    depth = jnp.clip(surface_z - state.pos[:, 2], 0.0, None)
    szz = -params.rho0 * g * depth
    K0 = crm.poisson / (1.0 - crm.poisson)
    tau_d = jnp.stack([K0 * szz, K0 * szz, szz], axis=-1)
    is_gran = (state.kind == FLUID)[:, None]
    return state.replace(tau_d=jnp.where(is_gran, tau_d, state.tau_d))


def make_crm_advance_fn(params: SPHParams, crm: CRMParams, grid: GridSpec):
    import functools
    from jax import lax
    from chrono_tpu.dem.neighbors import build_neighbor_list

    support = KERNELS[params.kernel][2]

    def one_cycle(state, _):
        nbr = build_neighbor_list(grid, state.pos, support * params.h,
                                  params.max_per_cell, params.max_neighbors)
        state = state.replace(nbr=nbr)

        def inner(st, __):
            return crm_step(params, crm, grid, st), None

        state, _ = lax.scan(inner, state, None, length=params.rebuild_every)
        return state, state.nbr.overflow

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state, n_cycles: int):
        state, ov = lax.scan(one_cycle, state, None, length=n_cycles)
        return state, ov.max()

    return advance
