"""DEM parameter set and material model.

Capability-equivalent of the reference's ``GranParams`` + material setters
(/root/reference/src/chrono_dem/physics/ChSystemDem_impl.h:94, ChSystemDem.h) in a
TPU-native design: SI units and fp32 world coordinates throughout — the
reference's int-fixed-point subdomain coordinates and SU nondimensionalization
exist to make CUDA atomics deterministic and int math fast; on TPU neither
applies (sort + segment-sum is deterministic, fp32 VPU math is native), so we
keep plain SI floats.  Effective-material (E, ν, e) → (kn, gn, kt, gt)
derivation follows the standard Hertz–Mindlin relations the reference also uses
(ChDemSMC.cuh:647-696 matBased path).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class DEMMaterial:
    """Per-simulation (monomaterial) granular material, SI units."""

    youngs: Array = 1e7         # Young's modulus E [Pa]
    poisson: Array = 0.3        # ν
    restitution: Array = 0.5    # coefficient of restitution e
    mu_s: Array = 0.5           # sliding friction
    mu_r: Array = 0.0           # rolling resistance coefficient
    mu_sp: Array = 0.0          # spinning resistance coefficient
    adhesion: Array = 0.0       # constant adhesion force ratio (× m g)
    # raw user stiffness/damping (the reference's default non-matBased model,
    # ChSystemDem SetKn/SetGn/SetKt/SetGt) — used when force_model="user"
    kn: Array = 0.0             # [N/m]
    gn: Array = 0.0             # [1/s] (× m_eff)
    kt: Array = 0.0             # [N/m]
    gt: Array = 0.0             # [1/s] (× m_eff)


@pytree_dataclass
class DEMParams:
    """Everything the force kernel needs; traced leaves = retune without recompile."""

    radius: Array               # particle radius [m] (monodisperse)
    mass: Array                 # particle mass [kg]
    material: DEMMaterial
    wall_material: DEMMaterial
    gravity: Array              # (3,)
    dt: Array                   # step size [s]
    # static pipeline capacities
    max_neighbors: int = static_field(default=16)
    max_per_cell: int = static_field(default=8)
    rebuild_every: int = static_field(default=8)
    skin: float = static_field(default=0.2)       # neighbor skin, fraction of r
    integrator: str = static_field(default="centered_difference")
    friction_mode: str = static_field(default="multi_step")  # frictionless|single_step|multi_step
    rolling_mode: str = static_field(default="none")  # none|schwartz|elastic_plastic
    force_model: str = static_field(default="mat_based")  # mat_based|user

    @property
    def inertia(self):
        return 0.4 * self.mass * self.radius**2


def hertz_coefficients(mat: DEMMaterial, m_eff, r_eff):
    """Effective Hertzian normal/tangential stiffness+damping prefactors.

    Standard derivation (same physics as the reference's matBased kernel):
      E* = E / (2(1−ν²))   (identical spheres)
      G* = E / (4(2−ν)(1+ν))
      β = ln e / √(ln²e + π²)
      k_n(δ) = 4/3 E* √(R* δ);  γ_n(δ) = −2√(5/6) β √(S_n m*),  S_n = 2E*√(R*δ)
      k_t(δ) = 8 G* √(R* δ);    γ_t analogous with S_t = 8G*√(R*δ)
    Returns the δ-independent prefactors; the kernel applies √δ at runtime.
    """
    E, nu, e = mat.youngs, mat.poisson, mat.restitution
    e = jnp.clip(e, 1e-3, 1.0 - 1e-6)
    E_star = E / (2.0 * (1.0 - nu * nu))
    G_star = E / (4.0 * (2.0 - nu) * (1.0 + nu))
    ln_e = jnp.log(e)
    beta = ln_e / jnp.sqrt(ln_e * ln_e + jnp.pi * jnp.pi)
    sqrt_R = jnp.sqrt(r_eff)
    kn_pref = (4.0 / 3.0) * E_star * sqrt_R          # × √δ
    kt_pref = 8.0 * G_star * sqrt_R                  # × √δ
    # damping: γ = -2√(5/6) β √(S m*) with S = {2E*,8G*}√(R δ) → prefactor × δ^¼
    gn_pref = -2.0 * jnp.sqrt(5.0 / 6.0) * beta * jnp.sqrt(
        2.0 * E_star * sqrt_R * m_eff)
    gt_pref = -2.0 * jnp.sqrt(5.0 / 6.0) * beta * jnp.sqrt(
        8.0 * G_star * sqrt_R * m_eff)
    return kn_pref, gn_pref, kt_pref, gt_pref


def user_coefficients(mat: DEMMaterial, m_eff, radius):
    """Prefactors for the reference's USER-stiffness force model
    (ChDemSMC.cuh:629-637): F_n = K_n·δ·√(δ/R) − Γ_n·m*·√(δ/R)·v_n, and the
    tangential pair analogously.  In the shared kernel convention (k = pref·√δ,
    γ = pref·dampf with dampf=√δ in "user" mode):
      kn_pref = K_n/√R,  gn_pref = Γ_n·m*/√R  (positive = dissipative, same
    sign convention as the matBased prefactors).
    """
    inv_sqrt_r = 1.0 / jnp.sqrt(radius)
    return (mat.kn * inv_sqrt_r, mat.gn * m_eff * inv_sqrt_r,
            mat.kt * inv_sqrt_r, mat.gt * m_eff * inv_sqrt_r)


def suggest_step_size(params: DEMParams, safety: float = 0.2) -> float:
    """Rayleigh-wave stable step estimate (the usual DEM heuristic)."""
    E = float(params.material.youngs)
    nu = float(params.material.poisson)
    rho = float(params.mass) / (4.0 / 3.0 * math.pi * float(params.radius) ** 3)
    G = E / (2 * (1 + nu))
    t_r = (math.pi * float(params.radius) / (0.1631 * nu + 0.8766)
           ) * math.sqrt(rho / G)
    return safety * t_r
