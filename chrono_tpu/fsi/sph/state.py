"""SPH marker state and parameters.

TPU-native layout for the reference's SPH data manager
(/root/reference/src/chrono_fsi/sph/physics/SphDataManager.cuh: posRadD,
velMasD, rhoPresMuD SoA arrays + marker-type codes): one flat marker population
with a type code and body attachment, so fluid, fixed-boundary BCE and
rigid-body BCE markers all flow through the same kernels with masks.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.dem.neighbors import NeighborList

# marker type codes
FLUID = 0
BOUNDARY = 1     # fixed BCE (walls)
RIGID_BCE = 2    # markers attached to rigid bodies
FLEX_BCE = 3     # markers attached to FEA nodes
FROZEN = 4       # fluid/granular marker OUTSIDE the active domain: still a
                 # neighbor (carries density/stress) but not integrated —
                 # the reference's activityIdentifier=0 state
                 # (SphFluidDynamics.cu:171 UpdateActivityD)


@pytree_dataclass
class SPHParams:
    """Fluid + discretization parameters (traced leaves unless noted).

    Mirrors the quantities of ChFsiParamsSPH (/root/reference/src/chrono_fsi/
    sph/ChFsiParamsSPH.h:57-141): d0, h-multiplier, ρ0, μ, sound speed, etc.
    """

    d0: Array               # initial particle spacing [m]
    h: Array                # smoothing length = h_mult · d0
    rho0: Array             # rest density
    mu: Array               # dynamic viscosity
    c_s: Array              # artificial sound speed (≥10·v_max)
    gravity: Array          # (3,)
    dt: Array               # step size
    eos_gamma: Array = 7.0  # Tait exponent
    alpha_visc: Array = 0.02     # artificial viscosity α (CRM/inviscid runs)
    delta_sph: Array = 0.1       # δ-SPH density-diffusion coefficient
    xsph_eps: Array = 0.5        # XSPH shifting strength
    kernel: str = static_field(default="cubic")
    viscosity_model: str = static_field(default="laminar")  # laminar|artificial
    boundary_model: str = static_field(default="adami")     # adami|holmes
    shifting: str = static_field(default="xsph")            # xsph|ppst|none
    max_neighbors: int = static_field(default=64)
    max_per_cell: int = static_field(default=32)
    rebuild_every: int = static_field(default=4)
    integrator: str = static_field(default="symplectic")     # symplectic|rk2
    density_reinit_every: int = static_field(default=0)      # 0 = never


@pytree_dataclass
class SPHState:
    """All markers of an FSI problem (fluid + boundary + rigid BCE)."""

    pos: Array       # (N, 3)
    vel: Array       # (N, 3)
    rho: Array       # (N,)
    kind: Array      # (N,) int32 marker type code
    body_id: Array   # (N,) int32 rigid body index for RIGID_BCE, else -1
    bce_local: Array  # (N, 3) body-local marker offset (RIGID_BCE only)
    nbr: NeighborList
    time: Array

    @property
    def n(self) -> int:
        return self.pos.shape[0]


def tait_pressure(params: SPHParams, rho: Array) -> Array:
    """Tait EOS: p = c²ρ0/γ [(ρ/ρ0)^γ − 1] (weakly compressible)."""
    g = params.eos_gamma
    B = params.c_s**2 * params.rho0 / g
    return B * ((rho / params.rho0) ** g - 1.0)


def tait_density(params: SPHParams, p: Array) -> Array:
    """Inverse Tait EOS (used by the Adami boundary condition)."""
    g = params.eos_gamma
    B = params.c_s**2 * params.rho0 / g
    return params.rho0 * jnp.maximum(p / B + 1.0, 1e-3) ** (1.0 / g)
