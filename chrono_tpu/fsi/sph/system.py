"""SPH fluid system: neighbor management + explicit time integration.

Counterpart of the reference's fluid-side orchestration
(/root/reference/src/chrono_fsi/sph/ChFsiFluidSystemSPH.cpp:1776
OnDoStepDynamics → proximity search every N steps → SphFluidDynamics scheme):
one jitted program runs rebuild + substeps under ``lax.scan``; integration
schemes EULER / SYMPLECTIC / RK2 mirror SphFluidDynamics.cu:115.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.collision.cell_list import GridSpec, wrap_positions
from chrono_tpu.dem.neighbors import build_neighbor_list
from chrono_tpu.fsi.sph.state import (
    SPHParams, SPHState, FLUID, BOUNDARY, RIGID_BCE, tait_pressure,
)
from chrono_tpu.fsi.sph import wcsph
from chrono_tpu.fsi.sph.kernels import KERNELS


def rebuild_sph_neighbors(params: SPHParams, grid: GridSpec,
                          state: SPHState) -> SPHState:
    _, _, support = KERNELS[params.kernel]
    cutoff = support * params.h
    nbr = build_neighbor_list(grid, state.pos, cutoff,
                              params.max_per_cell, params.max_neighbors)
    return state.replace(nbr=nbr)


def sph_substep(params: SPHParams, grid: GridSpec, state: SPHState,
                body_acc=None) -> SPHState:
    """One explicit step of the chosen scheme; solid markers not integrated."""
    h = params.dt
    is_fluid = (state.kind == FLUID)[:, None]

    def rhs(pos, vel, rho):
        return wcsph.wcsph_rhs(params, grid, pos, vel, rho, state.kind,
                               state.nbr.idx, state.nbr.valid, body_acc)

    def transport_velocity(pos, vel, rho):
        """Shifting-corrected transport velocity per params.shifting."""
        if params.shifting == "xsph":
            return wcsph.xsph_velocity(params, grid, pos, vel, rho,
                                       state.kind, state.nbr.idx,
                                       state.nbr.valid)
        if params.shifting == "ppst":
            dr = wcsph.ppst_shift(params, grid, pos, vel, rho, state.kind,
                                  state.nbr.idx, state.nbr.valid)
            return vel + dr / h
        return vel

    if params.integrator == "euler":
        drho, dv = rhs(state.pos, state.vel, state.rho)
        vel = jnp.where(is_fluid, state.vel + h * dv, state.vel)
        vt = transport_velocity(state.pos, vel, state.rho)
        pos = jnp.where(is_fluid, state.pos + h * vt, state.pos)
        rho = state.rho + h * drho
    elif params.integrator == "symplectic":
        # acoustic-stable kick-drift: v from p(ρⁿ), then ρ from the NEW v
        # (see wcsph.continuity_rhs), then transport with XSPH velocity.
        # The XSPH weight uses ρⁿ — the same time level as the continuity
        # pair sums, matching the reference's single-force-pass evaluation
        # (SphForceWCSPH.cu computes all RHS terms from the current state);
        # it also lets the TPU plane engines fuse the continuity and drift
        # sweeps into one pass (sph_sym_kernel sweep CD).
        _, dv = rhs(state.pos, state.vel, state.rho)
        vel = jnp.where(is_fluid, state.vel + h * dv, state.vel)
        drho = wcsph.continuity_rhs(params, grid, state.pos, vel, state.rho,
                                    state.kind, state.nbr.idx, state.nbr.valid)
        rho = state.rho + h * drho
        vt = transport_velocity(state.pos, vel, state.rho)
        pos = jnp.where(is_fluid, state.pos + h * vt, state.pos)
    elif params.integrator == "rk2":
        drho1, dv1 = rhs(state.pos, state.vel, state.rho)
        pos_m = jnp.where(is_fluid, state.pos + 0.5 * h * state.vel, state.pos)
        vel_m = jnp.where(is_fluid, state.vel + 0.5 * h * dv1, state.vel)
        rho_m = state.rho + 0.5 * h * drho1
        drho2, dv2 = rhs(pos_m, vel_m, rho_m)
        vel = jnp.where(is_fluid, state.vel + h * dv2, state.vel)
        rho = state.rho + h * drho2
        vt = transport_velocity(state.pos, vel, rho)
        pos = jnp.where(is_fluid, state.pos + h * vt, state.pos)
    else:
        raise ValueError(f"unknown integrator {params.integrator!r}")

    pos = wrap_positions(grid, pos)
    rho = jnp.clip(rho, 0.7 * params.rho0, 1.5 * params.rho0)
    return state.replace(pos=pos, vel=vel, rho=rho, time=state.time + h)


def runtime_dt(params: SPHParams, state: SPHState, safety=0.25):
    """Per-cycle adaptive step from the CURRENT velocity field (the runtime
    part of the reference's computeTimeStep, SphFluidDynamics.cu:93-110:
    Courant advective + acoustic + viscous bounds).  Traced — no host sync."""
    is_fluid = state.kind == FLUID
    vmax = jnp.max(jnp.where(is_fluid,
                             jnp.sqrt(jnp.sum(state.vel**2, axis=-1)), 0.0))
    dt_acoustic = params.h / (params.c_s + vmax)
    dt_adv = params.h / jnp.maximum(vmax, 1e-9)
    dt_visc = 0.125 * params.h**2 * params.rho0 / jnp.maximum(params.mu,
                                                              1e-12)
    return safety * jnp.minimum(jnp.minimum(dt_acoustic, dt_adv), dt_visc)


def make_sph_advance_fn(params: SPHParams, grid: GridSpec,
                        adaptive_dt: bool = False):
    """Jitted ``advance(state, n_cycles)``; one cycle = rebuild + R substeps.

    ``adaptive_dt``: recompute dt each cycle from the Courant/viscous bounds
    (capped at the configured params.dt).
    """

    def one_cycle(state, _):
        state = rebuild_sph_neighbors(params, grid, state)
        p = params
        if adaptive_dt:
            p = params.replace(dt=jnp.minimum(params.dt,
                                              runtime_dt(params, state)))

        def inner(st, __):
            return sph_substep(p, grid, st), None
        state, _ = lax.scan(inner, state, None,
                            length=params.rebuild_every)
        return state, state.nbr.overflow

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state, n_cycles: int):
        state, overflows = lax.scan(one_cycle, state, None, length=n_cycles)
        return state, overflows.max()

    return advance


def make_sph_state(params: SPHParams, fluid_pts, boundary_pts=None,
                   rigid_pts=None, rigid_body_ids=None, rigid_local=None,
                   fluid_vel=None, flex_pts=None, dtype=jnp.float32
                   ) -> SPHState:
    """Assemble the marker population: fluid + fixed walls + rigid BCE
    (+ FLEX_BCE markers, appended LAST — the flex coupling relies on that)."""
    from chrono_tpu.dem.neighbors import NeighborList
    from chrono_tpu.fsi.sph.state import FLEX_BCE

    chunks, kinds, bodies, locals_ = [], [], [], []
    fluid_pts = np.asarray(fluid_pts, float)
    chunks.append(fluid_pts)
    kinds.append(np.full(len(fluid_pts), FLUID))
    bodies.append(np.full(len(fluid_pts), -1))
    locals_.append(np.zeros((len(fluid_pts), 3)))
    if boundary_pts is not None and len(boundary_pts):
        boundary_pts = np.asarray(boundary_pts, float)
        chunks.append(boundary_pts)
        kinds.append(np.full(len(boundary_pts), BOUNDARY))
        bodies.append(np.full(len(boundary_pts), -1))
        locals_.append(np.zeros((len(boundary_pts), 3)))
    if rigid_pts is not None and len(rigid_pts):
        rigid_pts = np.asarray(rigid_pts, float)
        chunks.append(rigid_pts)
        kinds.append(np.full(len(rigid_pts), RIGID_BCE))
        bodies.append(np.asarray(rigid_body_ids, int))
        locals_.append(np.asarray(rigid_local, float))
    if flex_pts is not None and len(flex_pts):
        flex_pts = np.asarray(flex_pts, float)
        chunks.append(flex_pts)
        kinds.append(np.full(len(flex_pts), FLEX_BCE))
        bodies.append(np.full(len(flex_pts), -1))
        locals_.append(np.zeros((len(flex_pts), 3)))
    pos = np.concatenate(chunks)
    n = len(pos)
    K = params.max_neighbors
    vel = np.zeros((n, 3))
    if fluid_vel is not None:
        vel[: len(fluid_pts)] = fluid_vel
    return SPHState(
        pos=jnp.asarray(pos, dtype),
        vel=jnp.asarray(vel, dtype),
        rho=jnp.full((n,), float(params.rho0), dtype),
        kind=jnp.asarray(np.concatenate(kinds), jnp.int32),
        body_id=jnp.asarray(np.concatenate(bodies), jnp.int32),
        bce_local=jnp.asarray(np.concatenate(locals_), dtype),
        nbr=NeighborList(idx=jnp.full((n, K), -1, jnp.int32),
                         valid=jnp.zeros((n, K), bool),
                         overflow=jnp.zeros((), jnp.int32)),
        time=jnp.zeros((), dtype),
    )


def suggest_sph_dt(params: SPHParams, safety=0.25) -> float:
    """CFL + viscous + body-force bounds (reference computeTimeStep,
    SphFluidDynamics.cu:93)."""
    h = float(params.h)
    c = float(params.c_s)
    dt_cfl = h / c
    mu = float(params.mu)
    rho = float(params.rho0)
    dt_visc = 0.125 * h * h * rho / max(mu, 1e-12)
    g = float(np.linalg.norm(np.asarray(params.gravity)))
    dt_g = np.sqrt(h / max(g, 1e-12))
    return safety * min(dt_cfl, dt_visc, dt_g)
