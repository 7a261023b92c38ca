"""CRM deformable terrain coupled to a multibody vehicle.

TPU-native counterpart of the reference's CRMTerrain
(/root/reference/src/chrono_vehicle/terrain/CRMTerrain.h:39 — a
ChFsiProblemCartesian wrapping the SPH/CRM solver) and of the flagship
vehicle-on-CRM coupling (demo_VEH_CRMTerrain_WheeledVehicle.cpp:171-204:
RegisterVehicle + CreateFSIWheels + SetActiveDomain).  Everything — BCE
kinematics from body states, CRM granular substeps over the active domain,
BCE force reduction, the vehicle MBS step — is ONE jitted program per outer
step.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.body import BodyState
from chrono_tpu.physics.system import (
    Model, SolverSettings, step_euler_implicit_linearized,
)
from chrono_tpu.fsi.sph.state import SPHParams
from chrono_tpu.fsi.sph.crm import (
    CRMParams, CRMState, crm_step, crm_forces, lithostatic_init,
)
from chrono_tpu.fsi.sph.kernels import KERNELS
from chrono_tpu.fsi import bce
from chrono_tpu.fsi.active import (
    ActiveDomainSpec, activity_masks, compact_indices, gather_state,
    scatter_state,
)
from chrono_tpu.dem.neighbors import build_neighbor_list


def make_crm_terrain_state(params: SPHParams, crm: CRMParams,
                           size, depth, spacing=None,
                           rigid_pts=None, rigid_body_ids=None,
                           rigid_local=None, carve_fn=None,
                           surface_fn=None, dtype=jnp.float32):
    """Box terrain patch: granular bed (lithostatic pre-stress) + wall BCE
    floor/side layers + optional rigid-body BCE markers (wheels).

    ``size``: (Lx, Ly); ``depth``: bed depth; ``carve_fn(pts) -> keep mask``
    removes granular markers (e.g. under a pre-sunk wheel, so bodies can
    start at their static sinkage without instant overlap);
    ``surface_fn(x, y) -> z`` shapes the bed surface from a heightmap
    (reference ChFsiProblemCartesian::Construct(heightmap),
    ChFsiProblemSPH.h:324-366) — depths are measured from z=0 up to
    min(depth, surface).  Returns (CRMState, GridSpec).
    """
    from chrono_tpu.utils.samplers import grid_sample_box
    from chrono_tpu.fsi.sph.system import make_sph_state

    d0 = float(spacing if spacing is not None else params.d0)
    Lx, Ly = float(size[0]), float(size[1])
    H = float(depth)
    z_top = H
    gran = grid_sample_box((0, 0, 0), (Lx, Ly, H), d0)
    if surface_fn is not None:
        zs = np.asarray(surface_fn(gran[:, 0], gran[:, 1]), float)
        gran = gran[gran[:, 2] < zs]
        z_top = None
    if carve_fn is not None:
        gran = gran[np.asarray(carve_fn(gran), bool)]
    walls = bce.box_wall_markers((0, 0, 0), (Lx, Ly, H + 20 * d0), d0,
                                 layers=3, top_open=True)
    sph = make_sph_state(params, gran, boundary_pts=walls,
                         rigid_pts=rigid_pts, rigid_body_ids=rigid_body_ids,
                         rigid_local=rigid_local, dtype=dtype)
    from chrono_tpu.fsi.sph.crm import make_crm_state

    state = make_crm_state(sph, dtype)
    if z_top is None:
        # heightmap bed: per-particle lithostatic depth to the local surface
        zs = jnp.asarray(np.minimum(
            np.asarray(surface_fn(np.asarray(state.pos[:, 0]),
                                  np.asarray(state.pos[:, 1])), float), H))
        state = lithostatic_init(state, params, crm, surface_z=zs)
    else:
        state = lithostatic_init(state, params, crm, surface_z=H)

    support = KERNELS[params.kernel][2]
    cell = support * float(params.h)
    margin = 6 * d0
    zmax = H + 30 * d0
    dims = (int(np.ceil((Lx + 2 * margin) / cell)),
            int(np.ceil((Ly + 2 * margin) / cell)),
            int(np.ceil((zmax + 2 * margin) / cell)))
    grid = GridSpec(origin=(-margin, -margin, -margin), cell_size=cell,
                    dims=dims, periodic=(False, False, False))
    return state, grid


def wheel_bce_markers(radius, width, spacing, layers=2):
    """Cylinder-shell BCE markers for a wheel with axis y (vehicle lateral).

    Returns (M, 3) local coordinates (the reference's CreateFSIWheels path
    builds cylinders the same way, demo_VEH_CRMTerrain_WheeledVehicle.cpp).
    """
    pts = []
    n_ax = max(2, int(np.ceil(width / spacing)) + 1)
    ys = np.linspace(-width / 2, width / 2, n_ax)
    for il in range(layers):
        r = radius - il * spacing
        if r <= spacing:
            break
        n_c = max(8, int(np.ceil(2 * np.pi * r / spacing)))
        ang = np.arange(n_c) * 2 * np.pi / n_c
        for y in ys:
            pts.append(np.stack([r * np.cos(ang), np.full(n_c, y),
                                 r * np.sin(ang)], axis=-1))
    return np.concatenate(pts, axis=0)


@pytree_dataclass
class CRMFSIState:
    bodies: BodyState
    terrain: CRMState
    time: jnp.ndarray


def crm_fsi_step(model: Model, params: SPHParams, crm: CRMParams,
                 grid: GridSpec, state: CRMFSIState, n_substeps: int,
                 wheel_bodies,
                 active: ActiveDomainSpec | None = None,
                 mbs_settings: SolverSettings = SolverSettings(solver="direct"),
                 f_ext_fn=None, substeps_fn=None):
    """One coupled outer step: BCE kinematics → (active-domain) CRM substeps
    → BCE force/torque reduction → MBS step with terrain loads.

    ``wheel_bodies``: (B,) int32 indices of bodies carrying BCE markers
    (anchors of the active boxes).  ``f_ext_fn(t, bodies) -> (f, tau_local)``
    lets the caller add drive torques etc.
    Returns (state, overflow, info).
    """
    bodies, terrain = state.bodies, state.terrain

    # 1. BCE marker kinematics from current body states
    pos, vel = bce.update_rigid_markers(
        terrain.pos, terrain.vel, terrain.kind, terrain.body_id,
        terrain.bce_local, bodies.x, bodies.q, bodies.v, bodies.w)
    terrain = terrain.replace(pos=pos, vel=vel)

    support = KERNELS[params.kernel][2]

    if substeps_fn is not None:
        # TPU pencil engine (fsi.sph.crm_pencil): symmetric Pallas sweeps
        def substeps(st):
            return substeps_fn(st, n_substeps)
    else:
        def substeps(st):
            nbr = build_neighbor_list(grid, st.pos, support * params.h,
                                      params.max_per_cell,
                                      params.max_neighbors)
            st = st.replace(nbr=nbr)

            def inner(s, _):
                return crm_step(params, crm, grid, s), None

            st, _ = lax.scan(inner, st, None, length=n_substeps)
            # granular reaction on BCE markers at the final state
            dv = crm_forces(params, crm, grid, st)
            return st, dv, nbr.overflow

    if active is not None:
        anchors = bodies.x[jnp.asarray(wheel_bodies)]
        strict, ext = activity_masks(active, terrain.pos, terrain.kind,
                                     anchors)
        idx, count, a_overflow = compact_indices(active, ext)
        sub = gather_state(terrain, idx, strict)
        sub, dv_sub, n_overflow = substeps(sub)
        f_b, tau_b = bce.rigid_body_forces(
            params, dv_sub, sub.kind, sub.body_id, sub.pos, bodies.x,
            model.n_bodies)
        terrain = scatter_state(terrain, sub, idx)
        overflow = jnp.maximum(a_overflow, n_overflow)
    else:
        terrain, dv, overflow = substeps(terrain)
        f_b, tau_b = bce.rigid_body_forces(
            params, dv, terrain.kind, terrain.body_id, terrain.pos,
            bodies.x, model.n_bodies)

    tau_local = Q.qrotate_inv(bodies.q, tau_b)

    # 2. vehicle MBS step over the outer interval with terrain loads
    h_outer = params.dt * n_substeps
    f_drv = tau_drv = None
    if f_ext_fn is not None:
        f_drv, tau_drv = f_ext_fn(state.time, bodies)
    f_tot = f_b if f_drv is None else f_b + f_drv
    tau_tot = tau_local if tau_drv is None else tau_local + tau_drv
    bodies, info = step_euler_implicit_linearized(
        model, bodies, state.time, h_outer, mbs_settings,
        f_ext=f_tot, tau_ext=tau_tot)

    return (CRMFSIState(bodies=bodies, terrain=terrain,
                        time=state.time + h_outer), overflow, info)


def make_crm_fsi_advance_fn(model: Model, params: SPHParams, crm: CRMParams,
                            grid: GridSpec, n_substeps: int, wheel_bodies,
                            active: ActiveDomainSpec | None = None,
                            mbs_settings: SolverSettings = SolverSettings(
                                solver="direct"),
                            f_ext_fn=None, engine: str = "gather",
                            pencil_capacity: int = 16, pencil_Bxy: int = 4):
    """``engine``: "gather" (neighbor lists — CPU-friendly) or "pencil"
    (symmetric Pallas sweeps, fsi.sph.crm_pencil — the TPU path)."""
    wheel_bodies = jnp.asarray(np.asarray(wheel_bodies, np.int32))
    substeps_fn = None
    if engine == "pencil":
        from chrono_tpu.fsi.sph.crm_pencil import make_crm_substeps_pencil
        substeps_fn = make_crm_substeps_pencil(
            params, crm, grid, capacity=pencil_capacity, Bxy=pencil_Bxy)
    elif engine != "gather":
        raise ValueError(f"unknown CRM engine {engine!r}")

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: CRMFSIState, n_outer: int):
        def body(carry, _):
            s, ovf = carry
            s, ov, _ = crm_fsi_step(model, params, crm, grid, s, n_substeps,
                                    wheel_bodies, active, mbs_settings,
                                    f_ext_fn, substeps_fn=substeps_fn)
            return (s, jnp.maximum(ovf, ov)), None

        (state2, ovf), _ = lax.scan(body, (state, jnp.zeros((), jnp.int32)),
                                    None, length=n_outer)
        return state2, ovf

    return advance
