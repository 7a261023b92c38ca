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
                           surface_fn=None, air: float = 30.0,
                           margin: float = 6.0, dtype=jnp.float32):
    """Box terrain patch: granular bed (lithostatic pre-stress) + wall BCE
    floor/side layers + optional rigid-body BCE markers (wheels).

    ``size``: (Lx, Ly); ``depth``: bed depth; ``carve_fn(pts) -> keep mask``
    removes granular markers (e.g. under a pre-sunk wheel, so bodies can
    start at their static sinkage without instant overlap);
    ``surface_fn(x, y) -> z`` shapes the bed surface from a heightmap
    (reference ChFsiProblemCartesian::Construct(heightmap),
    ChFsiProblemSPH.h:324-366) — depths are measured from z=0 up to
    min(depth, surface).  ``air``: headroom above the bed surface in d0
    units covered by the neighbor grid (and side walls, capped at 20·d0)
    — empty z-cells cost lanes linearly in the pencil/flat-lane engines,
    so low-splash scenes (vehicle ruts) should trim this (≈10–12).
    Returns (CRMState, GridSpec).
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
    walls = bce.box_wall_markers(
        (0, 0, 0), (Lx, Ly, H + min(20.0, float(air)) * d0), d0,
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
    # grid margin beyond the bed box, in d0 units: must cover the 3 wall
    # BCE layers (3·d0) plus binning skin; every extra cell costs lanes
    # (and, for the flat2 layout, rows) linearly
    margin = float(margin) * d0
    zmax = H + float(air) * d0
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


def make_crm_fsi_advance_persistent(
        model: Model, params: SPHParams, crm: CRMParams, grid: GridSpec,
        n_substeps: int, wheel_bodies,
        mbs_settings: SolverSettings = SolverSettings(solver="direct"),
        f_ext_fn=None, pencil_capacity: int = 32, pencil_Bxy: int = 4,
        rebuild_outer: int = 5, interpret: bool = False,
        layout: str = "auto", dv_mode: str = "fresh", dual_CA=None,
        clip_z: float = None, whole_outer: bool = False):
    """Vehicle-on-CRM advance with PERSISTENT pencil binning.

    The per-outer pipeline of :func:`make_crm_fsi_advance_fn` (engine
    "pencil") re-bins the whole marker set (sort + 16-plane scatter), runs
    the substeps, and un-bins (16-plane gather) EVERY outer step even
    though the markers move ~1e-2·d0 per outer.  Here the terrain lives in
    the binned plane layout across ``rebuild_outer`` outer steps:

      * wheel BCE marker kinematics are updated IN-PLANE from the body
        states (body-local offsets + body index are binned once per rebuild
        as aux planes through the same sort),
      * per-body force/torque reduction happens directly on the granular
        reaction acceleration planes (masked plane sums per wheel),
      * bin + un-bin only run once per ``rebuild_outer`` outer steps.

    Cell assignments go stale by the marker motion between rebuilds —
    the same soft staleness the reference accepts between proximity
    searches (ChFsiParamsSPH.h:200 num_proximity_search_steps); keep
    ``rebuild_outer · n_substeps · dt · v_max`` well under the cell margin.

    ``dv_mode``: "fresh" (default) pays one extra forces-only sweep per
    outer step to evaluate the BCE granular reaction at the post-substep
    state (matches the per-outer pipeline exactly); "last" reuses the last
    substep's momentum-sweep acceleration (a free kernel by-product, one
    substep staler — same explicit-coupling order, ~1 of 9 sweeps saved).

    ``whole_outer`` (flat2 only, implies dv_mode "last"): run the entire
    substep loop as ONE VMEM-resident pallas call per outer step
    (ops.pallas.crm_outer_kernel) instead of 2 x n_substeps calls — the
    per-call fixed cost dominated the capstone budget at demo scale.

    Same contract as make_crm_fsi_advance_fn: advance(state, n_outer)
    -> (state, overflow).  No active-domain support (the persistent layout
    IS the working set); use the per-outer driver for activity compaction.
    """
    from chrono_tpu.fsi.sph.crm_pencil import (
        make_crm_pencil_engine, make_crm_dual_engine, pencils_to_crm_state,
        pencils_to_crm_state_dual,
    )
    from chrono_tpu.fsi.sph.state import RIGID_BCE

    if layout == "flat2":
        # two-tier flat-lane engine: rows = vertical axis (air rows
        # skipped), field A = the typical cell, field B = the spill.
        # CA defaults to 3/4 of capacity: the floor rows (wall BCE layers +
        # bed bottom, ~17-20 markers/cell) must fit field A or every floor
        # row block pays the full cross-sweep lattice
        CA = int(dual_CA) if dual_CA else (pencil_capacity * 3) // 4
        eng = make_crm_dual_engine(params, crm, grid, CA=CA,
                                   CB=pencil_capacity - CA,
                                   Bxy=pencil_Bxy, interpret=interpret,
                                   clip_z=clip_z)
    else:
        eng = make_crm_pencil_engine(params, crm, grid, pencil_capacity,
                                     pencil_Bxy, interpret, layout)
    dual = bool(eng.get("dual"))
    wheel_list = [int(w) for w in np.asarray(wheel_bodies).reshape(-1)]
    m_marker = float(params.rho0) * float(params.d0) ** 3
    h_outer = params.dt * n_substeps

    def extras_of(st: CRMState):
        # body index SHIFTED by +1 so empty slots (scattered as 0) read as
        # "no body"; local marker offsets ride the same sort
        is_r = st.kind == RIGID_BCE
        bid = jnp.where(is_r, st.body_id + 1, 0).astype(jnp.float32)
        return [bid, st.bce_local[:, 0], st.bce_local[:, 1],
                st.bce_local[:, 2]]

    def update_bce_planes(feat, aux, bodies: BodyState):
        """x_m = x_b + R ξ, v_m = v_b + ω×(R ξ) written into the planes
        (bce.update_rigid_markers, in the binned layout)."""
        px, py, pz = feat[:, 0], feat[:, 1], feat[:, 2]
        vx, vy, vz = feat[:, 3], feat[:, 4], feat[:, 5]
        bid, lx, ly, lz = aux[:, 0], aux[:, 1], aux[:, 2], aux[:, 3]
        for w in wheel_list:
            mk = (bid == w + 1).astype(feat.dtype)
            R = Q.q_to_matrix(bodies.q[w])
            rx = R[0, 0] * lx + R[0, 1] * ly + R[0, 2] * lz
            ry = R[1, 0] * lx + R[1, 1] * ly + R[1, 2] * lz
            rz = R[2, 0] * lx + R[2, 1] * ly + R[2, 2] * lz
            om = Q.qrotate(bodies.q[w], bodies.w[w])      # ω world
            x_w, v_w = bodies.x[w], bodies.v[w]
            px = px + mk * (x_w[0] + rx - px)
            py = py + mk * (x_w[1] + ry - py)
            pz = pz + mk * (x_w[2] + rz - pz)
            vx = vx + mk * (v_w[0] + om[1] * rz - om[2] * ry - vx)
            vy = vy + mk * (v_w[1] + om[2] * rx - om[0] * rz - vy)
            vz = vz + mk * (v_w[2] + om[0] * ry - om[1] * rx - vz)
        return jnp.concatenate(
            [jnp.stack([px, py, pz, vx, vy, vz], axis=1), feat[:, 6:]],
            axis=1)

    def body_forces_planes(feat, aux, acc, bodies: BodyState):
        """bce.rigid_body_forces on planes: f = m·a masked per wheel,
        torque about each wheel's COM — six plane reductions per wheel."""
        f_b = jnp.zeros((model.n_bodies, 3), feat.dtype)
        tau_b = jnp.zeros((model.n_bodies, 3), feat.dtype)
        bid = aux[:, 0]
        for w in wheel_list:
            mk = m_marker * (bid == w + 1).astype(feat.dtype)
            ax, ay, az = mk * acc[:, 0], mk * acc[:, 1], mk * acc[:, 2]
            rx = feat[:, 0] - bodies.x[w, 0]
            ry = feat[:, 1] - bodies.x[w, 1]
            rz = feat[:, 2] - bodies.x[w, 2]
            f_b = f_b.at[w].set(jnp.stack(
                [jnp.sum(ax), jnp.sum(ay), jnp.sum(az)]))
            tau_b = tau_b.at[w].set(jnp.stack(
                [jnp.sum(ry * az - rz * ay),
                 jnp.sum(rz * ax - rx * az),
                 jnp.sum(rx * ay - ry * ax)]))
        return f_b, tau_b

    if dv_mode not in ("fresh", "last"):
        raise ValueError(f"unknown dv_mode {dv_mode!r}")

    # diagnostic-only: CRM_DEBUG_SKIP=bce,forces,mbs disables pieces of the
    # outer step to locate fixed per-outer cost on hardware (NOT physics)
    import os as _os
    _skip = set((_os.environ.get("CRM_DEBUG_SKIP") or "").split(","))

    def update_bce_all(feat, aux, bodies):
        if dual:
            return tuple(update_bce_planes(f, a, bodies)
                         for f, a in zip(feat, aux))
        return update_bce_planes(feat, aux, bodies)

    def body_forces_all(feat, aux, acc, bodies):
        if dual:
            fA, tA = body_forces_planes(feat[0], aux[0], acc[0], bodies)
            fB, tB = body_forces_planes(feat[1], aux[1], acc[1], bodies)
            return fA + fB, tA + tB
        return body_forces_planes(feat, aux, acc, bodies)

    if whole_outer and not dual:
        raise ValueError("whole_outer requires the flat2 dual layout")

    def outer_body(carry, _, aux):
        feat, bodies, t = carry
        if "bce" not in _skip:
            feat = update_bce_all(feat, aux, bodies)

        def inner(f, _):
            return eng["substep"](f), None

        if whole_outer:
            feat, acc = eng["outer"](feat, n_substeps)
        elif dv_mode == "last":
            feat, _ = lax.scan(inner, feat, None, length=n_substeps - 1)
            feat, acc = eng["substep_acc"](feat)
        else:
            feat, _ = lax.scan(inner, feat, None, length=n_substeps)
            acc = eng["forces"](feat)
        if "forces" in _skip:
            f_b = jnp.zeros((model.n_bodies, 3))
            tau_b = jnp.zeros((model.n_bodies, 3))
        else:
            f_b, tau_b = body_forces_all(feat, aux, acc, bodies)
        tau_local = Q.qrotate_inv(bodies.q, tau_b)
        f_drv = tau_drv = None
        if f_ext_fn is not None:
            f_drv, tau_drv = f_ext_fn(t, bodies)
        f_tot = f_b if f_drv is None else f_b + f_drv
        tau_tot = tau_local if tau_drv is None else tau_local + tau_drv
        if "mbs" in _skip:
            bodies2 = bodies
        else:
            bodies2, _ = step_euler_implicit_linearized(
                model, bodies, t, h_outer, mbs_settings,
                f_ext=f_tot, tau_ext=tau_tot)
        return (feat, bodies2, t + h_outer), None

    def run_chunk(bodies, terrain, t, chunk_len):
        pos, vel = bce.update_rigid_markers(
            terrain.pos, terrain.vel, terrain.kind, terrain.body_id,
            terrain.bce_local, bodies.x, bodies.q, bodies.v, bodies.w)
        terrain = terrain.replace(pos=pos, vel=vel)
        feat, aux, perm, ov = eng["bin"](terrain, extras_of(terrain))
        if whole_outer and eng.get("nx_act") is not None \
                and eng["nx_act"] < feat[0].shape[0]:
            # the whole-outer kernel only sweeps rows [0, nx_act): any
            # valid marker binned above (splash past clip_z + support)
            # violates the static trim — surface it through the overflow
            # counter like the other occupancy asserts
            na = eng["nx_act"]
            hi = jnp.maximum(jnp.max(feat[0][na:, 15]),
                             jnp.max(feat[1][na:, 15]))
            ov = jnp.maximum(ov, (hi > 0).astype(jnp.int32))
        (feat, bodies, t), _ = lax.scan(
            functools.partial(outer_body, aux=aux), (feat, bodies, t),
            None, length=chunk_len)
        if dual:
            st2 = pencils_to_crm_state_dual(feat[0], feat[1], perm, terrain)
        else:
            st2 = pencils_to_crm_state(feat, perm, terrain)
        return bodies, st2, t, ov

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: CRMFSIState, n_outer: int):
        bodies, terrain, t = state.bodies, state.terrain, state.time
        ovf = jnp.zeros((), jnp.int32)
        n_chunks, rem = divmod(n_outer, rebuild_outer)

        if n_chunks:
            # scan over rebuild cycles (one traced chunk, not unrolled)
            def chunk_body(carry, _):
                bodies, terrain, t, ovf = carry
                bodies, terrain, t, ov = run_chunk(bodies, terrain, t,
                                                   rebuild_outer)
                return (bodies, terrain, t, jnp.maximum(ovf, ov)), None

            (bodies, terrain, t, ovf), _ = lax.scan(
                chunk_body, (bodies, terrain, t, ovf), None,
                length=n_chunks)
        if rem:
            bodies, terrain, t, ov = run_chunk(bodies, terrain, t, rem)
            ovf = jnp.maximum(ovf, ov)
        return CRMFSIState(bodies=bodies, terrain=terrain, time=t), ovf

    return advance
