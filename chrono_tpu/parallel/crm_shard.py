"""Sharded CRM granular terrain on the flat-lane Pallas engine.

The capstone scale-out path (BASELINE config #5 "single multi-chip TPU
program"; SURVEY §5 spatial scaling): the CRM deformable-terrain sweeps
(`ops.pallas.crm_sym_kernel`, the engine behind the vehicle-on-CRM bench)
run over an x-slab `jax.sharding.Mesh` with the SAME halo-row scheme as
the sharded DEM path (`parallel.pallas_dem`):

  * feature planes are (rows = x, F, C, NL) — a slab is a contiguous row
    range, its halo is ONE row per face;
  * per-substep halo refresh = one `lax.ppermute` of an (F, C, NL) plane
    per direction;
  * marker migration (positions + velocity + density + stress + kind)
    rides the shared `parallel.domains.make_exchange` machinery once per
    rebuild cycle.

The reference's CRM solver is strictly single-GPU
(/root/reference/src/chrono_fsi/sph — no MPI; SURVEY §2 note); its
vehicle-on-granular scale-out is functional MPI co-simulation
(cosim/ChVehicleCosimBaseNode.h), not domain decomposition.  This module
is the TPU-native answer: one SPMD program, terrain sharded over ICI.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.parallel.domains import SlabSpec, make_exchange
from chrono_tpu.fsi.sph.state import FLUID, FROZEN
from chrono_tpu.fsi.sph.pencil import bin_to_flat, flat_lane_geometry
from chrono_tpu.fsi.sph.crm import CRMParams, CRMState
from chrono_tpu.fsi.sph.crm_pencil import crm_static_params
from chrono_tpu.ops.pallas.crm_sym_kernel import crm_substep_sym


def crm_slab_extra(st: CRMState):
    """(N, 8) per-marker persistent fields that ride migration alongside
    pos/vel: rho, tau_d (3), tau_o (3), kind."""
    return jnp.concatenate(
        [st.rho[:, None], st.tau_d, st.tau_o,
         st.kind.astype(jnp.float32)[:, None]], axis=1)


def make_sharded_crm_advance(spec: SlabSpec, mesh: Mesh, params,
                             crm: CRMParams, grid: GridSpec,
                             n_substeps: int, capacity: int = 16,
                             Bxy: int = 4, axis: str = "dp",
                             interpret: bool = False):
    """Sharded CRM advance.  ``grid``: GLOBAL grid; ``grid.dims[0]`` must
    split over ``spec.n_slabs`` with slab faces on cell boundaries.

    Returns ``advance(pos, vel, extra, valid, n_cycles) -> (pos, vel,
    extra, valid, overflow)`` on (D, Cap, ·) slab buffers (``extra`` from
    :func:`crm_slab_extra`); each cycle = migrate → bin → ``n_substeps``
    CRM substeps with per-substep halo refresh → un-bin.
    """
    D = spec.n_slabs
    nx, ny, nz = grid.dims
    if nx % D:
        raise ValueError(f"grid nx={nx} not divisible by {D} slabs")
    nxl = nx // D
    cell = float(grid.cell_size)
    if abs(spec.width - nxl * cell) > 1e-6 * cell:
        raise ValueError("spec.width must equal nx_local * cell_size")
    if abs(spec.x0 - grid.origin[0]) > 1e-6 * cell:
        raise ValueError("spec.x0 must equal grid.origin[0]")
    if any(grid.periodic):
        raise ValueError("flat CRM backend supports non-periodic boxes")

    lgrid = GridSpec(origin=(0.0, grid.origin[1], grid.origin[2]),
                     cell_size=cell, dims=(nxl, ny, nz))
    SZ, NL = flat_lane_geometry(lgrid)
    kdims = (nxl + 2, ny, nz)            # owned rows + 1 halo row per face
    cp = crm_static_params(params, crm)
    sub_kw = dict(cp=cp, grid_dims=kdims, C=capacity, Bxy=Bxy,
                  interpret=interpret, layout="flat", SZ=SZ)

    exchange = make_exchange(spec, axis, n_halo_extra_cols=0)
    right_perm = [(i, i + 1) for i in range(D - 1)]
    left_perm = [(i + 1, i) for i in range(D - 1)]

    def fill_halos(feat):
        from_left = lax.ppermute(feat[nxl], axis, right_perm)
        from_right = lax.ppermute(feat[1], axis, left_perm)
        return jnp.concatenate(
            [from_left[None], feat[1:nxl + 1], from_right[None]], axis=0)

    def device_cycle(pos, vel, extra, valid):
        squeeze = pos.ndim == 3
        if squeeze:
            pos, vel, extra, valid = pos[0], vel[0], extra[0], valid[0]
        (pos, vel, extra, valid, _hp, _hv, _hx, _hm, _hi,
         mig_overflow) = exchange(pos, vel, extra, valid)
        rho = extra[:, 0]
        tau_d = extra[:, 1:4]
        tau_o = extra[:, 4:7]
        kind = extra[:, 7]

        # feature planes (crm_pencil._crm_feats order) with slab-local
        # binning coordinates, global positions stored
        d = lax.axis_index(axis)
        x_shift = (spec.x0 + spec.width * d.astype(pos.dtype))
        gran = (((kind == FLUID) | (kind == FROZEN))
                .astype(pos.dtype))
        integ = (kind == FLUID).astype(pos.dtype)
        feats = [pos[:, 0], pos[:, 1], pos[:, 2],
                 vel[:, 0], vel[:, 1], vel[:, 2], rho,
                 tau_d[:, 0], tau_d[:, 1], tau_d[:, 2],
                 tau_o[:, 0], tau_o[:, 1], tau_o[:, 2], gran, integ]
        bpos = jnp.stack([pos[:, 0] - x_shift, pos[:, 1], pos[:, 2]],
                         axis=1)
        # route invalid slots to the discard bucket
        planes, perm, bin_ovf = bin_to_flat(lgrid, capacity, SZ, NL, bpos,
                                            feats, keep=valid)
        feat = jnp.pad(planes, ((1, 1), (0, 0), (0, 0), (0, 0)))
        feat = fill_halos(feat)

        def substep(f, __):
            f2 = crm_substep_sym(f, None, **sub_kw)
            return fill_halos(f2), None

        feat, _ = lax.scan(substep, feat, None, length=n_substeps)
        own = feat[1:nxl + 1]

        def grab(f):
            return own[:, f].reshape(-1)[perm]

        pos2 = jnp.stack([grab(0), grab(1), grab(2)], axis=1)
        vel2 = jnp.stack([grab(3), grab(4), grab(5)], axis=1)
        extra2 = jnp.stack([grab(6), grab(7), grab(8), grab(9), grab(10),
                            grab(11), grab(12), kind], axis=1)
        pos2 = jnp.where(valid[:, None], pos2, 1e30)
        vel2 = jnp.where(valid[:, None], vel2, 0.0)
        extra2 = jnp.where(valid[:, None], extra2, 0.0)
        overflow = jnp.maximum(mig_overflow, bin_ovf)
        if squeeze:
            return (pos2[None], vel2[None], extra2[None], valid[None],
                    overflow[None])
        return pos2, vel2, extra2, valid, overflow

    sharded = shard_map(
        device_cycle, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    cycle_jit = jax.jit(sharded)

    def advance(pos, vel, extra, valid, n_cycles: int):
        ovf = jnp.zeros((), jnp.int32)
        for _ in range(n_cycles):
            pos, vel, extra, valid, ov = cycle_jit(pos, vel, extra, valid)
            ovf = jnp.maximum(ovf, ov.max())
        return pos, vel, extra, valid, ovf

    return advance


def crm_vehicle_slab_extra(st: CRMState):
    """(N, 12) per-marker payload for the VEHICLE-coupled sharded path:
    rho, tau_d (3), tau_o (3), kind, body_id+1 (0 for non-rigid), and the
    body-local BCE offset (3) — the rigid-marker kinematic/force coupling
    state rides migration with its marker."""
    from chrono_tpu.fsi.sph.state import RIGID_BCE
    bid = jnp.where(st.kind == RIGID_BCE, st.body_id + 1, 0)
    return jnp.concatenate(
        [st.rho[:, None], st.tau_d, st.tau_o,
         st.kind.astype(jnp.float32)[:, None],
         bid.astype(jnp.float32)[:, None], st.bce_local], axis=1)


def make_sharded_crm_vehicle_advance(
        spec: SlabSpec, mesh: Mesh, params, crm: CRMParams, grid: GridSpec,
        model, wheel_bodies, n_substeps: int, capacity: int = 16,
        Bxy: int = 4, axis: str = "dp", interpret: bool = False,
        mbs_settings=None, f_ext_fn=None):
    """ONE multi-chip vehicle-on-CRM program (BASELINE config #5 scale-out).

    The terrain is sharded over x-slabs exactly as
    :func:`make_sharded_crm_advance`; the vehicle rides INSIDE the same
    SPMD program: the MBS state is replicated on every device, wheel-BCE
    marker kinematics are applied locally on whichever slab currently owns
    each marker (they migrate with the soil), per-body force/torque
    partials are reduced per slab and ``lax.psum``-summed over the mesh,
    and the implicit MBS step runs replicated — deterministic, so every
    device holds the same body state with no broadcast.

    Reference analogue (deliberately different mechanism): the MPI
    co-simulation node tree of
    /root/reference/src/chrono_vehicle/cosim/ChVehicleCosimBaseNode.h:96-196
    (vehicle node + terrain node exchanging forces over MPI) and the
    single-GPU flagship demo
    demo_VEH_CRMTerrain_WheeledVehicle.cpp:171-204 — here both sides live
    in one SPMD program over ICI collectives instead.

    Returns ``advance(pos, vel, extra, valid, bodies, t, n_outer)`` with
    ``extra`` from :func:`crm_vehicle_slab_extra`; each outer step =
    migrate → BCE kinematics → bin → n_substeps sweeps (halo refresh) →
    forces sweep → psum'd body loads → replicated MBS step → un-bin.
    """
    from chrono_tpu.core import quaternion as Q
    from chrono_tpu.physics.system import (
        SolverSettings, step_euler_implicit_linearized,
    )

    if mbs_settings is None:
        mbs_settings = SolverSettings(solver="direct")
    D = spec.n_slabs
    nx, ny, nz = grid.dims
    if nx % D:
        raise ValueError(f"grid nx={nx} not divisible by {D} slabs")
    nxl = nx // D
    cell = float(grid.cell_size)
    lgrid = GridSpec(origin=(0.0, grid.origin[1], grid.origin[2]),
                     cell_size=cell, dims=(nxl, ny, nz))
    SZ, NL = flat_lane_geometry(lgrid)
    kdims = (nxl + 2, ny, nz)
    cp = crm_static_params(params, crm)
    sub_kw = dict(cp=cp, grid_dims=kdims, C=capacity, Bxy=Bxy,
                  interpret=interpret, layout="flat", SZ=SZ)
    wheel_list = [int(w) for w in np.asarray(wheel_bodies).reshape(-1)]
    m_marker = float(params.rho0) * float(params.d0) ** 3
    h_outer = float(params.dt) * n_substeps

    exchange = make_exchange(spec, axis, n_halo_extra_cols=0)
    right_perm = [(i, i + 1) for i in range(D - 1)]
    left_perm = [(i + 1, i) for i in range(D - 1)]

    def fill_halos(feat):
        from_left = lax.ppermute(feat[nxl], axis, right_perm)
        from_right = lax.ppermute(feat[1], axis, left_perm)
        return jnp.concatenate(
            [from_left[None], feat[1:nxl + 1], from_right[None]], axis=0)

    def device_outer(pos, vel, extra, valid, bodies, t):
        squeeze = pos.ndim == 3
        if squeeze:
            pos, vel, extra, valid = pos[0], vel[0], extra[0], valid[0]
        (pos, vel, extra, valid, _hp, _hv, _hx, _hm, _hi,
         mig_overflow) = exchange(pos, vel, extra, valid)
        rho, tau_d = extra[:, 0], extra[:, 1:4]
        tau_o, kind = extra[:, 4:7], extra[:, 7]
        bid, loc = extra[:, 8], extra[:, 9:12]

        # wheel-BCE kinematics from the replicated body state, applied on
        # whichever slab owns each marker right now (bce.update_rigid_
        # markers, marker-level)
        for w in wheel_list:
            mk = ((bid == w + 1) & valid)[:, None]
            Rw = Q.q_to_matrix(bodies.q[w])
            r_w = loc @ Rw.T
            om = Q.qrotate(bodies.q[w], bodies.w[w])
            pos = jnp.where(mk, bodies.x[w] + r_w, pos)
            vel = jnp.where(mk, bodies.v[w] + jnp.cross(
                jnp.broadcast_to(om, r_w.shape), r_w), vel)

        d = lax.axis_index(axis)
        x_shift = (spec.x0 + spec.width * d.astype(pos.dtype))
        gran = (((kind == FLUID) | (kind == FROZEN))).astype(pos.dtype)
        integ = (kind == FLUID).astype(pos.dtype)
        feats = [pos[:, 0], pos[:, 1], pos[:, 2],
                 vel[:, 0], vel[:, 1], vel[:, 2], rho,
                 tau_d[:, 0], tau_d[:, 1], tau_d[:, 2],
                 tau_o[:, 0], tau_o[:, 1], tau_o[:, 2], gran, integ, bid]
        bpos = jnp.stack([pos[:, 0] - x_shift, pos[:, 1], pos[:, 2]],
                         axis=1)
        planes, perm, bin_ovf = bin_to_flat(lgrid, capacity, SZ, NL, bpos,
                                            feats, keep=valid)
        # bid rides the sort as an aux plane; the kernel sees its 16
        bidp = planes[:, 15]
        feat = jnp.concatenate([planes[:, :15], planes[:, 16:17]], axis=1)
        feat = jnp.pad(feat, ((1, 1), (0, 0), (0, 0), (0, 0)))
        feat = fill_halos(feat)

        def substep(f, __):
            f2 = crm_substep_sym(f, None, **sub_kw)
            return fill_halos(f2), None

        feat, _ = lax.scan(substep, feat, None, length=n_substeps)
        acc = crm_substep_sym(feat, None, forces_only=True, **sub_kw)
        acc_own = acc[1:nxl + 1]
        pos_own = feat[1:nxl + 1, 0:3]

        # per-body force/torque partials on this slab, psum'd over the mesh
        f_b = jnp.zeros((model.n_bodies, 3), pos.dtype)
        tau_b = jnp.zeros((model.n_bodies, 3), pos.dtype)
        for w in wheel_list:
            mk = m_marker * (bidp == w + 1).astype(pos.dtype)
            ax, ay, az = (mk * acc_own[:, 0], mk * acc_own[:, 1],
                          mk * acc_own[:, 2])
            rx = pos_own[:, 0] - bodies.x[w, 0]
            ry = pos_own[:, 1] - bodies.x[w, 1]
            rz = pos_own[:, 2] - bodies.x[w, 2]
            f_b = f_b.at[w].set(jnp.stack(
                [jnp.sum(ax), jnp.sum(ay), jnp.sum(az)]))
            tau_b = tau_b.at[w].set(jnp.stack(
                [jnp.sum(ry * az - rz * ay),
                 jnp.sum(rz * ax - rx * az),
                 jnp.sum(rx * ay - ry * ax)]))
        f_b = lax.psum(f_b, axis)
        tau_b = lax.psum(tau_b, axis)
        tau_local = Q.qrotate_inv(bodies.q, tau_b)

        f_drv = tau_drv = None
        if f_ext_fn is not None:
            f_drv, tau_drv = f_ext_fn(t, bodies)
        f_tot = f_b if f_drv is None else f_b + f_drv
        tau_tot = tau_local if tau_drv is None else tau_local + tau_drv
        # replicated MBS step: identical inputs on every device ->
        # identical body state, no broadcast needed
        bodies2, _ = step_euler_implicit_linearized(
            model, bodies, t, h_outer, mbs_settings,
            f_ext=f_tot, tau_ext=tau_tot)

        own = feat[1:nxl + 1]

        def grab(f):
            return own[:, f].reshape(-1)[perm]

        pos2 = jnp.stack([grab(0), grab(1), grab(2)], axis=1)
        vel2 = jnp.stack([grab(3), grab(4), grab(5)], axis=1)
        extra2 = jnp.concatenate(
            [jnp.stack([grab(6), grab(7), grab(8), grab(9), grab(10),
                        grab(11), grab(12)], axis=1),
             kind[:, None], bid[:, None], loc], axis=1)
        pos2 = jnp.where(valid[:, None], pos2, 1e30)
        vel2 = jnp.where(valid[:, None], vel2, 0.0)
        extra2 = jnp.where(valid[:, None], extra2, 0.0)
        overflow = jnp.maximum(mig_overflow, bin_ovf)
        if squeeze:
            return (pos2[None], vel2[None], extra2[None], valid[None],
                    overflow[None], bodies2, t + h_outer)
        return pos2, vel2, extra2, valid, overflow, bodies2, t + h_outer

    rep = P()         # replicated spec for the body pytree / scalars
    sharded = shard_map(
        device_outer, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), rep, rep),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), rep, rep),
        check_vma=False,
    )
    cycle_jit = jax.jit(sharded)

    def advance(pos, vel, extra, valid, bodies, t, n_outer: int):
        ovf = jnp.zeros((), jnp.int32)
        for _ in range(n_outer):
            (pos, vel, extra, valid, ov, bodies, t) = cycle_jit(
                pos, vel, extra, valid, bodies, t)
            ovf = jnp.maximum(ovf, ov.max())
        return pos, vel, extra, valid, bodies, t, ovf

    return advance
