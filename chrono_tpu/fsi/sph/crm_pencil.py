"""Pencil-layout CRM driver: binning + symmetric-sweep substeps on TPU.

The CRM analogue of fsi.sph.pencil: markers (with their stress tensors and
granular/integrate flags) are binned into (NXY, 16, C, NZp) pencil planes
once per outer step, the elastoplastic substeps run as the two fused
symmetric Pallas sweeps of ops.pallas.crm_sym_kernel, and the final
granular-reaction acceleration (for the BCE force reduction) comes from
one extra forces-only sweep at the final state.  This is the engine that
makes BASELINE config #5 (vehicle on CRM terrain) scale on TPU — the
gather backend's (N, K) neighbor tensors are the known-bad layout there.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.fsi.sph.state import FLUID, FROZEN
from chrono_tpu.fsi.sph.crm import CRMState, CRMParams
from chrono_tpu.fsi.sph.pencil import bin_to_pencils
from chrono_tpu.ops.pallas.crm_sym_kernel import (
    crm_substep_sym, crm_static_params,
)
from chrono_tpu.ops.pallas.dem_sym_kernel import edge_ok_fwd
from chrono_tpu.fsi.sph.system import KERNELS


def _crm_feats(st: CRMState):
    gran = ((st.kind == FLUID) | (st.kind == FROZEN)).astype(jnp.float32)
    integ = (st.kind == FLUID).astype(jnp.float32)
    return [st.pos[:, 0], st.pos[:, 1], st.pos[:, 2],
            st.vel[:, 0], st.vel[:, 1], st.vel[:, 2], st.rho,
            st.tau_d[:, 0], st.tau_d[:, 1], st.tau_d[:, 2],
            st.tau_o[:, 0], st.tau_o[:, 1], st.tau_o[:, 2],
            gran, integ]


def crm_state_to_pencils(grid, capacity, nzp, st: CRMState, perm=(0, 1, 2)):
    """``perm``: axis permutation for BINNING only — pencil axis 2 (the
    128-lane dimension) gets original axis perm[2].  Feature planes always
    carry the real (x, y, z) coordinates; only the cell assignment is
    permuted, so flat terrains can put their LONG axis in the lanes
    instead of wasting 90% of a 128-lane tile on a 10-cell depth."""
    return bin_to_pencils(grid, capacity, nzp, st.pos[:, list(perm)],
                          _crm_feats(st))


def pencils_to_crm_state(feat, perm, st: CRMState) -> CRMState:
    def grab(f):
        return feat[:, f].reshape(-1)[perm]

    pos = jnp.stack([grab(0), grab(1), grab(2)], axis=1)
    vel = jnp.stack([grab(3), grab(4), grab(5)], axis=1)
    tau_d = jnp.stack([grab(7), grab(8), grab(9)], axis=1)
    tau_o = jnp.stack([grab(10), grab(11), grab(12)], axis=1)
    return st.replace(pos=pos, vel=vel, rho=grab(6), tau_d=tau_d,
                      tau_o=tau_o)


def pencils_to_crm_state_dual(featA, featB, perm, st: CRMState) -> CRMState:
    """Dual-field unbinner: perm indexes the virtual [A | B] plane concat
    (see pencil.bin_to_flat_dual).  Markers clipped out of the binning
    (perm pointing at the discard bucket) keep their previous state — used
    for wheel-rim BCE markers above the bed, whose kinematics are
    recomputed from the body states at every rebuild anyway."""
    size = featA.shape[0] * featA.shape[2] * featA.shape[3] \
        + featB.shape[0] * featB.shape[2] * featB.shape[3]
    binned = perm < size

    def grab(f, old):
        got = jnp.concatenate(
            [featA[:, f].reshape(-1), featB[:, f].reshape(-1)]
        )[jnp.minimum(perm, size - 1)]
        return jnp.where(binned, got, old)

    pos = jnp.stack([grab(k, st.pos[:, k]) for k in range(3)], axis=1)
    vel = jnp.stack([grab(3 + k, st.vel[:, k]) for k in range(3)], axis=1)
    tau_d = jnp.stack([grab(7 + k, st.tau_d[:, k]) for k in range(3)],
                      axis=1)
    tau_o = jnp.stack([grab(10 + k, st.tau_o[:, k]) for k in range(3)],
                      axis=1)
    return st.replace(pos=pos, vel=vel, rho=grab(6, st.rho), tau_d=tau_d,
                      tau_o=tau_o)


def make_crm_dual_engine(params, crm: CRMParams, grid: GridSpec,
                         CA: int = 16, CB: int = 16, Bxy: int = 1,
                         interpret: bool = False, clip_z: float = None):
    """Two-tier flat-lane CRM engine (ops.pallas.flatlane_dual_kernel).

    Rows = the SHORTEST grid axis (for a terrain bed: the vertical — most
    of its rows are air above the bed, skipped by the per-row activity
    masks), lanes = the other two packed.  Field A carries the first CA
    markers of each cell (the typical bed cell), field B the spill (wheel
    contact, wall-layer stacks) — so spill-free row blocks pay only the
    dense CA x CA lattice.  Reference role: SetActiveDomain + the sorted
    per-cell marker layout of the reference FSI data manager
    (/root/reference/src/chrono_fsi/sph/ChFsiProblemSPH.h active domains).

    Same engine-dict contract as make_crm_pencil_engine, with
    dual=True: feats are (featA, featB) tuples.
    """
    from chrono_tpu.fsi.sph.pencil import bin_to_flat_dual

    support = KERNELS[params.kernel][2]
    if float(grid.cell_size) < support * float(params.h) - 1e-9:
        raise ValueError("cell below kernel support")
    if any(grid.periodic):
        raise ValueError("dual CRM supports non-periodic boxes")
    order = int(np.argmin(grid.dims))
    rest = sorted([a for a in range(3) if a != order],
                  key=lambda a: grid.dims[a])
    aperm = (order, rest[0], rest[1])
    pdims = tuple(grid.dims[a] for a in aperm)
    pgrid = GridSpec(origin=tuple(grid.origin[a] for a in aperm),
                     cell_size=grid.cell_size, dims=pdims)
    from chrono_tpu.fsi.sph.pencil import flat_lane_geometry
    SZ, NL = flat_lane_geometry(pgrid)
    cp = crm_static_params(params, crm)

    from chrono_tpu.fsi.sph.state import RIGID_BCE

    def bin_all(st, extra_feats=()):
        keep = None
        if clip_z is not None:
            # rigid-BCE markers above clip_z (wheel-rim top, beyond the bed
            # surface + kernel support) cannot interact with soil within a
            # rebuild chunk: drop them from the binning so their rows/cells
            # cost nothing.  The unbinner holds their state; kinematics are
            # recomputed from body poses every rebuild (the active-domain
            # role of the reference's SetActiveDomain,
            # /root/reference/src/chrono_fsi/sph/ChFsiProblemSPH.h)
            keep = ~((st.kind == RIGID_BCE) & (st.pos[:, 2] > clip_z))
        pA, pB, perm, ovf = bin_to_flat_dual(
            pgrid, CA, CB, SZ, NL, st.pos[:, list(aperm)],
            _crm_feats(st) + list(extra_feats), keep=keep)
        nE = len(extra_feats)
        if nE:
            fA = jnp.concatenate([pA[:, :15], pA[:, -1:]], axis=1)
            fB = jnp.concatenate([pB[:, :15], pB[:, -1:]], axis=1)
            return ((fA, fB), (pA[:, 15:15 + nE], pB[:, 15:15 + nE]),
                    perm, ovf)
        return (pA, pB), ((pA[:, :0]), (pB[:, :0])), perm, ovf

    def rows_of(feat):
        fA, fB = feat
        return (jnp.max(fA[:, -1], axis=(1, 2)) > 0).astype(jnp.int32), \
            (jnp.max(fB[:, -1], axis=(1, 2)) > 0).astype(jnp.int32)

    from chrono_tpu.ops.pallas.crm_sym_kernel import crm_substep_sym_dual

    kw = dict(cp=cp, grid_dims=pdims, SZ=SZ, CA=CA, CB=CB, Bxy=Bxy,
              interpret=interpret)

    def substep(feat):
        rowA, rowB = rows_of(feat)
        return crm_substep_sym_dual(feat[0], feat[1], rowA, rowB, **kw)

    def substep_acc(feat):
        rowA, rowB = rows_of(feat)
        return crm_substep_sym_dual(feat[0], feat[1], rowA, rowB,
                                    with_acc=True, **kw)

    def forces(feat):
        rowA, rowB = rows_of(feat)
        return crm_substep_sym_dual(feat[0], feat[1], rowA, rowB,
                                    forces_only=True, **kw)

    # whole-outer fused path (ops.pallas.crm_outer_kernel): static active-
    # row bound from the clip_z geometry when rows are the vertical axis —
    # granular markers can only reach clip_z + support between rebuilds
    # (rigid markers above clip_z are dropped by the binner); the driver
    # asserts the trim via row occupancy
    nx_act = None
    if clip_z is not None and aperm[0] == 2:
        cell = float(grid.cell_size)
        z0 = float(grid.origin[2])
        bound = float(clip_z) + support * float(params.h)
        nx_act = min(pdims[0], int(np.ceil((bound - z0) / cell)) + 1)

    from chrono_tpu.ops.pallas.crm_outer_kernel import crm_outer_substeps

    def outer(feat, n_substeps):
        return crm_outer_substeps(
            feat[0], feat[1], cp=cp, grid_dims=pdims, SZ=SZ, CA=CA, CB=CB,
            n_substeps=n_substeps, nx_act=nx_act, interpret=interpret)

    return dict(bin=bin_all, substep=substep, substep_acc=substep_acc,
                forces=forces, outer=outer, nx_act=nx_act,
                layout="flat2", aperm=aperm, dual=True)


def make_crm_pencil_engine(params, crm: CRMParams, grid: GridSpec,
                           capacity: int = 16, Bxy: int = 4,
                           interpret: bool = False, layout: str = "auto"):
    """Shared layout/kernel plumbing for the pencil CRM drivers.

    Returns a dict with:
      bin(st, extra_feats=()) -> (feat (RB, 16, C, NL), extras (RB, E, C,
        NL) binned through the SAME sort, perm, overflow)
      substep(feat) -> feat   (one elastoplastic substep, fused sweeps)
      forces(feat)  -> (RB, 3, C, NL) granular-reaction acceleration planes
      layout, aperm (binning axis permutation)

    ``layout``: "pencil" (rows = xy, lanes = z), "flat" (rows = longest
    axis, lanes = packed (y, z) — ops.pallas.flatlane_kernel, the engine for
    small grids where no axis fills 128 lanes), or "auto" (flat when the
    pencil layout would use <60% of its lane tiles and the packed lanes fit
    VMEM — e.g. the vehicle-on-CRM demo bed at (22, 16, 19) cells runs
    5-6x better utilized flat)."""
    from chrono_tpu.fsi.sph.pencil import (
        bin_to_flat, bin_to_pencils, flat_lane_geometry,
    )

    support = KERNELS[params.kernel][2]
    if float(grid.cell_size) < support * float(params.h) - 1e-9:
        raise ValueError("cell below kernel support")
    if any(grid.periodic):
        raise ValueError("pencil CRM supports non-periodic boxes")
    # auto axis permutation: rows = LONGEST axis; for the flat layout the
    # remaining two pack as (y = smaller, z = larger) to minimize NL
    order = int(np.argmax(grid.dims))
    rest = sorted([a for a in range(3) if a != order],
                  key=lambda a: grid.dims[a])
    cp = crm_static_params(params, crm)

    if layout == "auto":
        fdims = (grid.dims[order], grid.dims[rest[0]], grid.dims[rest[1]])
        SZ, NL = flat_lane_geometry(
            GridSpec(origin=(0, 0, 0), cell_size=grid.cell_size,
                     dims=fdims))
        pencil_nz = grid.dims[order]        # pencil puts longest in lanes
        pencil_util = pencil_nz / (((pencil_nz + 2 + 127) // 128) * 128)
        layout = "flat" if (NL <= 1024 and pencil_util < 0.6) else "pencil"

    if layout == "flat":
        aperm = (order, rest[0], rest[1])   # rows = longest, z = larger
        pdims = tuple(grid.dims[a] for a in aperm)
        pgrid = GridSpec(origin=tuple(grid.origin[a] for a in aperm),
                         cell_size=grid.cell_size, dims=pdims)
        SZ, NL = flat_lane_geometry(pgrid)

        def bin_all(st, extra_feats=()):
            planes, perm, ovf = bin_to_flat(
                pgrid, capacity, SZ, NL, st.pos[:, list(aperm)],
                _crm_feats(st) + list(extra_feats))
            return _split_extras(planes, len(extra_feats)) + (perm, ovf)

        sub_kw = dict(cp=cp, grid_dims=pdims, C=capacity, Bxy=Bxy,
                      interpret=interpret, layout="flat", SZ=SZ)
        edge = None
    else:
        aperm = (rest[0], rest[1], order)
        pdims = tuple(grid.dims[a] for a in aperm)
        pgrid = GridSpec(origin=tuple(grid.origin[a] for a in aperm),
                         cell_size=grid.cell_size, dims=pdims)
        nzp = ((pdims[2] + 1 + 127) // 128) * 128

        def bin_all(st, extra_feats=()):
            planes, perm, ovf = bin_to_pencils(
                pgrid, capacity, nzp, st.pos[:, list(aperm)],
                _crm_feats(st) + list(extra_feats))
            return _split_extras(planes, len(extra_feats)) + (perm, ovf)

        sub_kw = dict(cp=cp, grid_dims=pdims, C=capacity, Bxy=Bxy,
                      interpret=interpret)
        edge = edge_ok_fwd(pdims)

    def _split_extras(planes, n_extra):
        # binners append VALID last; the kernel wants it at plane 15
        if n_extra == 0:
            return planes, planes[:, :0]
        feat = jnp.concatenate([planes[:, :15], planes[:, -1:]], axis=1)
        return feat, planes[:, 15:15 + n_extra]

    def substep(feat):
        return crm_substep_sym(feat, edge, **sub_kw)

    def substep_acc(feat):
        """(feat2, acc): acc = M-sweep granular acceleration at the
        pre-substep state — a free by-product replacing a forces() sweep
        for explicit couplings (one substep staler than forces(feat2))."""
        return crm_substep_sym(feat, edge, with_acc=True, **sub_kw)

    def forces(feat):
        return crm_substep_sym(feat, edge, forces_only=True, **sub_kw)

    return dict(bin=bin_all, substep=substep, substep_acc=substep_acc,
                forces=forces, layout=layout, aperm=aperm)


def make_crm_substeps_pencil(params, crm: CRMParams, grid: GridSpec,
                             capacity: int = 16, Bxy: int = 4,
                             interpret: bool = False, layout: str = "auto"):
    """substeps(st, n) -> (st2, dv (N,3), overflow) on the pencil engine —
    the drop-in replacement for the gather `substeps` in crm_fsi_step."""
    eng = make_crm_pencil_engine(params, crm, grid, capacity, Bxy,
                                 interpret, layout)

    def substeps(st: CRMState, n_substeps: int):
        feat, _, perm, ovf = eng["bin"](st)

        def inner(f, _):
            return eng["substep"](f), None

        feat, _ = lax.scan(inner, feat, None, length=n_substeps)
        acc = eng["forces"](feat)
        st2 = pencils_to_crm_state(feat, perm, st)
        dv = jnp.stack([acc[:, k].reshape(-1)[perm] for k in range(3)],
                       axis=1)
        return st2, dv, ovf

    return substeps


def make_crm_substeps_dual(params, crm: CRMParams, grid: GridSpec,
                           CA: int = 16, CB: int = 16, Bxy: int = 1,
                           interpret: bool = False):
    """substeps(st, n) -> (st2, dv, overflow) on the two-tier engine —
    same contract as make_crm_substeps_pencil (used for parity tests and
    the per-outer driver)."""
    eng = make_crm_dual_engine(params, crm, grid, CA, CB, Bxy, interpret)

    def substeps(st: CRMState, n_substeps: int):
        feat, _, perm, ovf = eng["bin"](st)

        def inner(f, _):
            return eng["substep"](f), None

        feat, _ = lax.scan(inner, feat, None, length=n_substeps)
        accA, accB = eng["forces"](feat)
        st2 = pencils_to_crm_state_dual(feat[0], feat[1], perm, st)
        dv = jnp.stack(
            [jnp.concatenate([accA[:, k].reshape(-1),
                              accB[:, k].reshape(-1)])[perm]
             for k in range(3)], axis=1)
        return st2, dv, ovf

    return substeps


def make_crm_advance_pencil(params, crm: CRMParams, grid: GridSpec,
                            capacity: int = 16, Bxy: int = 4,
                            interpret: bool = False):
    """advance(state, n_cycles) -> (state, overflow): terrain-only stepping
    (the pencil counterpart of fsi.sph.crm.make_crm_advance_fn)."""
    subs = make_crm_substeps_pencil(params, crm, grid, capacity, Bxy,
                                    interpret)

    def one_cycle(st):
        st, _, ovf = subs(st, params.rebuild_every)
        return st.replace(time=st.time + params.dt * params.rebuild_every), \
            ovf

    cycle_jit = jax.jit(one_cycle)

    def advance(state: CRMState, n_cycles: int):
        ovf = jnp.zeros((), jnp.int32)
        for _ in range(n_cycles):
            state, ov = cycle_jit(state)
            ovf = jnp.maximum(ovf, ov)
        return state, ovf

    return advance
