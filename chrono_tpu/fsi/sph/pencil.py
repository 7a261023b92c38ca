"""Pencil-layout WCSPH driver: binning + substep scan on TPU planes.

Pairs chrono_tpu.ops.pallas.sph_pencil_kernel with the SPHState API: markers
are binned into (NXY, 9, C, NZp) feature planes once per cycle (sort +
scatter, like dem.cell_dense.to_cells), the symplectic substep runs as four
Pallas sweeps entirely on planes, and particles are gathered back out at the
cycle boundary.

Why it exists: the gather/neighbor-list SPH backend materializes (N, K≈96)
neighbor tensors whose TPU layouts explode (measured: a 107 GB allocation at
N = 100k) — the reference's CUDA neighbor lists have no TPU-shaped
equivalent, so the SPH hot loop gets the same dense-pencil treatment as DEM
(reference counterpart: the whole SphForceWCSPH.cu kernel suite).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from chrono_tpu.collision.cell_list import GridSpec, cell_ijk
from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.fsi.sph.state import SPHParams, SPHState, FLUID
from chrono_tpu.ops.pallas.sph_pencil_kernel import (
    sph_substep_pencil, sph_static_params, F_FEAT,
)
from chrono_tpu.ops.pallas.dem_pencil_kernel import edge_ok_xy


@pytree_dataclass
class PencilGrid:
    """Anisotropic pencil binning grid: FLAT cells (cell_z = h, cell_xy =
    2h) equalize slot occupancy between bulk fluid and stacked wall layers —
    the kernel support is covered by dz ∈ ±2 lane rotations instead of a
    taller cell, cutting the per-cell C² pair budget ~4x."""

    origin: object = static_field()      # (3,) floats
    cell_xy: float = static_field()
    cell_z: float = static_field()
    dims: object = static_field()        # (nx, ny, nz)

    @staticmethod
    def for_box(lo, hi, h, support=2.0):
        cxy = support * h
        cz = h
        lo = tuple(float(v) for v in lo)
        dims = (int(np.ceil((hi[0] - lo[0]) / cxy)),
                int(np.ceil((hi[1] - lo[1]) / cxy)),
                int(np.ceil((hi[2] - lo[2]) / cz)))
        return PencilGrid(origin=lo, cell_xy=cxy, cell_z=cz, dims=dims)


def _pencil_ijk(pg: PencilGrid, pos):
    o = jnp.asarray(pg.origin, pos.dtype)
    ix = jnp.clip(((pos[:, 0] - o[0]) / pg.cell_xy).astype(jnp.int32),
                  0, pg.dims[0] - 1)
    iy = jnp.clip(((pos[:, 1] - o[1]) / pg.cell_xy).astype(jnp.int32),
                  0, pg.dims[1] - 1)
    iz = jnp.clip(((pos[:, 2] - o[2]) / pg.cell_z).astype(jnp.int32),
                  0, pg.dims[2] - 1)
    return ix, iy, iz


def bin_to_pencils(grid, capacity: int, nzp: int, pos, feats):
    """Sort markers into cell slots, scattered directly into pencil planes.

    ``feats``: list of (N,) feature channels (already split).  Returns
    (planes (NXY, len(feats)+1, C, NZp) with the VALID plane appended,
    perm (N,) flat plane index per marker, overflow)."""
    n = pos.shape[0]
    nx, ny, nz = grid.dims
    if isinstance(grid, PencilGrid):
        ix, iy, iz = _pencil_ijk(grid, pos)
    else:
        ijk = cell_ijk(grid, pos)
        ix, iy, iz = ijk[..., 0], ijk[..., 1], ijk[..., 2]
    pencil = ix * ny + iy
    ids = pencil * nz + iz
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    first = jnp.searchsorted(ids_sorted, ids_sorted)
    rank = jnp.arange(n) - first
    overflow = jnp.maximum(rank.max() + 1 - capacity, 0).astype(jnp.int32)
    slot = jnp.minimum(rank, capacity - 1)
    pen_s = ids_sorted // nz
    iz_s = ids_sorted - pen_s * nz
    flat = (pen_s * capacity + slot) * nzp + iz_s
    perm = jnp.zeros((n,), flat.dtype).at[order].set(flat)

    size = nx * ny * capacity * nzp

    def scatter(x):
        return jnp.zeros((size,), x.dtype).at[flat].set(x[order]).reshape(
            nx * ny, capacity, nzp)

    planes = [scatter(f) for f in feats]
    valid = jnp.zeros((size,), jnp.float32).at[flat].set(
        (rank < capacity).astype(jnp.float32)).reshape(
        nx * ny, capacity, nzp)
    return jnp.stack(planes + [valid], axis=1), perm, overflow


def flat_lane_geometry(grid, n_dz: int = 1, n_dy: int = 1):
    """(SZ, NL) for the flat-lane layout (ops.pallas.flatlane_kernel):
    lane = y·SZ + z with SZ = nz + n_dz pad lanes; NL = 128-multiple with
    n_dy columns of roll headroom."""
    nx, ny, nz = grid.dims
    SZ = nz + n_dz
    NL = ((ny * SZ + n_dy * SZ + n_dz + 127) // 128) * 128
    return SZ, NL


def bin_to_flat(grid, capacity: int, SZ: int, NL: int, pos, feats,
                n_dz: int = 1, keep=None):
    """Sort markers into flat-lane planes (nx, F+1, C, NL); row = x,
    lane = y·SZ + z.  Same contract as bin_to_pencils (valid plane appended,
    perm into the flattened per-feature plane, overflow).

    ``keep``: optional (N,) mask — dropped markers are routed to a discard
    bucket (not binned at all, perm points past the planes).  Used to clip
    markers that cannot interact (e.g. rigid-BCE wheel markers far above
    the terrain), which lets the caller shrink the grid."""
    n = pos.shape[0]
    nx, ny, nz = grid.dims
    n_cells = nx * ny * nz
    if isinstance(grid, PencilGrid):
        ix, iy, iz = _pencil_ijk(grid, pos)
    else:
        ijk = cell_ijk(grid, pos)
        ix, iy, iz = ijk[..., 0], ijk[..., 1], ijk[..., 2]
    ids = (ix * ny + iy) * nz + iz
    if keep is not None:
        ids = jnp.where(keep, ids, n_cells)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    first = jnp.searchsorted(ids_sorted, ids_sorted)
    rank = jnp.arange(n) - first
    real = ids_sorted < n_cells
    overflow = (jnp.maximum(
        jnp.max(jnp.where(real, rank, 0)) + 1 - capacity, 0)
        .astype(jnp.int32))
    slot = jnp.minimum(rank, capacity - 1)
    ix_s = jnp.minimum(ids_sorted, n_cells - 1) // (ny * nz)
    rem = jnp.minimum(ids_sorted, n_cells - 1) - ix_s * (ny * nz)
    iy_s = rem // nz
    iz_s = rem - iy_s * nz
    size = nx * capacity * NL
    flat = jnp.where(real,
                     (ix_s * capacity + slot) * NL + iy_s * SZ + iz_s,
                     size)                                 # discard bucket
    perm = jnp.zeros((n,), flat.dtype).at[order].set(flat)

    def scatter(x):
        out = jnp.zeros((size + 1,), x.dtype).at[flat].set(x[order])
        return out[:size].reshape(nx, capacity, NL)

    planes = [scatter(f) for f in feats]
    valid = jnp.zeros((size + 1,), jnp.float32).at[flat].set(
        jnp.where(real, (rank < capacity).astype(jnp.float32), 0.0)
    )[:size].reshape(nx, capacity, NL)
    return jnp.stack(planes + [valid], axis=1), perm, overflow


def bin_to_flat_dual(grid, CA: int, CB: int, SZ: int, NL: int, pos, feats,
                     n_dz: int = 1, keep=None):
    """Two-tier flat-lane binning (ops.pallas.flatlane_dual_kernel): the
    first ``CA`` markers of every cell land in field A, the next ``CB`` in
    the spill field B; overflow counts past CA+CB.  Returns (planesA
    (nx, F+1, CA, NL), planesB (nx, F+1, CB, NL), perm, overflow) — perm
    indexes a virtual [A planes | B planes] concatenation per feature."""
    n = pos.shape[0]
    nx, ny, nz = grid.dims
    n_cells = nx * ny * nz
    if isinstance(grid, PencilGrid):
        ix, iy, iz = _pencil_ijk(grid, pos)
    else:
        ijk = cell_ijk(grid, pos)
        ix, iy, iz = ijk[..., 0], ijk[..., 1], ijk[..., 2]
    ids = (ix * ny + iy) * nz + iz
    if keep is not None:
        ids = jnp.where(keep, ids, n_cells)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    first = jnp.searchsorted(ids_sorted, ids_sorted)
    rank = jnp.arange(n) - first
    real = ids_sorted < n_cells
    overflow = (jnp.maximum(
        jnp.max(jnp.where(real, rank, 0)) + 1 - (CA + CB), 0)
        .astype(jnp.int32))
    ix_s = jnp.minimum(ids_sorted, n_cells - 1) // (ny * nz)
    rem = jnp.minimum(ids_sorted, n_cells - 1) - ix_s * (ny * nz)
    iy_s = rem // nz
    iz_s = rem - iy_s * nz
    lane = iy_s * SZ + iz_s
    sizeA = nx * CA * NL
    sizeB = nx * CB * NL
    in_a = rank < CA
    slot_a = jnp.minimum(rank, CA - 1)
    slot_b = jnp.minimum(rank - CA, CB - 1)
    flat = jnp.where(
        real,
        jnp.where(in_a,
                  (ix_s * CA + slot_a) * NL + lane,
                  sizeA + (ix_s * CB + slot_b) * NL + lane),
        sizeA + sizeB)                                  # discard bucket
    perm = jnp.zeros((n,), flat.dtype).at[order].set(flat)

    # ONE batched scatter for all channels (F separate scatters serialize
    # badly); validity is computed in sorted order so it skips the reorder
    v_sorted = jnp.where(real & (rank < CA + CB), 1.0, 0.0).astype(
        jnp.float32)
    vals = jnp.stack([f[order] for f in feats] + [v_sorted], axis=1)
    F1 = vals.shape[1]
    out = jnp.zeros((sizeA + sizeB + 1, F1), vals.dtype).at[flat].set(vals)
    planesA = out[:sizeA].reshape(nx, CA, NL, F1).transpose(0, 3, 1, 2)
    planesB = out[sizeA:sizeA + sizeB].reshape(nx, CB, NL, F1) \
        .transpose(0, 3, 1, 2)
    return planesA, planesB, perm, overflow


def _sph_feats(state: SPHState):
    return [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
            state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
            state.rho, (state.kind == FLUID).astype(jnp.float32)]


def state_to_pencils(grid: GridSpec, capacity: int, nzp: int,
                     state: SPHState):
    return bin_to_pencils(grid, capacity, nzp, state.pos, _sph_feats(state))


def pencils_to_state(feat, perm, state: SPHState) -> SPHState:
    def grab(f):
        return feat[:, f].reshape(-1)[perm]

    pos = jnp.stack([grab(0), grab(1), grab(2)], axis=1)
    vel = jnp.stack([grab(3), grab(4), grab(5)], axis=1)
    return state.replace(pos=pos, vel=vel, rho=grab(6))


def make_sph_advance_pencil(params: SPHParams, grid: GridSpec,
                            capacity: int = 32, Bxy: int = 4,
                            interpret: bool = False,
                            backend: str = "pencil",
                            layout: str = "auto"):
    """advance(state, n_cycles) -> (state, overflow) on the pencil backend.

    ``backend``: "pencil" (dense 27/45-offset sweeps) or "sym" (symmetric
    half stencil — each pair once, reactions through the rolling window,
    ops.pallas.sph_sym_kernel).  Cell size must be ≥ the kernel support
    (2h for cubic); non-periodic.

    ``layout`` (sym backend only): "pencil" (rows = xy columns, lanes = z),
    "flat" (rows = x, lanes = y·SZ + z — ops.pallas.flatlane_kernel, the
    small-grid engine), or "auto" (flat when the pencil layout would use
    <60% of its lane tiles and the packed lanes fit VMEM)."""
    support = 2.0 * float(params.h)
    n_dxy = 1
    if isinstance(grid, PencilGrid):
        if float(grid.cell_xy) < support - 1e-9:
            raise ValueError("cell_xy below kernel support")
        n_dz = int(np.ceil(support / float(grid.cell_z) - 1e-9))
    else:
        if any(grid.periodic):
            raise ValueError("pencil SPH supports non-periodic boxes")
        n_dxy = int(np.ceil(support / float(grid.cell_size) - 1e-9))
        n_dz = n_dxy
        if n_dxy > 1 and backend != "sym":
            raise ValueError(
                f"cell {grid.cell_size} < kernel support {support} needs "
                "the sym backend (n_d > 1 rings)")
    nzp = ((grid.dims[2] + n_dz + 127) // 128) * 128
    sp = sph_static_params(params)
    sub_kw = dict(sp=sp, grid_dims=grid.dims, C=capacity, Bxy=Bxy,
                  n_dz=n_dz, interpret=interpret)
    if backend == "sym":
        from chrono_tpu.ops.pallas.dem_sym_kernel import edge_ok_fwd
        from chrono_tpu.ops.pallas.sph_sym_kernel import sph_substep_sym
        substep_fn = sph_substep_sym
        # small grids: flat-lane layout (rows = x, lanes = y·SZ + z) —
        # see ops.pallas.flatlane_kernel; auto-picked when the pencil
        # layout would waste >40% of its lane tiles and lanes fit VMEM
        SZ, NL = flat_lane_geometry(grid, n_dz, n_dxy)
        lane_util = grid.dims[2] / nzp
        if layout == "auto":
            layout = "flat" if (NL <= 1024 and lane_util < 0.6) \
                else "pencil"
        if n_dxy > 1 and layout != "flat":
            raise ValueError("n_d > 1 rings need layout='flat'")
        if layout == "flat":
            edge = None
            sub_kw.update(layout="flat", SZ=SZ, n_dy=n_dxy, n_dx=n_dxy)

            def binner(state):
                return bin_to_flat(grid, capacity, SZ, NL, state.pos,
                                   _sph_feats(state), n_dz)
        else:
            edge = edge_ok_fwd(grid.dims)

            def binner(state):
                return state_to_pencils(grid, capacity, nzp, state)
    elif backend == "pencil":
        edge = edge_ok_xy(grid.dims)
        substep_fn = sph_substep_pencil

        def binner(state):
            return state_to_pencils(grid, capacity, nzp, state)
    else:
        raise ValueError(f"unknown SPH pencil backend {backend!r}")

    def one_cycle(state):
        feat, perm, ovf = binner(state)
        kw = dict(sub_kw)
        if backend == "sym":
            # row-activity mask for the cycle: a row block with no markers
            # owns no pairs and receives no reactions (both pair sides need
            # markers), so the kernel skips its DMAs and sweeps outright —
            # most of a dam-break tank is air.  Rows are fixed within a
            # cycle (binning happens once), so occupancy is exact, not a
            # skin estimate.
            kw["active"] = (jnp.max(feat[:, -1], axis=(1, 2)) > 0) \
                .astype(jnp.int32)
            # solid-proximity mask for the Adami sweep: rows owning pairs
            # that touch a solid marker = the solid-row mask dilated
            # through the layout's forward row offsets (a row owns pairs
            # into rows r+delta only)
            solid = (jnp.max(feat[:, -1] * (1.0 - feat[:, 7]),
                             axis=(1, 2)) > 0).astype(jnp.int32)
            ny_ = grid.dims[1]
            if sub_kw.get("layout") == "flat":
                deltas = tuple(range(0, sub_kw.get("n_dx", 1) + 1))
            else:
                deltas = (0, 1, ny_ - 1, ny_, ny_ + 1)
            ev = jnp.zeros_like(solid)
            for d in deltas:
                ev = jnp.maximum(
                    ev, jnp.concatenate([solid[d:], jnp.zeros((d,),
                                                              solid.dtype)]))
            kw["active_solid"] = ev

        def substep(f, _):
            return substep_fn(f, edge, **kw), None

        feat, _ = lax.scan(substep, feat, None,
                           length=params.rebuild_every)
        st = pencils_to_state(feat, perm, state)
        return st.replace(time=state.time
                          + params.dt * params.rebuild_every), ovf

    cycle_jit = jax.jit(one_cycle)

    def advance(state: SPHState, n_cycles: int):
        # python loop over cycles (see dem.cell_dense: scan would relayout
        # the (N,3) carries through padded loop buffers)
        ovf = jnp.zeros((), jnp.int32)
        for _ in range(n_cycles):
            state, ov = cycle_jit(state)
            ovf = jnp.maximum(ovf, ov)
        return state, ovf

    return advance
