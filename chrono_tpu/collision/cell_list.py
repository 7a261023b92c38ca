"""Uniform-grid spatial hashing: the shared broadphase for NSC contacts, DEM and SPH.

TPU-native re-design of the reference's three grid broadphases (core multicore
``ChBroadphase`` count/scan/fill, /root/reference/src/chrono/collision/multicore/
ChBroadphase.h; DEM subdomain composites, chrono_dem ChDemSMC.cu:519; SPH
hash/sort/cell-range, chrono_fsi SphCollisionSystem.cu:62): CUDA atomics and CUB
primitives become one ``jax.lax.sort``-based pipeline with static shapes:

    cell id → sort by cell → searchsorted cell boundaries → per-cell slot table

Everything is fixed-capacity (``max_per_cell``) and mask-carrying, so the whole
pipeline stays inside jit with no data-dependent shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class GridSpec:
    """Static description of the uniform grid (compile-time constant).

    ``periodic`` axes wrap both the cell neighborhood and (via
    :func:`min_image`) pair displacements — the reference FSI's periodic BC
    support (SphFluidDynamics.cu:190) without ghost particles.
    """

    origin: tuple = static_field(default=(0.0, 0.0, 0.0))
    cell_size: float = static_field(default=1.0)
    dims: tuple = static_field(default=(8, 8, 8))  # (nx, ny, nz)
    periodic: tuple = static_field(default=(False, False, False))

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz

    @property
    def lengths(self) -> tuple:
        return tuple(d * self.cell_size for d in self.dims)


def wrap_positions(grid: GridSpec, pos: Array) -> Array:
    """Wrap positions into the domain along periodic axes."""
    if not any(grid.periodic):
        return pos
    origin = jnp.asarray(grid.origin, pos.dtype)
    L = jnp.asarray(grid.lengths, pos.dtype)
    wrapped = origin + jnp.mod(pos - origin, L)
    mask = jnp.asarray(grid.periodic)
    return jnp.where(mask, wrapped, pos)


def min_image(grid: GridSpec, d: Array) -> Array:
    """Minimum-image displacement for periodic axes."""
    if not any(grid.periodic):
        return d
    L = jnp.asarray(grid.lengths, d.dtype)
    wrapped = d - L * jnp.round(d / L)
    mask = jnp.asarray(grid.periodic)
    return jnp.where(mask, wrapped, d)


def cell_ijk(grid: GridSpec, pos: Array) -> Array:
    origin = jnp.asarray(grid.origin, pos.dtype)
    nx, ny, nz = grid.dims
    ijk = jnp.floor((pos - origin) / grid.cell_size).astype(jnp.int32)
    return jnp.clip(ijk, 0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))


def cell_index(grid: GridSpec, pos: Array) -> Array:
    """Linear cell id per position (clamped to the grid), (N,) int32."""
    ijk = cell_ijk(grid, pos)
    nx, ny, nz = grid.dims
    return (ijk[..., 0] * ny + ijk[..., 1]) * nz + ijk[..., 2]


@pytree_dataclass
class CellList:
    """Sorted particle→cell assignment.

    ``order`` sorts particles by cell id; ``cell_ids_sorted[k] =
    cell_of(order[k])``.  Cell k's particles are ``order[start[k]:end[k]]``
    (found by searchsorted — no per-cell offset arrays to scatter).
    """

    order: Array            # (N,) int32 permutation
    cell_ids_sorted: Array  # (N,) int32


def build_cell_list(grid: GridSpec, pos: Array) -> CellList:
    ids = cell_index(grid, pos)
    # single 64-bit key sort: (cell_id << 32 | index) keeps order stable
    order = jnp.argsort(ids)                # XLA radix/stable sort
    return CellList(order=order.astype(jnp.int32),
                    cell_ids_sorted=ids[order])


_OFFSETS_27 = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               for dz in (-1, 0, 1)]


def neighbor_candidates(
    grid: GridSpec, cl: CellList, query_ijk: Array, max_per_cell: int
) -> tuple[Array, Array]:
    """For each query cell (Q, 3 ijk), particle indices in its 3×3×3 neighborhood.

    Proper 3-D neighbor indexing: out-of-range neighbor cells are masked
    invalid on non-periodic axes and wrapped on periodic axes — no edge
    aliasing.  Returns ``(cand (Q, 27·max_per_cell) int32, valid (…,) bool)``;
    slots past ``max_per_cell`` per cell are dropped (overflow detectable via
    :func:`cell_occupancy_max`).
    """
    nx, ny, nz = grid.dims
    for ax in range(3):
        if grid.periodic[ax] and grid.dims[ax] < 3:
            raise ValueError(
                f"periodic axis {ax} needs >=3 cells (got {grid.dims[ax]}): "
                "with fewer, the 3x3x3 neighborhood wraps onto the same cell "
                "more than once and pairs get double-counted")
    dims = jnp.asarray(grid.dims, jnp.int32)
    periodic = jnp.asarray(grid.periodic)
    offs = jnp.asarray(_OFFSETS_27, jnp.int32)             # (27, 3)
    nb = query_ijk[:, None, :] + offs[None, :, :]          # (Q, 27, 3)
    in_range = jnp.all((nb >= 0) & (nb < dims) | periodic[None, None, :],
                       axis=-1)                            # (Q, 27)
    nb = jnp.mod(nb, dims)                                 # wrap (no-op in range)
    cells = (nb[..., 0] * ny + nb[..., 1]) * nz + nb[..., 2]
    start = jnp.searchsorted(cl.cell_ids_sorted, cells)    # (Q, 27)
    end = jnp.searchsorted(cl.cell_ids_sorted, cells, side="right")
    slots = jnp.arange(max_per_cell, dtype=jnp.int32)      # (K,)
    idx_sorted = start[..., None] + slots                  # (Q, 27, K)
    valid = (idx_sorted < end[..., None]) & in_range[..., None]
    idx_sorted = jnp.minimum(idx_sorted, cl.order.shape[0] - 1)
    cand = cl.order[idx_sorted]                            # (Q, 27, K)
    Q = query_ijk.shape[0]
    return cand.reshape(Q, -1), valid.reshape(Q, -1)


def build_slot_table(grid: GridSpec, pos: Array, max_per_cell: int):
    """Dense per-cell slot table — the TPU-layout-friendly broadphase.

    Replaces the sort+searchsorted lookup (:func:`neighbor_candidates`) whose
    composed XLA program lowers ``searchsorted`` to 4 ms while-loops and pushes
    the downstream gathers onto the scalar core (measured on v5e: 61 ms for a
    2 000-sphere detect).  Here cell membership is materialized once as a
    ``(n_cells, K)`` table via one flat scatter, so every later lookup is plain
    index arithmetic + a tiled 2-D row gather (the fast TPU gather pattern).

    Same role as the reference multicore broadphase's count/scan/fill
    (/root/reference/src/chrono/collision/multicore/ChBroadphase.cpp) with the
    CUB scan replaced by sort + boundary-rank.

    Returns ``(table (n_cells, K) int32 with -1 fill, overflow () int32)``.
    """
    n = pos.shape[0]
    ids = cell_index(grid, pos)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    # rank within cell, without searchsorted: segment starts via cummax
    arange = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate([
        jnp.ones((1,), bool), ids_sorted[1:] != ids_sorted[:-1]])
    first = jax.lax.cummax(jnp.where(boundary, arange, 0))
    rank = arange - first
    overflow = jnp.maximum(
        (rank.max() + 1 if n else 0) - max_per_cell, 0).astype(jnp.int32)
    K = max_per_cell
    flat = ids_sorted * K + jnp.minimum(rank, K - 1)
    table = jnp.full((grid.n_cells * K,), -1, jnp.int32)
    table = table.at[flat].set(
        jnp.where(rank < K, order.astype(jnp.int32), -1),
        mode="drop")
    return table.reshape(grid.n_cells, K), overflow


def neighbor_candidates_table(grid: GridSpec, table: Array,
                              query_ijk: Array) -> tuple[Array, Array]:
    """3×3×3 neighborhood candidates from a :func:`build_slot_table` table.

    Returns ``(cand (Q, 27·K) int32, valid (Q, 27·K) bool)`` like
    :func:`neighbor_candidates`, with no searchsorted anywhere — one row
    gather from the table.
    """
    nx, ny, nz = grid.dims
    for ax in range(3):
        if grid.periodic[ax] and grid.dims[ax] < 3:
            raise ValueError(
                f"periodic axis {ax} needs >=3 cells (got {grid.dims[ax]})")
    dims = jnp.asarray(grid.dims, jnp.int32)
    periodic = jnp.asarray(grid.periodic)
    offs = jnp.asarray(_OFFSETS_27, jnp.int32)
    nb = query_ijk[:, None, :] + offs[None, :, :]          # (Q, 27, 3)
    in_range = jnp.all((nb >= 0) & (nb < dims) | periodic[None, None, :],
                       axis=-1)
    nb = jnp.mod(nb, dims)
    cells = (nb[..., 0] * ny + nb[..., 1]) * nz + nb[..., 2]
    cand = table[cells]                                    # (Q, 27, K)
    valid = (cand >= 0) & in_range[..., None]
    Q = query_ijk.shape[0]
    return cand.reshape(Q, -1), valid.reshape(Q, -1)


def build_feature_table(grid: GridSpec, pos: Array, feat: Array,
                        max_per_cell: int):
    """Scatter per-particle feature rows into the cell-slot table.

    ``feat``: (N, ch).  Returns ``(table (n_cells, K·ch) float32, overflow)``
    where each table row packs K slots × ch channels contiguously — so a
    3×3×3 neighborhood fetch is 27 *row* gathers of K·ch consecutive floats
    (the TPU-fast gather pattern; element gathers from 1-D sources lower to
    the scalar core, measured 6 ms per 864 k-element gather on v5e).
    Slots beyond a cell's occupancy are all-zero; callers should carry an
    explicit validity channel in ``feat``.
    """
    n, ch = feat.shape
    ids = cell_index(grid, pos)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    arange = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate([
        jnp.ones((1,), bool), ids_sorted[1:] != ids_sorted[:-1]])
    first = jax.lax.cummax(jnp.where(boundary, arange, 0))
    rank = arange - first
    overflow = jnp.maximum(rank.max() + 1 - max_per_cell, 0).astype(jnp.int32)
    K = max_per_cell
    flat = ids_sorted * K + jnp.minimum(rank, K - 1)
    rows = jnp.where((rank < K)[:, None], feat[order], 0.0)
    table = jnp.zeros((grid.n_cells * K, ch), feat.dtype)
    table = table.at[flat].set(rows, mode="drop")
    return table.reshape(grid.n_cells, K * ch), overflow


def neighbor_feature_rows(grid: GridSpec, table: Array, query_ijk: Array,
                          max_per_cell: int, ch: int):
    """Fetch the 3×3×3 neighborhood's packed feature rows per query.

    Returns ``(feat (Q, 27, K, ch), in_range (Q, 27) bool)``.
    """
    nx, ny, nz = grid.dims
    dims = jnp.asarray(grid.dims, jnp.int32)
    periodic = jnp.asarray(grid.periodic)
    offs = jnp.asarray(_OFFSETS_27, jnp.int32)
    nb = query_ijk[:, None, :] + offs[None, :, :]
    in_range = jnp.all((nb >= 0) & (nb < dims) | periodic[None, None, :],
                       axis=-1)
    nb = jnp.mod(nb, dims)
    cells = (nb[..., 0] * ny + nb[..., 1]) * nz + nb[..., 2]
    rows = table[cells]                       # (Q, 27, K·ch) row gather
    Q = query_ijk.shape[0]
    return rows.reshape(Q, 27, max_per_cell, ch), in_range


def topk_select(ok: Array, capacity: int):
    """Indices of the first ``capacity`` True entries of ``ok`` (stable).

    Drop-in for ``jnp.nonzero(ok, size=capacity, fill_value=n)`` which lowers
    to a scalar-core scatter on TPU (measured 7.5 ms at 864 k);  a stable
    argsort on the validity key keeps everything on the vector units
    (measured 0.22 ms).  Returns ``(sel (capacity,) int32, active (capacity,)
    bool, count () int32)``; inactive slots point at entry n−1.
    """
    n = ok.shape[0]
    order = jnp.argsort(jnp.where(ok, 0, 1).astype(jnp.int8),
                        stable=True).astype(jnp.int32)
    if capacity > n:
        order = jnp.concatenate(
            [order, jnp.full((capacity - n,), n - 1, jnp.int32)])
    sel = order[:capacity]
    active = jnp.zeros((capacity,), bool).at[: min(capacity, n)].set(
        ok[sel[: min(capacity, n)]])
    return jnp.where(active, sel, n - 1), active, jnp.sum(ok).astype(jnp.int32)


def cell_occupancy_max(grid: GridSpec, pos: Array) -> Array:
    """Max particles in any cell (for capacity asserts / auto-tuning)."""
    ids = cell_index(grid, pos)
    counts = jnp.zeros((grid.n_cells,), jnp.int32).at[ids].add(1)
    return counts.max()


def compact_rows(cand: Array, valid: Array, k_out: int, fill: int = -1):
    """Left-pack each row's valid entries into ``k_out`` slots.

    (Q, C) candidates + mask → (Q, k_out) packed indices and mask. Entries past
    ``k_out`` per row are dropped (capacity bound; count overflow upstream).
    """
    Q, C = cand.shape
    pos_in_row = jnp.cumsum(valid, axis=1) - 1              # (Q, C)
    pos_clamped = jnp.where(valid & (pos_in_row < k_out), pos_in_row, k_out)
    out = jnp.full((Q, k_out + 1), fill, cand.dtype)
    rows = jnp.broadcast_to(jnp.arange(Q)[:, None], (Q, C))
    out = out.at[rows, pos_clamped].set(
        jnp.where(valid, cand, fill), mode="drop")
    out = out[:, :k_out]
    return out, out != fill
