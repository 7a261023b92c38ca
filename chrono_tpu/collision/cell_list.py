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
