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
    """Static description of the uniform grid (compile-time constant)."""

    origin: tuple = static_field(default=(0.0, 0.0, 0.0))
    cell_size: float = static_field(default=1.0)
    dims: tuple = static_field(default=(8, 8, 8))  # (nx, ny, nz)

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz


def cell_index(grid: GridSpec, pos: Array) -> Array:
    """Linear cell id per position (clamped to the grid), (N,) int32."""
    origin = jnp.asarray(grid.origin, pos.dtype)
    nx, ny, nz = grid.dims
    ijk = jnp.floor((pos - origin) / grid.cell_size).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
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


def _neighbor_cell_offsets(grid: GridSpec):
    """The 27 linear-id offsets of the 3×3×3 neighborhood."""
    nx, ny, nz = grid.dims
    offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                offs.append((dx * ny + dy) * nz + dz)
    return jnp.asarray(offs, jnp.int32)  # (27,)


def neighbor_candidates(
    grid: GridSpec, cl: CellList, query_cells: Array, max_per_cell: int
) -> tuple[Array, Array]:
    """For each query, particle indices in its 27-cell neighborhood.

    Returns ``(cand (Q, 27*max_per_cell) int32, valid (Q, 27*max_per_cell) bool)``
    — padded with invalid slots when a cell holds more than ``max_per_cell``
    particles (capacity overflow is detectable via :func:`cell_occupancy_max`).

    Note: neighbor cells are found by LINEAR-id offset, so queries in boundary
    cells may alias cells from the opposite face; callers must distance-filter
    (they all do), and grids should include one empty guard layer when domains
    touch the grid edge.
    """
    offs = _neighbor_cell_offsets(grid)  # (27,)
    cells = query_cells[:, None] + offs[None, :]          # (Q, 27)
    cells = jnp.clip(cells, 0, grid.n_cells - 1)
    start = jnp.searchsorted(cl.cell_ids_sorted, cells)    # (Q, 27)
    end = jnp.searchsorted(cl.cell_ids_sorted, cells, side="right")
    slots = jnp.arange(max_per_cell, dtype=jnp.int32)      # (K,)
    idx_sorted = start[..., None] + slots                  # (Q, 27, K)
    valid = idx_sorted < end[..., None]
    idx_sorted = jnp.minimum(idx_sorted, cl.order.shape[0] - 1)
    cand = cl.order[idx_sorted]                            # (Q, 27, K)
    Q = query_cells.shape[0]
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
