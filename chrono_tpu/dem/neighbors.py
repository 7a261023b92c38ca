"""Persistent fixed-capacity neighbor lists with friction-history migration.

TPU-native replacement for the reference DEM's per-sphere contact-partner maps
(/root/reference/src/chrono_dem/physics/ChSystemDem_impl.h:203-241:
``contact_partners_map`` / ``contact_history_map`` with a fixed 12-partner
stride): instead of CUDA hashmap-style slot claiming with atomics, each particle
owns K neighbor slots rebuilt every few steps from the cell list (sort +
searchsorted), and tangential-history vectors are migrated between rebuilds by a
per-row sorted join (vmapped searchsorted) on the partner index.

Storing BOTH directions of each pair (i in j's row and j in i's row) doubles the
pair flops but removes every scatter from the force kernel: the per-particle
force is a plain masked row reduction — the layout XLA/VPU likes best.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.collision.cell_list import (
    GridSpec, build_cell_list, cell_ijk, neighbor_candidates, compact_rows,
    min_image,
)


@pytree_dataclass
class NeighborList:
    """(N, K) padded neighbor table; ``idx == -1`` marks empty slots."""

    idx: Array       # (N, K) int32
    valid: Array     # (N, K) bool
    overflow: Array  # () int32 — neighbors dropped due to capacity (0 = exact)


def build_neighbor_list(grid: GridSpec, pos: Array, cutoff,
                        max_per_cell: int, k_max: int) -> NeighborList:
    """All j≠i with |x_j − x_i| < cutoff, up to K per particle."""
    n = pos.shape[0]
    cl = build_cell_list(grid, pos)
    qijk = cell_ijk(grid, pos)
    cand, cvalid = neighbor_candidates(grid, cl, qijk, max_per_cell)
    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    j = cand
    ok = cvalid & (j != i_idx)
    d = min_image(grid, pos[:, None, :] - pos[jnp.maximum(j, 0)])
    ok &= jnp.sum(d * d, axis=-1) < cutoff * cutoff
    idx, valid = compact_rows(j, ok, k_max)
    overflow = jnp.maximum(jnp.sum(ok, axis=1).max() - k_max, 0)
    # capacity overflow is silent truncation upstream of `ok` — detect it too
    from chrono_tpu.collision.cell_list import cell_index
    counts = jnp.zeros((grid.n_cells,), jnp.int32).at[
        cell_index(grid, pos)].add(1)
    cell_over = jnp.maximum(counts.max() - max_per_cell, 0)
    overflow = jnp.maximum(overflow, cell_over)
    return NeighborList(idx=idx, valid=valid, overflow=overflow.astype(jnp.int32))


def migrate_history(old: NeighborList, old_hist: Array,
                    new: NeighborList) -> Array:
    """Carry per-slot history (N, K, H) from the old list to the new one.

    Per-row sorted join: sort old slots by partner id, ``searchsorted`` each new
    partner, verify the hit.  New pairs start with zero history (the reference
    resets history on first contact the same way, updateFrictionData path).
    """
    keys = jnp.where(old.valid, old.idx, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(keys, axis=1)
    keys_sorted = jnp.take_along_axis(keys, order, axis=1)   # ascending per row
    hist_sorted = jnp.take_along_axis(old_hist, order[..., None], axis=1)

    def row_join(key_row, hist_row, new_row):
        pos = jnp.searchsorted(key_row, new_row)
        pos = jnp.minimum(pos, key_row.shape[0] - 1)
        hit = key_row[pos] == new_row
        return jnp.where(hit[:, None], hist_row[pos], 0.0)

    return jax.vmap(row_join)(keys_sorted, hist_sorted, new.idx)
