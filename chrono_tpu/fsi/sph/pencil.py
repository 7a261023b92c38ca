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
from chrono_tpu.fsi.sph.state import SPHParams, SPHState, FLUID
from chrono_tpu.ops.pallas.sph_pencil_kernel import (
    sph_substep_pencil, sph_static_params, F_FEAT,
)
from chrono_tpu.ops.pallas.dem_pencil_kernel import edge_ok_xy


def bin_to_pencils(grid: GridSpec, capacity: int, nzp: int, pos, feats):
    """Sort markers into cell slots, scattered directly into pencil planes.

    ``feats``: list of (N,) feature channels (already split).  Returns
    (planes (NXY, len(feats)+1, C, NZp) with the VALID plane appended,
    perm (N,) flat plane index per marker, overflow)."""
    n = pos.shape[0]
    nx, ny, nz = grid.dims
    ijk = cell_ijk(grid, pos)
    pencil = ijk[..., 0] * ny + ijk[..., 1]
    ids = pencil * nz + ijk[..., 2]
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


def state_to_pencils(grid: GridSpec, capacity: int, nzp: int,
                     state: SPHState):
    feats = [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
             state.rho, (state.kind == FLUID).astype(jnp.float32)]
    return bin_to_pencils(grid, capacity, nzp, state.pos, feats)


def pencils_to_state(feat, perm, state: SPHState) -> SPHState:
    def grab(f):
        return feat[:, f].reshape(-1)[perm]

    pos = jnp.stack([grab(0), grab(1), grab(2)], axis=1)
    vel = jnp.stack([grab(3), grab(4), grab(5)], axis=1)
    return state.replace(pos=pos, vel=vel, rho=grab(6))


def make_sph_advance_pencil(params: SPHParams, grid: GridSpec,
                            capacity: int = 16, Bxy: int = 4,
                            interpret: bool = False):
    """advance(state, n_cycles) -> (state, overflow) on the pencil backend.

    Cell size must be ≥ the kernel support (2h for cubic); non-periodic."""
    if any(grid.periodic):
        raise ValueError("pencil SPH supports non-periodic boxes")
    support = 2.0 * float(params.h)
    if float(grid.cell_size) < support - 1e-9:
        raise ValueError(f"cell {grid.cell_size} < kernel support {support}")
    nzp = ((grid.dims[2] + 1 + 127) // 128) * 128
    edge = edge_ok_xy(grid.dims)
    sp = sph_static_params(params)

    def one_cycle(state):
        feat, perm, ovf = state_to_pencils(grid, capacity, nzp, state)

        def substep(f, _):
            return sph_substep_pencil(f, edge, sp=sp, grid_dims=grid.dims,
                                      C=capacity, Bxy=Bxy,
                                      interpret=interpret), None

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
