"""Pallas TPU kernel for the cell-dense DEM pair-force pass.

The hot loop of the granular solver in explicit Pallas form: the cell-major
layout (chrono_tpu.dem.cell_dense) makes every neighbor access a CONTIGUOUS
slab at a fixed linear-cell offset, so the kernel is:

    for each block of B cells (grid dimension):
      for each of the 27 neighbor offsets:
        async-copy the neighbor slab (B·C particles) HBM → VMEM
        dense (B, C, C) Hertz pair math on the VPU
        accumulate into the block's force/torque registers

No gathers, no scatters, no atomics — exactly the access pattern the TPU
memory system is built for.  Frictionless Hertz (normal + damping); the
tangential terms ride the same structure.

Run with ``interpret=True`` on CPU for correctness (the default used by the
test-suite; flip to compiled mode on real TPU hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]


def _make_kernel(n_cells, C, B, lin_offsets, radius, kn, gn, G):
    """G = ghost-cell padding on each end of the (padded) cell arrays, so a
    neighbor slab fetch at any linear offset never needs clamping — ghost
    slots carry mask=False and contribute nothing."""

    def kernel(pos_ref, vel_ref, mask_ref, edge_ref, force_ref):
        b = pl.program_id(0)
        base = b * B
        # self block (inputs are ghost-padded by G cells)
        self_pos = pos_ref[pl.ds((base + G) * C, B * C), :]   # (B*C, 3)
        self_vel = vel_ref[pl.ds((base + G) * C, B * C), :]
        self_mask = mask_ref[pl.ds(base + G, B), :]           # (B, C)

        sp = self_pos.reshape(B, C, 3)
        sv = self_vel.reshape(B, C, 3)
        acc = jnp.zeros((B, C, 3), jnp.float32)

        for k, off in enumerate(lin_offsets):
            nb = base + G + off                               # always >= 0
            npos = pos_ref[pl.ds(nb * C, B * C), :].reshape(B, C, 3)
            nvel = vel_ref[pl.ds(nb * C, B * C), :].reshape(B, C, 3)
            nmask = mask_ref[pl.ds(nb, B), :]                 # (B, C)
            ok_edge = edge_ref[pl.ds(base, B), k]             # (B,)

            d = npos[:, None, :, :] - sp[:, :, None, :]       # (B, C, C, 3)
            dist2 = jnp.sum(d * d, axis=-1)
            dist = jnp.sqrt(dist2 + 1e-18)
            overlap = 2.0 * radius - dist
            pair_ok = (self_mask[:, :, None] & nmask[:, None, :]
                       & ok_edge[:, None, None] & (overlap > 0.0))
            if off == 0:
                eye = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) \
                    == jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
                pair_ok = pair_ok & ~eye[None]

            n = d / dist[..., None]
            ov = jnp.maximum(overlap, 0.0)
            sq = jnp.sqrt(ov)
            vrel = nvel[:, None, :, :] - sv[:, :, None, :]
            vn = jnp.sum(vrel * n, axis=-1)
            fmag = jnp.maximum(kn * sq * ov - gn * jnp.sqrt(sq) * vn, 0.0)
            fp = jnp.where(pair_ok[..., None], -fmag[..., None] * n, 0.0)
            acc = acc + jnp.sum(fp, axis=2)

        force_ref[...] = acc.reshape(B * C, 3)

    return kernel


@functools.partial(jax.jit, static_argnames=("radius", "kn", "gn",
                                             "grid_dims", "C", "B",
                                             "interpret"))
def dem_cell_forces_pallas(pos, vel, mask, edge_ok, radius, kn, gn,
                           grid_dims, C, B=64, interpret=True):
    """Frictionless Hertz forces over the cell-dense layout via Pallas.

    pos/vel: (NC*C, 3) float32; mask: (NC, C) bool; edge_ok: (NC, 27) bool
    (per-cell validity of each neighbor offset, handles non-periodic edges).
    Returns (NC*C, 3) forces.
    """
    nx, ny, nz = grid_dims
    n_cells = nx * ny * nz
    assert n_cells % B == 0, f"n_cells {n_cells} must be divisible by B={B}"
    lin = [((dx * ny) + dy) * nz + dz for (dx, dy, dz) in _OFFSETS]
    G = max(abs(o) for o in lin)
    kernel = _make_kernel(n_cells, C, B, lin, float(radius), float(kn),
                          float(gn), G)
    # ghost-pad so neighbor slab fetches never go out of range
    zpad = jnp.zeros((G * C, 3), pos.dtype)
    pos_p = jnp.concatenate([zpad, pos, zpad])
    vel_p = jnp.concatenate([zpad, vel, zpad])
    mpad = jnp.zeros((G, mask.shape[1]), bool)
    mask_p = jnp.concatenate([mpad, mask, mpad])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_cells * C, 3), jnp.float32),
        grid=(n_cells // B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((B * C, 3),
                               lambda b: (b, 0),
                               memory_space=pl.ANY),
        interpret=interpret,
    )(pos_p, vel_p, mask_p, edge_ok)


def edge_ok_table(grid_dims, periodic=(False, False, False)):
    """Precompute the (NC, 27) neighbor-offset validity table."""
    import numpy as np

    nx, ny, nz = grid_dims
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    out = np.zeros((nx * ny * nz, 27), bool)
    for k, (dx, dy, dz) in enumerate(_OFFSETS):
        ok = np.ones((nx, ny, nz), bool)
        if not periodic[0]:
            ok &= (ii + dx >= 0) & (ii + dx < nx)
        if not periodic[1]:
            ok &= (jj + dy >= 0) & (jj + dy < ny)
        if not periodic[2]:
            ok &= (kk + dz >= 0) & (kk + dz < nz)
        out[:, k] = ok.reshape(-1)
    return jnp.asarray(out)
