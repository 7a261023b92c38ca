"""Pallas TPU kernel for the cell-dense DEM pair-force pass (v1 — superseded).

NOTE: this lane-major layout DMAs neighbor slabs at ±1/±nz/±ny·nz lane
offsets, which Mosaic rejects for real-TPU compilation (dynamic non-128-
aligned slices in a tiled dimension); it runs only in interpret mode and is
kept as the reference implementation for the parity tests.  The production
kernel is ops/pallas/dem_pencil_kernel.py (leading-dim DMA + lane rotations),
which compiles and runs on hardware.

The hot loop of the granular solver (reference: chrono_dem's force kernels,
/root/reference/src/chrono_dem/gpu/ChDemSMC.cuh:629-696, one CUDA block per
subdomain) in explicit TPU form.

Layout — the key design decision: **cells live in the LANE dimension**.
State is kept as feature planes ``feat (F, C, NC)`` (F = 10: pos xyz, vel
xyz, omega xyz, mask; C = slots per cell; NC = linearized cell count).  A
block of B cells is then a ``(F, C, B)`` slab whose last dimension fills the
128-wide vector lanes, and every pair interaction is a dense ``(C, C, B)``
elementwise tensor — C_self × C_nbr pair slots per cell, vectorized across B
cells.  Compare the naive layout ``(N, 3)`` whose last dimension wastes 125
of 128 lanes.

Per grid step (one block of B cells):

    DMA the self slab HBM → VMEM once
    for each of the 27 neighbor offsets (static unroll, double-buffered):
        DMA the neighbor slab (same planes, lane-shifted by the offset)
        dense (C, C, B) Hertz(-Mindlin) pair math on the VPU
        accumulate force/torque into the output block

No gathers, no scatters, no atomics; the only data movement is contiguous
strided DMA.  Ghost-cell padding (G cells each end of the lane axis) makes
every neighbor fetch in-range; ghost slots carry mask = 0.

Physics matches chrono_tpu.dem.cell_dense (frictionless or single-step
Coulomb friction — multi-step history needs slot-stable identity and stays on
the neighbor-list backend); parity is tested in tests/test_pallas_kernel.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]

# feature-plane rows
_PX, _PY, _PZ, _VX, _VY, _VZ, _WX, _WY, _WZ, _MASK = range(10)
F_FEAT = 10


def _make_kernel(C, B, lin_offsets, radius, kn, gn, kt, gt, mu, dt,
                 friction):
    G = max(abs(o) for o in lin_offsets)

    def kernel(edge_ref, feat_ref, out_ref, self_buf, nbuf, self_sem, nsem):
        b = pl.program_id(0)
        base = b * B

        cp_self = pltpu.make_async_copy(
            feat_ref.at[:, :, pl.ds(base + G, B)], self_buf, self_sem)
        cp_self.start()

        def nbr_dma(slot, k):
            return pltpu.make_async_copy(
                feat_ref.at[:, :, pl.ds(base + G + lin_offsets[k], B)],
                nbuf.at[slot], nsem.at[slot])

        nbr_dma(0, 0).start()
        cp_self.wait()

        sx = self_buf[_PX][:, None, :]          # (C, 1, B)
        sy = self_buf[_PY][:, None, :]
        sz = self_buf[_PZ][:, None, :]
        svx = self_buf[_VX][:, None, :]
        svy = self_buf[_VY][:, None, :]
        svz = self_buf[_VZ][:, None, :]
        swx = self_buf[_WX][:, None, :]
        swy = self_buf[_WY][:, None, :]
        swz = self_buf[_WZ][:, None, :]
        smask = self_buf[_MASK][:, None, :]

        fx = jnp.zeros((C, B), jnp.float32)
        fy = jnp.zeros((C, B), jnp.float32)
        fz = jnp.zeros((C, B), jnp.float32)
        tx = jnp.zeros((C, B), jnp.float32)
        ty = jnp.zeros((C, B), jnp.float32)
        tz = jnp.zeros((C, B), jnp.float32)

        for k in range(len(lin_offsets)):
            if k + 1 < len(lin_offsets):
                nbr_dma((k + 1) % 2, k + 1).start()
            nbr_dma(k % 2, k).wait()
            nb = nbuf[k % 2]                     # (F, C, B)

            dx = nb[_PX][None, :, :] - sx        # (C, C, B): self a, nbr b2
            dy = nb[_PY][None, :, :] - sy
            dz = nb[_PZ][None, :, :] - sz
            dist2 = dx * dx + dy * dy + dz * dz
            dist = jnp.sqrt(dist2 + 1e-18)
            inv = 1.0 / dist
            nxh = dx * inv
            nyh = dy * inv
            nzh = dz * inv
            overlap = 2.0 * radius - dist

            ok = (smask * nb[_MASK][None, :, :]
                  * edge_ref[k][None, None, :]
                  * (overlap > 0.0).astype(jnp.float32))
            if lin_offsets[k] == 0:
                ii = jax.lax.broadcasted_iota(jnp.int32, (C, C, 1), 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (C, C, 1), 1)
                ok = ok * (ii != jj).astype(jnp.float32)

            delta = jnp.maximum(overlap, 0.0)
            sq = jnp.sqrt(delta)
            q4 = jnp.sqrt(sq)
            arm = radius - 0.5 * delta

            # relative surface velocity: v_nbr + ω_nbr×(−arm n) − v_self
            #                                   − ω_self×(arm n)
            wsx = nb[_WX][None, :, :] + swx      # ω_nbr + ω_self
            wsy = nb[_WY][None, :, :] + swy
            wsz = nb[_WZ][None, :, :] + swz
            # (ω_nbr+ω_self) × n, scaled by −arm
            cx = wsy * nzh - wsz * nyh
            cy = wsz * nxh - wsx * nzh
            cz = wsx * nyh - wsy * nxh
            vrx = nb[_VX][None, :, :] - svx - arm * cx
            vry = nb[_VY][None, :, :] - svy - arm * cy
            vrz = nb[_VZ][None, :, :] - svz - arm * cz

            vn = vrx * nxh + vry * nyh + vrz * nzh
            fn = jnp.maximum(kn * sq * delta - gn * q4 * vn, 0.0)

            if friction:
                vtx = vrx - vn * nxh
                vty = vry - vn * nyh
                vtz = vrz - vn * nzh
                coef = kt * sq * dt + gt * q4    # single-step: ξ = v_t·dt
                ftx = coef * vtx
                fty = coef * vty
                ftz = coef * vtz
                ftm = jnp.sqrt(ftx * ftx + fty * fty + ftz * ftz + 1e-18)
                scale = jnp.minimum(1.0, mu * fn / ftm)
                ftx = ftx * scale
                fty = fty * scale
                ftz = ftz * scale
            else:
                ftx = fty = ftz = 0.0

            pfx = ok * (-fn * nxh + ftx)
            pfy = ok * (-fn * nyh + fty)
            pfz = ok * (-fn * nzh + ftz)
            fx = fx + jnp.sum(pfx, axis=1)
            fy = fy + jnp.sum(pfy, axis=1)
            fz = fz + jnp.sum(pfz, axis=1)
            # torque = (arm n) × f_pair
            tpx = arm * (nyh * pfz - nzh * pfy)
            tpy = arm * (nzh * pfx - nxh * pfz)
            tpz = arm * (nxh * pfy - nyh * pfx)
            tx = tx + jnp.sum(tpx, axis=1)
            ty = ty + jnp.sum(tpy, axis=1)
            tz = tz + jnp.sum(tpz, axis=1)

        out_ref[0] = fx
        out_ref[1] = fy
        out_ref[2] = fz
        out_ref[3] = tx
        out_ref[4] = ty
        out_ref[5] = tz

    return kernel, G


@functools.partial(jax.jit, static_argnames=(
    "radius", "kn", "gn", "kt", "gt", "mu", "dt", "friction",
    "grid_dims", "C", "B", "interpret"))
def dem_cell_forces_pallas(feat, edge_ok, *, radius, kn, gn, kt=0.0, gt=0.0,
                           mu=0.0, dt=0.0, friction=False, grid_dims,
                           C, B=256, interpret=False):
    """Pair forces/torques over the cell-dense plane layout.

    feat: (10, C, NC) float32 feature planes (NC = nx·ny·nz, padded by the
    caller to a multiple of B is NOT required — padding happens here);
    edge_ok: (27, NC) float32 validity of each neighbor offset per cell.
    Returns (6, C, NC): force xyz + torque xyz planes.
    """
    nx, ny, nz = grid_dims
    n_cells = nx * ny * nz
    lin = [((dx * ny) + dy) * nz + dz for (dx, dy, dz) in _OFFSETS]
    kernel, G = _make_kernel(C, B, lin, float(radius), float(kn), float(gn),
                             float(kt), float(gt), float(mu), float(dt),
                             bool(friction))

    nc_pad = ((n_cells + B - 1) // B) * B
    # lane padding: G ghosts in front, G + block remainder behind
    pad_lo = jnp.zeros((F_FEAT, C, G), jnp.float32)
    pad_hi = jnp.zeros((F_FEAT, C, G + nc_pad - n_cells), jnp.float32)
    feat_p = jnp.concatenate([pad_lo, feat, pad_hi], axis=2)
    edge_p = jnp.concatenate(
        [edge_ok, jnp.zeros((27, nc_pad - n_cells), jnp.float32)], axis=1)

    flops_per_pair = 60
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((6, C, nc_pad), jnp.float32),
        grid=(nc_pad // B,),
        in_specs=[
            pl.BlockSpec((27, B), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((6, C, B), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((F_FEAT, C, B), jnp.float32),       # self slab
            pltpu.VMEM((2, F_FEAT, C, B), jnp.float32),    # nbr double buffer
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * 27 * C * C * nc_pad,
            bytes_accessed=(27 + 1) * F_FEAT * C * nc_pad * 4 + 6 * C * nc_pad * 4,
            transcendentals=3 * 27 * C * C * nc_pad,
        ),
        interpret=interpret,
    )(edge_p, feat_p)
    return out[:, :, :n_cells]


def edge_ok_table(grid_dims, periodic=(False, False, False)):
    """(27, NC) float32 validity of each neighbor offset per cell (handles
    non-periodic domain edges; periodic axes need ghost mirroring upstream —
    the bench domain is a closed box, so all axes are non-periodic)."""
    nx, ny, nz = grid_dims
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    out = np.zeros((27, nx * ny * nz), np.float32)
    for k, (dx, dy, dz) in enumerate(_OFFSETS):
        ok = np.ones((nx, ny, nz), bool)
        if not periodic[0]:
            ok &= (ii + dx >= 0) & (ii + dx < nx)
        if not periodic[1]:
            ok &= (jj + dy >= 0) & (jj + dy < ny)
        if not periodic[2]:
            ok &= (kk + dz >= 0) & (kk + dz < nz)
        out[k] = ok.reshape(-1)
    return jnp.asarray(out)
