"""Pallas TPU DEM kernel, pencil layout (v2) — alignment-safe DMA.

Successor to dem_cell_kernel (v1).  v1 put linearized cells in the lane
dimension and DMA'd 27 neighbor slabs at lane offsets ±1/±nz/±ny·nz — Mosaic
rejects dynamic HBM slices at non-128-aligned offsets in a tiled (lane)
dimension, so v1 never compiled for real TPU.  v2 restructures the layout so
every DMA offset lands on the *leading, untiled* dimension:

    feat (NXY, F, C, NZp)   —  xy pencils lead; (C, NZp) are the tiled dims
                               (C = 8 slots = one sublane tile, NZp = z cells
                               padded to a lane-tile multiple of 128)

* The 9 in-plane (dx, dy) neighbor offsets become leading-dimension slices
  ``feat[pl.ds(base + dx·ny + dy, Bxy)]`` — arbitrary dynamic offsets are
  legal there, double-buffered HBM→VMEM DMA as before.
* The 3 out-of-plane dz offsets become **in-register lane rotations**
  (``pltpu.roll`` on the z/lane axis) of the already-fetched slab — no DMA at
  all.  Ghost lanes (z padding) carry mask = 0, and ``nz ≤ NZp − 1`` keeps the
  rotation wrap inside the padding.

Per substep the kernel streams 9·|feat| bytes instead of v1's 27·|feat| and
evaluates 27·C² dense pair slots per cell on the VPU, with zero gathers /
scatters / atomics.  Physics: Hertz(-Mindlin) normal + single-step Coulomb
friction, matching chrono_tpu.dem.cell_dense (reference hot loop:
/root/reference/src/chrono_dem/gpu/ChDemSMC.cuh:629-696).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# feature-plane rows (same order as dem_cell_kernel)
_PX, _PY, _PZ, _VX, _VY, _VZ, _WX, _WY, _WZ, _MASK = range(10)
F_FEAT = 10

_XY_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _make_kernel(C, NZ, Bxy, ny, radius, kn, gn, kt, gt, mu, dt, friction,
                 G, fused=None):
    """``fused=None`` → force/torque output kernel; ``fused`` a dict with
    keys walls (list of (normal3, offset, vel3) python floats), gravity,
    inv_m, inv_I → whole-substep kernel writing the UPDATED feature planes
    (wall pass + semi-implicit Euler integration fused in; zero HBM traffic
    between force evaluation and integration)."""
    xy_lin = [dx * ny + dy for (dx, dy) in _XY_OFFSETS]

    def kernel(edge_ref, feat_ref, out_ref, self_buf, nbuf, self_sem, nsem):
        b = pl.program_id(0)
        base = b * Bxy + G

        cp_self = pltpu.make_async_copy(
            feat_ref.at[pl.ds(base, Bxy)], self_buf, self_sem)
        cp_self.start()

        def nbr_dma(slot, k):
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(base + xy_lin[k], Bxy)],
                nbuf.at[slot], nsem.at[slot])

        nbr_dma(0, 0).start()
        cp_self.wait()

        # self features, broadcast over the neighbor-slot axis: (Bxy, C, 1, NZ)
        s = [self_buf[:, f][:, :, None, :] for f in range(F_FEAT)]

        fx = jnp.zeros((Bxy, C, NZ), jnp.float32)
        fy = jnp.zeros((Bxy, C, NZ), jnp.float32)
        fz = jnp.zeros((Bxy, C, NZ), jnp.float32)
        tx = jnp.zeros((Bxy, C, NZ), jnp.float32)
        ty = jnp.zeros((Bxy, C, NZ), jnp.float32)
        tz = jnp.zeros((Bxy, C, NZ), jnp.float32)

        neq = (jax.lax.broadcasted_iota(jnp.int32, (C, C, NZ), 0)
               != jax.lax.broadcasted_iota(jnp.int32, (C, C, NZ), 1)
               ).astype(jnp.float32)

        for k in range(9):
            if k + 1 < 9:
                nbr_dma((k + 1) % 2, k + 1).start()
            nbr_dma(k % 2, k).wait()
            slab = nbuf[k % 2]                      # (Bxy, F, C, NZ)
            # edge_ref carries the FULL (nxy_pad, 9) mask (a (Bxy, 9)
            # block violates Mosaic's (8, 128)-divisibility when Bxy < 8
            # — caught by the on-hardware compile gate); slice our rows
            ok_xy = edge_ref[pl.ds(b * Bxy, Bxy), k][:, None, None, None]

            for dz in (-1, 0, 1):
                if dz == 0:
                    sl = slab
                else:
                    sl = pltpu.roll(slab, (-dz) % NZ, 3)
                # neighbor features over the slot axis: (Bxy, 1, C, NZ)
                n = [sl[:, f][:, None, :, :] for f in range(F_FEAT)]

                dx = n[_PX] - s[_PX]                # (Bxy, C, C, NZ)
                dy = n[_PY] - s[_PY]
                dzz = n[_PZ] - s[_PZ]
                dist2 = dx * dx + dy * dy + dzz * dzz
                inv = jax.lax.rsqrt(dist2 + 1e-18)
                dist = dist2 * inv
                nxh = dx * inv
                nyh = dy * inv
                nzh = dzz * inv
                overlap = 2.0 * radius - dist

                ok = (s[_MASK] * n[_MASK] * ok_xy
                      * (overlap > 0.0).astype(jnp.float32))
                if k == 4 and dz == 0:              # self cell: drop i == j
                    ok = ok * neq[None]

                delta = jnp.maximum(overlap, 0.0)
                sq = jnp.sqrt(delta)
                q4 = jnp.sqrt(sq)
                arm = radius - 0.5 * delta

                # (ω_nbr + ω_self) × n, scaled by −arm
                wsx = n[_WX] + s[_WX]
                wsy = n[_WY] + s[_WY]
                wsz = n[_WZ] + s[_WZ]
                cx = wsy * nzh - wsz * nyh
                cy = wsz * nxh - wsx * nzh
                cz = wsx * nyh - wsy * nxh
                vrx = n[_VX] - s[_VX] - arm * cx
                vry = n[_VY] - s[_VY] - arm * cy
                vrz = n[_VZ] - s[_VZ] - arm * cz

                vn = vrx * nxh + vry * nyh + vrz * nzh
                fn = jnp.maximum(kn * sq * delta - gn * q4 * vn, 0.0)

                if friction:
                    vtx = vrx - vn * nxh
                    vty = vry - vn * nyh
                    vtz = vrz - vn * nzh
                    coef = kt * sq * dt + gt * q4   # single-step: ξ = v_t·dt
                    ftx = coef * vtx
                    fty = coef * vty
                    ftz = coef * vtz
                    ft2 = ftx * ftx + fty * fty + ftz * ftz + 1e-18
                    rinv = jax.lax.rsqrt(ft2)
                    scale = jnp.minimum(1.0, mu * fn * rinv)
                    ftx = ftx * scale
                    fty = fty * scale
                    ftz = ftz * scale
                else:
                    ftx = fty = ftz = 0.0

                pfx = ok * (-fn * nxh + ftx)
                pfy = ok * (-fn * nyh + fty)
                pfz = ok * (-fn * nzh + ftz)
                fx = fx + jnp.sum(pfx, axis=2)
                fy = fy + jnp.sum(pfy, axis=2)
                fz = fz + jnp.sum(pfz, axis=2)
                # torque = (arm n) × f_pair
                tx = tx + jnp.sum(arm * (nyh * pfz - nzh * pfy), axis=2)
                ty = ty + jnp.sum(arm * (nzh * pfx - nxh * pfz), axis=2)
                tz = tz + jnp.sum(arm * (nxh * pfy - nyh * pfx), axis=2)

        if fused is None:
            out_ref[:, 0] = fx
            out_ref[:, 1] = fy
            out_ref[:, 2] = fz
            out_ref[:, 3] = tx
            out_ref[:, 4] = ty
            out_ref[:, 5] = tz
            return

        # ---- fused tail: static plane walls + integration ----
        px = self_buf[:, _PX]
        py = self_buf[:, _PY]
        pz = self_buf[:, _PZ]
        vx0 = self_buf[:, _VX]
        vy0 = self_buf[:, _VY]
        vz0 = self_buf[:, _VZ]
        wx0 = self_buf[:, _WX]
        wy0 = self_buf[:, _WY]
        wz0 = self_buf[:, _WZ]
        mask = self_buf[:, _MASK]
        knw, gnw, ktw, gtw, muw = fused["wall_coefs"]
        for nw, off, vw in fused["walls"]:
            dwall = nw[0] * px + nw[1] * py + nw[2] * pz - off
            delta = jnp.maximum(radius - dwall, 0.0)
            okw = mask * (delta > 0.0).astype(jnp.float32)
            nx_, ny_, nz_ = -nw[0], -nw[1], -nw[2]
            arm = radius - 0.5 * delta
            cxw = wy0 * nz_ - wz0 * ny_
            cyw = wz0 * nx_ - wx0 * nz_
            czw = wx0 * ny_ - wy0 * nx_
            vrx = vw[0] - vx0 - arm * cxw
            vry = vw[1] - vy0 - arm * cyw
            vrz = vw[2] - vz0 - arm * czw
            vn = vrx * nx_ + vry * ny_ + vrz * nz_
            sq = jnp.sqrt(delta)
            q4 = jnp.sqrt(sq)
            fn = jnp.maximum(knw * sq * delta - gnw * q4 * vn, 0.0)
            if friction:
                vtx = vrx - vn * nx_
                vty = vry - vn * ny_
                vtz = vrz - vn * nz_
                coefw = ktw * sq * dt + gtw * q4
                ftx, fty, ftz = coefw * vtx, coefw * vty, coefw * vtz
                ft2 = ftx * ftx + fty * fty + ftz * ftz + 1e-18
                scw = jnp.minimum(1.0, muw * fn * jax.lax.rsqrt(ft2))
                ftx, fty, ftz = ftx * scw, fty * scw, ftz * scw
            else:
                ftx = fty = ftz = 0.0
            pfx = okw * (-fn * nx_ + ftx)
            pfy = okw * (-fn * ny_ + fty)
            pfz = okw * (-fn * nz_ + ftz)
            fx, fy, fz = fx + pfx, fy + pfy, fz + pfz
            tx = tx + arm * (ny_ * pfz - nz_ * pfy)
            ty = ty + arm * (nz_ * pfx - nx_ * pfz)
            tz = tz + arm * (nx_ * pfy - ny_ * pfx)

        gx, gy, gz = fused["gravity"]
        inv_m = fused["inv_m"]
        inv_I = fused["inv_I"]
        vx1 = vx0 + dt * (fx * inv_m + gx) * mask
        vy1 = vy0 + dt * (fy * inv_m + gy) * mask
        vz1 = vz0 + dt * (fz * inv_m + gz) * mask
        out_ref[:, _PX] = px + dt * vx1 * mask
        out_ref[:, _PY] = py + dt * vy1 * mask
        out_ref[:, _PZ] = pz + dt * vz1 * mask
        out_ref[:, _VX] = vx1
        out_ref[:, _VY] = vy1
        out_ref[:, _VZ] = vz1
        out_ref[:, _WX] = wx0 + dt * tx * inv_I * mask
        out_ref[:, _WY] = wy0 + dt * ty * inv_I * mask
        out_ref[:, _WZ] = wz0 + dt * tz * inv_I * mask
        out_ref[:, _MASK] = mask

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "radius", "kn", "gn", "kt", "gt", "mu", "dt", "friction",
    "grid_dims", "C", "Bxy", "interpret"))
def dem_pencil_forces_pallas(feat, edge_ok, *, radius, kn, gn, kt=0.0,
                             gt=0.0, mu=0.0, dt=0.0, friction=False,
                             grid_dims, C, Bxy=8, interpret=False):
    """Pair forces/torques over the pencil layout.

    feat: (nx·ny, F, C, NZp) float32 — NZp a multiple of 128, z cells in
    [0, nz], nz ≤ NZp − 1 (ghost lanes mask = 0).  edge_ok: (9, nx·ny)
    validity of each in-plane neighbor offset per pencil.
    Returns (nx·ny, 6, C, NZp): force xyz + torque xyz planes.
    """
    nx, ny, nz = grid_dims
    nxy = nx * ny
    NZp = feat.shape[3]
    if NZp % 128 or nz > NZp - 1:
        raise ValueError(f"NZp={NZp} must be a 128-multiple > nz={nz}")

    G = ny + 1
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    pad_lo = jnp.zeros((G, F_FEAT, C, NZp), jnp.float32)
    pad_hi = jnp.zeros((G + nxy_pad - nxy, F_FEAT, C, NZp), jnp.float32)
    feat_p = jnp.concatenate([pad_lo, feat, pad_hi], axis=0)
    edge_p = jnp.concatenate(
        [edge_ok, jnp.zeros((9, nxy_pad - nxy), jnp.float32)], axis=1).T

    kernel = _make_kernel(C, NZp, Bxy, ny, float(radius), float(kn),
                          float(gn), float(kt), float(gt), float(mu),
                          float(dt), bool(friction), G)

    flops_per_pair = 95 if friction else 70
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nxy_pad, 6, C, NZp), jnp.float32),
        grid=(nxy_pad // Bxy,),
        in_specs=[
            pl.BlockSpec((nxy_pad, 9), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Bxy, 6, C, NZp), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Bxy, F_FEAT, C, NZp), jnp.float32),      # self slab
            pltpu.VMEM((2, Bxy, F_FEAT, C, NZp), jnp.float32),   # nbr 2-buffer
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * 27 * C * C * nxy_pad * NZp,
            bytes_accessed=(9 + 1) * F_FEAT * C * NZp * nxy_pad * 4
            + 6 * C * NZp * nxy_pad * 4,
            transcendentals=5 * 27 * C * C * nxy_pad * NZp,
        ),
        interpret=interpret,
    )(edge_p, feat_p)
    return out[:nxy]


@functools.partial(jax.jit, static_argnames=(
    "radius", "kn", "gn", "kt", "gt", "mu", "dt", "friction",
    "grid_dims", "C", "Bxy", "interpret", "walls", "wall_coefs",
    "gravity", "inv_m", "inv_I"))
def dem_pencil_substep_pallas(feat, edge_ok, *, radius, kn, gn, kt=0.0,
                              gt=0.0, mu=0.0, dt=0.0, friction=False,
                              grid_dims, C, Bxy=8, interpret=False,
                              walls=(), wall_coefs=(), gravity=(0, 0, 0),
                              inv_m=1.0, inv_I=1.0):
    """One whole DEM substep as a single Pallas kernel: pair forces +
    static plane walls + gravity + semi-implicit Euler integration, feat →
    feat.  ``walls``: tuple of ((nx,ny,nz), offset, (vx,vy,vz)) python
    floats (compile-time constants, like the reference's unified-memory
    GranParams).  Eliminates all between-kernel HBM round-trips — the
    XLA-visible substep is one op."""
    nx, ny, nz = grid_dims
    nxy = nx * ny
    NZp = feat.shape[3]
    if NZp % 128 or nz > NZp - 1:
        raise ValueError(f"NZp={NZp} must be a 128-multiple > nz={nz}")

    G = ny + 1
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    pad_lo = jnp.zeros((G, F_FEAT, C, NZp), jnp.float32)
    pad_hi = jnp.zeros((G + nxy_pad - nxy, F_FEAT, C, NZp), jnp.float32)
    feat_p = jnp.concatenate([pad_lo, feat, pad_hi], axis=0)
    edge_p = jnp.concatenate(
        [edge_ok, jnp.zeros((9, nxy_pad - nxy), jnp.float32)], axis=1).T

    fused = dict(walls=walls, wall_coefs=wall_coefs, gravity=gravity,
                 inv_m=inv_m, inv_I=inv_I)
    kernel = _make_kernel(C, NZp, Bxy, ny, float(radius), float(kn),
                          float(gn), float(kt), float(gt), float(mu),
                          float(dt), bool(friction), G, fused=fused)

    flops_per_pair = 95 if friction else 70
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nxy_pad, F_FEAT, C, NZp),
                                       jnp.float32),
        grid=(nxy_pad // Bxy,),
        in_specs=[
            pl.BlockSpec((nxy_pad, 9), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Bxy, F_FEAT, C, NZp),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Bxy, F_FEAT, C, NZp), jnp.float32),
            pltpu.VMEM((2, Bxy, F_FEAT, C, NZp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * 27 * C * C * nxy_pad * NZp,
            bytes_accessed=(9 + 2) * F_FEAT * C * NZp * nxy_pad * 4,
            transcendentals=5 * 27 * C * C * nxy_pad * NZp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(edge_p, feat_p)
    return out[:nxy]


def edge_ok_xy(grid_dims):
    """(9, nx·ny) float32 validity of each (dx, dy) offset per pencil
    (non-periodic domain edges; z edges are handled by masked ghost lanes)."""
    nx, ny, _ = grid_dims
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    out = np.zeros((9, nx * ny), np.float32)
    for k, (dx, dy) in enumerate(_XY_OFFSETS):
        ok = ((ii + dx >= 0) & (ii + dx < nx)
              & (jj + dy >= 0) & (jj + dy < ny))
        out[k] = ok.reshape(-1)
    return jnp.asarray(out)
