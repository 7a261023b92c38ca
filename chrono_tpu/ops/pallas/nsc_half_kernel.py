"""Pallas TPU kernels for NSC/DVI with SINGLE-SIDED multipliers (v4).

Successor of nsc_partner_kernel (v3).  v3 stores every contact's (γn, γu,
γv) twice — once per side, kept bitwise-consistent by symmetric updates —
so both sweeps walk all 27 neighbor offsets and each pair is geometrically
evaluated twice.  v4 stores each pair ONCE, on the side from which the
partner lies in the forward half stencil (the DEM/SPH v4 pattern):

* classes 0..11: the 4 forward xy offsets {(0,1),(1,−1),(1,0),(1,1)}
  × dz ∈ {−1,0,+1} — pencil-row deltas +1, ny−1, ny, ny+1;
* class 12: (0,0,+1) — same pencil, one lane up;
* class 13: same cell, c_nbr > c_self (strict upper triangle).

The tangent basis maps exactly under side swap (t1(−n) = −t1(n),
t2(−n) = t2(n); constraint velocities (gn, gu) symmetric, gv
antisymmetric — see nsc_pencil_kernel.pair_geometry), so one stored γ
serves both bodies: the u-sweep computes D^T γ once per pair and scatters
the −force/+torque reaction to the partner through the same forward-only
rolling VMEM window as the DEM v4 kernel, and the g-sweep updates each γ
once with NO scatter at all (the owner sees both bodies' u: its own slab
and the forward neighbor slab).

Per APGD iteration vs v3: half the pair geometry, half the code-matching
(14·P vs 27·P compare-blocks), half the multiplier traffic, 5 DMA slabs
vs 10.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chrono_tpu.ops.pallas.nsc_pencil_kernel import (
    pair_geometry, pair_velocity, contact_rhs, cone_project, wall_geometry,
)
from chrono_tpu.ops.pallas.nsc_partner_kernel import _wall_tangent

_PX, _PY, _PZ, _VX, _VY, _VZ, _WX, _WY, _WZ, _MASK = range(10)

_FWD_XY = [(0, 1), (1, -1), (1, 0), (1, 1)]
N_CLASS = 14


def _class_offset(k):
    """(dx, dy, dz) of forward class k (13 = self-cell triangle)."""
    if k < 12:
        dx, dy = _FWD_XY[k // 3]
        return dx, dy, (k % 3) - 1
    if k == 12:
        return 0, 0, 1
    return 0, 0, 0


def detect_half(radius, envelope, grid, pos, mask, P):
    """Single-sided partner codes: (nx,ny,nz,C,P) float32 of k·C + c_nbr
    over the forward half stencil only (−1 = empty).  Each geometric pair
    is owned by exactly one side.  Returns (codes, overflow)."""
    nx, ny, nz = grid.dims
    C = mask.shape[3]
    maskf = mask.astype(pos.dtype)

    def edge_ok(dx, dy, dz):
        def ok1(n, off):
            idx = jnp.arange(n)
            if off == -1:
                return idx > 0
            if off == 1:
                return idx < n - 1
            return jnp.ones((n,), bool)
        return (ok1(nx, dx)[:, None, None] & ok1(ny, dy)[None, :, None]
                & ok1(nz, dz)[None, None, :])

    valid_list = []
    for k in range(N_CLASS):
        dx, dy, dz = _class_offset(k)
        npos = jnp.roll(pos, (-dx, -dy, -dz), axis=(0, 1, 2))
        nmask = jnp.roll(maskf, (-dx, -dy, -dz), axis=(0, 1, 2))
        d = npos[..., None, :, :] - pos[..., :, None, :]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-18)
        gap = dist - 2.0 * radius
        ok = ((gap < envelope)
              & (maskf[..., :, None] > 0) & (nmask[..., None, :] > 0)
              & edge_ok(dx, dy, dz)[..., None, None])
        if k == 13:
            tri = (jnp.arange(C)[:, None] < jnp.arange(C)[None, :])
            ok = ok & tri
        valid_list.append(ok)
    valid = jnp.stack(valid_list, axis=-2)        # (nx,ny,nz,Cs,14,Cn)
    valid = valid.reshape(valid.shape[:-2] + (N_CLASS * C,))
    rank = jnp.where(valid, jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1,
                     -1)
    code1 = jnp.arange(1, N_CLASS * C + 1, dtype=jnp.float32)
    codes = jnp.stack(
        [jnp.sum((rank == p).astype(jnp.float32) * code1, axis=-1) - 1.0
         for p in range(P)], axis=-1)
    overflow = jnp.maximum(jnp.max(jnp.sum(valid, axis=-1)) - P, 0)
    return codes, overflow


def _make_half_kernel(C, NZ, Bxy, ny, G, P, WB, phys, walls, mode,
                      n_cs=2):
    """mode='u': u = u_free + M⁻¹ Dᵀ y with reaction window → (Bxy,6,C,NZ).
    mode='g': single-sided γ⁺ = Π(y − s(Du − b)) → (gout, wout).
    ``n_cs``: traced scalars per rotbox wall (2 = pose only; 3 = pose +
    angular velocity, the dynamic-blade mode)."""
    fwd_lin = [dx * ny + dy for (dx, dy) in _FWD_XY]
    radius = phys["radius"]
    inv_m = phys["inv_m"]
    inv_I = phys["inv_I"]
    envelope = phys["envelope"]
    mu = phys["mu"]
    omega = phys["omega"]
    stab_over_h = phys["stab_over_h"]
    inv_h = phys["inv_h"]
    max_recovery = phys["max_recovery"]

    def kernel(beta_ref, codes_ref, gam_ref, gprev_ref,
               wgam_ref, wgprev_ref, feat_ref, *rest):
        if mode == "u":
            out_ref, bufA, bufB, accA, accB, semA, semB = rest
        else:
            gout_ref, wout_ref, bufA, bufB, semA, semB = rest
        b = pl.program_id(0)
        base = b * Bxy + G

        if mode == "u":
            @pl.when(b == 0)
            def _init():
                accA[...] = jnp.zeros((WB, 6, C, NZ), jnp.float32)

        # two contiguous-span DMAs per block, double-buffered across grid
        # steps (the 5 per-block slab DMAs were latency-serial: the blade
        # tank measured ~41 µs per ROW independent of lane count):
        #   span A rows [base, base+Bxy+1): self + the dx,dy=+0,+1 slab
        #   span B rows [base+ny−1, base+ny+Bxy+1): the ny−1/ny/ny+1 slabs
        def dmaA(bb, slot):
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(bb * Bxy + G, Bxy + 1)],
                bufA.at[slot], semA.at[slot])

        def dmaB(bb, slot):
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(bb * Bxy + G + ny - 1, Bxy + 2)],
                bufB.at[slot], semB.at[slot])

        @pl.when(b == 0)
        def _warm():
            dmaA(0, 0).start()
            dmaB(0, 0).start()

        slot = b % 2
        dmaA(b, slot).wait()
        dmaB(b, slot).wait()

        # prefetch the next block while this one computes (reads pad rows
        # at the edge); the LAST block must not start one — a DMA left
        # in flight at kernel exit hangs the device
        @pl.when(b + 1 < pl.num_programs(0))
        def _prefetch():
            dmaA(b + 1, 1 - slot).start()
            dmaB(b + 1, 1 - slot).start()
        spanA = bufA[slot]
        spanB = bufB[slot]
        self_buf = spanA[0:Bxy]
        beta = beta_ref[0, 0]

        ys = []
        for pp in range(P):
            r0 = 3 * pp
            g0n = gam_ref[:, r0]
            g0u = gam_ref[:, r0 + 1]
            g0v = gam_ref[:, r0 + 2]
            ys.append((g0n + beta * (g0n - gprev_ref[:, r0]),
                       g0u + beta * (g0u - gprev_ref[:, r0 + 1]),
                       g0v + beta * (g0v - gprev_ref[:, r0 + 2])))
        codes = [codes_ref[:, pp] for pp in range(P)]

        spx = self_buf[:, _PX][:, :, None, :]
        spy = self_buf[:, _PY][:, :, None, :]
        spz = self_buf[:, _PZ][:, :, None, :]
        if mode == "g":
            sv = tuple(self_buf[:, f][:, :, None, :]
                       for f in (_VX, _VY, _VZ))
            sw = tuple(self_buf[:, f][:, :, None, :]
                       for f in (_WX, _WY, _WZ))
            gacc = [jnp.zeros((Bxy, C, NZ), jnp.float32)
                    for _ in range(3 * P)]
        else:
            fx = jnp.zeros((Bxy, C, NZ), jnp.float32)
            fy = jnp.zeros((Bxy, C, NZ), jnp.float32)
            fz = jnp.zeros((Bxy, C, NZ), jnp.float32)
            tx = jnp.zeros((Bxy, C, NZ), jnp.float32)
            ty = jnp.zeros((Bxy, C, NZ), jnp.float32)
            tz = jnp.zeros((Bxy, C, NZ), jnp.float32)
            L = jnp.zeros((WB, 6, C, NZ), jnp.float32)

        nbr_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, C, C, NZ), 2).astype(jnp.float32)

        # classes 0..2 use the +1 slab (span A shifted by one row),
        # 3..11 the ny−1/ny/ny+1 slabs (span B), 12/13 the self slab
        def slab_for(k):
            if k < 3:
                return spanA[1:Bxy + 1]
            if k < 12:
                d = k // 3 - 1
                return spanB[d:d + Bxy]
            return self_buf

        for k in range(N_CLASS):
            dx, dy, dz = _class_offset(k)
            slab = slab_for(k)
            sl = slab if dz == 0 else pltpu.roll(slab, (-dz) % NZ, 3)
            npx = sl[:, _PX][:, None, :, :]
            npy = sl[:, _PY][:, None, :, :]
            npz = sl[:, _PZ][:, None, :, :]

            kcode = float(k * C)
            yn = jnp.zeros((Bxy, C, C, NZ), jnp.float32)
            yu = jnp.zeros((Bxy, C, C, NZ), jnp.float32)
            yv = jnp.zeros((Bxy, C, C, NZ), jnp.float32)
            hit = jnp.zeros((Bxy, C, C, NZ), jnp.float32)
            for pp in range(P):
                m = (codes[pp][:, :, None, :] == (nbr_iota + kcode)
                     ).astype(jnp.float32)
                yn = yn + m * ys[pp][0][:, :, None, :]
                yu = yu + m * ys[pp][1][:, :, None, :]
                yv = yv + m * ys[pp][2][:, :, None, :]
                hit = hit + m

            nhat, gap, arm, t1, t2 = pair_geometry(
                spx, spy, spz, npx, npy, npz, radius)

            if mode == "u":
                pfx = hit * -(yn * nhat[0] + yu * t1[0] + yv * t2[0])
                pfy = hit * -(yn * nhat[1] + yu * t1[1] + yv * t2[1])
                pfz = hit * -(yn * nhat[2] + yu * t1[2] + yv * t2[2])
                ptx = hit * arm * (yv * t1[0] - yu * t2[0])
                pty = hit * arm * (yv * t1[1] - yu * t2[1])
                ptz = hit * arm * (yv * t1[2] - yu * t2[2])
                fx = fx + jnp.sum(pfx, axis=2)
                fy = fy + jnp.sum(pfy, axis=2)
                fz = fz + jnp.sum(pfz, axis=2)
                tx = tx + jnp.sum(ptx, axis=2)
                ty = ty + jnp.sum(pty, axis=2)
                tz = tz + jnp.sum(ptz, axis=2)
                # reaction on the partner: −force, +torque (tangent parity)
                rf = [-jnp.sum(pfx, axis=1), -jnp.sum(pfy, axis=1),
                      -jnp.sum(pfz, axis=1), jnp.sum(ptx, axis=1),
                      jnp.sum(pty, axis=1), jnp.sum(ptz, axis=1)]
                if dz != 0:
                    rf = [pltpu.roll(r, dz % NZ, 2) for r in rf]
                if k < 12:
                    react = jnp.stack(rf, axis=1)
                    d = fwd_lin[k // 3]
                    L = L + jnp.pad(
                        react, ((d, WB - d - Bxy), (0, 0), (0, 0), (0, 0)))
                else:
                    fx, fy, fz = fx + rf[0], fy + rf[1], fz + rf[2]
                    tx, ty, tz = tx + rf[3], ty + rf[4], tz + rf[5]
            else:
                nv = tuple(sl[:, f][:, None, :, :] for f in (_VX, _VY, _VZ))
                nw = tuple(sl[:, f][:, None, :, :] for f in (_WX, _WY, _WZ))
                gn_v, gu_v, gv_v = pair_velocity(
                    nhat, t1, t2, arm, sv, nv, sw, nw)
                bn = contact_rhs(gap, stab_over_h, inv_h, max_recovery)
                s = omega / (2.0 * inv_m + 2.0 * arm * arm * inv_I)
                pn, pu, pv = cone_project(
                    yn - s * (gn_v - bn), yu - s * gu_v, yv - s * gv_v, mu)
                for pp in range(P):
                    m = (codes[pp][:, :, None, :] == (nbr_iota + kcode)
                         ).astype(jnp.float32)
                    gacc[3 * pp] = gacc[3 * pp] + jnp.sum(m * pn, axis=2)
                    gacc[3 * pp + 1] = gacc[3 * pp + 1] + jnp.sum(
                        m * pu, axis=2)
                    gacc[3 * pp + 2] = gacc[3 * pp + 2] + jnp.sum(
                        m * pv, axis=2)

        # ---- rolling-window combine (u mode) ----
        if mode == "u":
            def window(acc_in, acc_out):
                fin = acc_in[0:Bxy] + L[0:Bxy]
                acc_out[0:WB - Bxy] = acc_in[Bxy:WB] + L[Bxy:WB]
                acc_out[WB - Bxy:WB] = jnp.zeros((Bxy, 6, C, NZ),
                                                 jnp.float32)
                return fin

            is_even = b % 2 == 0

            @pl.when(is_even)
            def _even():
                out_ref[:, 0:6] = window(accA, accB)

            @pl.when(jnp.logical_not(is_even))
            def _odd():
                out_ref[:, 0:6] = window(accB, accA)

            fx = fx + out_ref[:, 0]
            fy = fy + out_ref[:, 1]
            fz = fz + out_ref[:, 2]
            tx = tx + out_ref[:, 3]
            ty = ty + out_ref[:, 4]
            tz = tz + out_ref[:, 5]

        # ---- walls (self-only rows), identical to the partner kernel ----
        # CHRONO_NSC_SKIP_WALLS: measurement-only gate for probing the
        # wall-family share of the sweep cost (physics-wrong when set)
        import os as _os
        _skip_walls = bool(_os.environ.get("CHRONO_NSC_SKIP_WALLS"))
        px = self_buf[:, _PX]
        py = self_buf[:, _PY]
        pz = self_buf[:, _PZ]
        mask = self_buf[:, _MASK]
        if mode == "g":
            v0 = tuple(self_buf[:, f] for f in (_VX, _VY, _VZ))
            w0 = tuple(self_buf[:, f] for f in (_WX, _WY, _WZ))
        rb = 0
        if _skip_walls and mode == "g":
            wout_ref[...] = jnp.zeros_like(wout_ref)
        for w, wall in enumerate(walls if not _skip_walls else ()):
            mu_w = wall[4] if wall[0] == "plane" else wall[5]
            if wall[0] == "rotbox":
                # traced blade pose (+ angular velocity when n_cs=3) rides
                # the SMEM scalar block after β
                cs = tuple(beta_ref[0, 1 + n_cs * rb + j]
                           for j in range(n_cs))
                rb += 1
            else:
                cs = None
            nhat, gap, vsurf = wall_geometry(wall, px, py, pz, radius, cs)
            okw = mask * (gap < envelope).astype(jnp.float32)
            armw = radius + 0.5 * jnp.minimum(gap, 0.0)
            t1, t2 = _wall_tangent(*nhat)
            r0 = w * 3
            wn0 = wgam_ref[:, r0]
            wu0 = wgam_ref[:, r0 + 1]
            wv0 = wgam_ref[:, r0 + 2]
            yn = wn0 + beta * (wn0 - wgprev_ref[:, r0])
            yu = wu0 + beta * (wu0 - wgprev_ref[:, r0 + 1])
            yv = wv0 + beta * (wv0 - wgprev_ref[:, r0 + 2])
            if mode == "u":
                fx = fx + okw * -(yn * nhat[0] + yu * t1[0] + yv * t2[0])
                fy = fy + okw * -(yn * nhat[1] + yu * t1[1] + yv * t2[1])
                fz = fz + okw * -(yn * nhat[2] + yu * t1[2] + yv * t2[2])
                tx = tx + okw * armw * (yv * t1[0] - yu * t2[0])
                ty = ty + okw * armw * (yv * t1[1] - yu * t2[1])
                tz = tz + okw * armw * (yv * t1[2] - yu * t2[2])
            else:
                gn_v, gu_v, gv_v = pair_velocity(
                    nhat, t1, t2, armw, v0, vsurf, w0,
                    (jnp.zeros_like(px),) * 3)
                bn = contact_rhs(gap, stab_over_h, inv_h, max_recovery)
                denom = inv_m + armw * armw * inv_I
                if wall[0] == "rotbox" and n_cs == 3:
                    # dynamic blade: rotational compliance rho^2/I_b joins
                    # the row diagonal (see solver.nsc_pencil dense_sweep_g)
                    axis = wall[1]
                    cx_, cy_, cz_ = wall[2]
                    d3 = (px - cx_, py - cy_, pz - cz_)
                    i1, i2 = [(1, 2), (2, 0), (0, 1)][axis]
                    rho2 = d3[i1] * d3[i1] + d3[i2] * d3[i2]
                    denom = denom + rho2 * phys["inv_Ib"]
                s = omega / denom
                pn, pu, pv = cone_project(
                    yn - s * (gn_v - bn), yu - s * gu_v, yv - s * gv_v, mu_w)
                wout_ref[:, r0] = okw * pn
                wout_ref[:, r0 + 1] = okw * pu
                wout_ref[:, r0 + 2] = okw * pv

        if mode == "u":
            m = mask
            out_ref[:, 0] = (self_buf[:, _VX] + inv_m * fx) * m
            out_ref[:, 1] = (self_buf[:, _VY] + inv_m * fy) * m
            out_ref[:, 2] = (self_buf[:, _VZ] + inv_m * fz) * m
            out_ref[:, 3] = (self_buf[:, _WX] + inv_I * tx) * m
            out_ref[:, 4] = (self_buf[:, _WY] + inv_I * ty) * m
            out_ref[:, 5] = (self_buf[:, _WZ] + inv_I * tz) * m
        else:
            for pp in range(P):
                valid = (codes[pp] >= 0.0).astype(jnp.float32)
                gout_ref[:, 3 * pp] = gacc[3 * pp] * valid
                gout_ref[:, 3 * pp + 1] = gacc[3 * pp + 1] * valid
                gout_ref[:, 3 * pp + 2] = gacc[3 * pp + 2] * valid

    return kernel


def _pad_feat(feat, G, nxy, nxy_pad, extra=0):
    _, F, C, NZp = feat.shape
    pad_lo = jnp.zeros((G, F, C, NZp), jnp.float32)
    # ``extra``: room for the cross-block DMA prefetch issued by the last
    # grid step (reads one block past the end)
    pad_hi = jnp.zeros((G + nxy_pad - nxy + extra, F, C, NZp), jnp.float32)
    return jnp.concatenate([pad_lo, feat[:nxy], pad_hi], axis=0)


def _call_half(mode, feat, codes, gam, gprev, wgam, wgprev, beta, *,
               phys, walls, grid_dims, C, P, Bxy, interpret, cs=None):
    n_rb = sum(1 for w in walls if w[0] == "rotbox")
    if n_rb and (cs is None or len(cs) % n_rb
                 or len(cs) // n_rb not in (2, 3)):
        raise ValueError("rotbox walls need cs=(cosθ, sinθ[, ω]) scalars")
    n_cs = (len(cs) // n_rb) if n_rb else 2
    nx, ny, nz = grid_dims
    if ny < 2:
        raise ValueError("half kernel needs ny >= 2")
    nxy = nx * ny
    NZp = feat.shape[3]
    if NZp % 128 or nz > NZp - 1:
        raise ValueError(f"NZp={NZp} must be a 128-multiple > nz={nz}")
    G = ny + 1
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    WB = ny + 1 + Bxy
    feat_p = _pad_feat(feat, G, nxy, nxy_pad, extra=Bxy + 2)
    W3 = wgam.shape[1]
    P3 = gam.shape[1]

    kern = _make_half_kernel(C, NZp, Bxy, ny, G, P, WB, dict(phys), walls,
                             mode, n_cs=n_cs)
    if mode == "u":
        out_shape = jax.ShapeDtypeStruct((nxy_pad, 6, C, NZp), jnp.float32)
        out_specs = pl.BlockSpec((Bxy, 6, C, NZp), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((2, Bxy + 1, 10, C, NZp), jnp.float32),
            pltpu.VMEM((2, Bxy + 2, 10, C, NZp), jnp.float32),
            pltpu.VMEM((WB, 6, C, NZp), jnp.float32),
            pltpu.VMEM((WB, 6, C, NZp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((nxy_pad, P3, C, NZp), jnp.float32),
            jax.ShapeDtypeStruct((nxy_pad, W3, C, NZp), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((Bxy, P3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, W3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((2, Bxy + 1, 10, C, NZp), jnp.float32),
            pltpu.VMEM((2, Bxy + 2, 10, C, NZp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    fn = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(nxy_pad // Bxy,),
        in_specs=[
            pl.BlockSpec((1, 1 + n_cs * n_rb), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Bxy, P, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, P3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, P3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, W3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, W3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=(60 + 8 * P) * N_CLASS * C * C * nxy_pad * NZp,
            bytes_accessed=(3 * P3 + P + 2 * W3 + 5 * 10 + 6)
            * C * NZp * nxy_pad * 4,
            transcendentals=4 * N_CLASS * C * C * nxy_pad * NZp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )
    scal = [beta.astype(jnp.float32)]
    if n_rb:
        scal += [jnp.asarray(c, jnp.float32) for c in cs]
    beta_s = jnp.stack(scal).reshape(1, 1 + n_cs * n_rb)
    return fn(beta_s, codes, gam, gprev, wgam, wgprev, feat_p)


def nsc_half_sweep_u_pallas(feat, codes, gam, gprev, wgam, wgprev,
                            beta, *, phys, walls, grid_dims, C, P,
                            Bxy=1, interpret=False, cs=None):
    return _call_half("u", feat, codes, gam, gprev, wgam, wgprev, beta,
                      phys=phys, walls=walls, grid_dims=grid_dims, C=C,
                      P=P, Bxy=Bxy, interpret=interpret, cs=cs)


def nsc_half_sweep_g_pallas(featU, codes, gam, gprev, wgam, wgprev,
                            beta, *, phys, walls, grid_dims, C, P,
                            Bxy=1, interpret=False, cs=None):
    return _call_half("g", featU, codes, gam, gprev, wgam, wgprev, beta,
                      phys=phys, walls=walls, grid_dims=grid_dims, C=C,
                      P=P, Bxy=Bxy, interpret=interpret, cs=cs)
