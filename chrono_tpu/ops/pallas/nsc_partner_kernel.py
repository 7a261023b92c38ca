"""Pallas TPU kernels for NSC/DVI on the PARTNER lattice (v3).

Successor of ops/pallas/nsc_pencil_kernel.py (kept as the dense reference):
the dense duplicated-multiplier pair lattice stores 27·3·C·C γ-values per
cell, which at realistic occupancies is >99% zeros — the measured 28 ms per
APGD iteration on a 23×23×42 drum was pure HBM traffic over that lattice.
Here multipliers live per BODY SLOT with a fixed partner budget
(the reference's own idea: MAX_SPHERES_TOUCHING_SPHERE = 12 contact-map
slots, /root/reference/src/chrono_dem/ChDemDefines.h:84, applied to the NSC
multiplier store):

* ``codes (NXY, P, C, NZp)``: partner descriptors per body slot, encoded as
  ``k27·C + c_nbr`` (float32 holding small exact ints; −1 = empty), built
  once per DVI step by :func:`detect_partners`.
* ``gam (NXY, 3·P, C, NZp)``: the (γn, γu, γv) triple per partner slot —
  13.5× smaller than the dense pair lattice at C=8, P=12.
* Every pair is stored twice (once per side); all updates are arranged
  bitwise-symmetric exactly as in the dense kernel, so the copies never
  diverge: geometry is sign-symmetric, u is a per-body field both sides
  read, and the per-slot update is a pure function of (y, u_self, u_nbr,
  geometry).

One APGD iteration = the same two sweeps as the dense kernel; inside the
27-offset candidate loop each (k27, c_nbr) block contributes only where a
code plane matches, so γ is read/written ONCE per sweep instead of per
offset — the candidate loop touches only the feature slabs.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chrono_tpu.ops.pallas.nsc_pencil_kernel import (
    pair_geometry, pair_velocity, contact_rhs, cone_project, wall_geometry,
    _k27, _XY_OFFSETS,
)

_PX, _PY, _PZ, _VX, _VY, _VZ, _WX, _WY, _WZ, _MASK = range(10)


# --------------------------------------------------------------------------
# detection (XLA, once per DVI step)
# --------------------------------------------------------------------------

def detect_partners(radius, envelope, grid, pos, mask, P):
    """Partner codes per (cell, slot): (nx,ny,nz,C,P) float32, −1 = empty.

    Candidate order is the fixed (k27, c_nbr) enumeration, so both sides of
    a pair rank their candidates deterministically.  Returns
    (codes, overflow) where overflow counts dropped partners (raise P)."""
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
    offsets = [(dx, dy, dzz) for (dx, dy) in _XY_OFFSETS for dzz in (-1, 0, 1)]
    for (dx, dy, dz) in offsets:
        npos = jnp.roll(pos, (-dx, -dy, -dz), axis=(0, 1, 2))
        nmask = jnp.roll(maskf, (-dx, -dy, -dz), axis=(0, 1, 2))
        d = npos[..., None, :, :] - pos[..., :, None, :]     # (...,Cs,Cn,3)
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-18)
        gap = dist - 2.0 * radius
        ok = ((gap < envelope)
              & (maskf[..., :, None] > 0) & (nmask[..., None, :] > 0)
              & edge_ok(dx, dy, dz)[..., None, None])
        if (dx, dy, dz) == (0, 0, 0):
            ok = ok & (~jnp.eye(C, dtype=bool))
        valid_list.append(ok)
    valid = jnp.stack(valid_list, axis=-2)       # (nx,ny,nz,Cs,27,Cn)
    valid = valid.reshape(valid.shape[:-2] + (27 * C,))
    # deterministic rank among valid candidates
    rank = jnp.where(valid, jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1,
                     -1)
    code1 = jnp.arange(1, 27 * C + 1, dtype=jnp.float32)  # k27·C+c_nbr + 1
    # codes[p] = Σ_cand (rank==p)·(code+1) − 1   (P-loop keeps the transient
    # at one (…, 27C) plane instead of a (…, 27C, P) one-hot tensor)
    codes = jnp.stack(
        [jnp.sum((rank == p).astype(jnp.float32) * code1, axis=-1) - 1.0
         for p in range(P)], axis=-1)
    overflow = jnp.maximum(jnp.max(jnp.sum(valid, axis=-1)) - P, 0)
    return codes, overflow


def codes_to_pencils(codes, nzp):
    """(nx,ny,nz,C,P) → (nx·ny, P, C, NZp)."""
    nx, ny, nz, C, P = codes.shape
    out = jnp.full((nx * ny, P, C, nzp), -1.0, codes.dtype)
    t = codes.reshape(nx * ny, nz, C, P).transpose(0, 3, 2, 1)
    return out.at[:, :, :, :nz].set(t)


# --------------------------------------------------------------------------
# Pallas sweeps
# --------------------------------------------------------------------------

def _wall_tangent(nx, nyy, nz):
    use_x = (jnp.abs(nx) < 0.9).astype(nx.dtype)
    t1x = (1.0 - use_x) * (-nz)
    t1y = use_x * nz
    t1z = use_x * (-nyy) + (1.0 - use_x) * nx
    tn = jax.lax.rsqrt(t1x * t1x + t1y * t1y + t1z * t1z + 1e-18)
    t1x, t1y, t1z = t1x * tn, t1y * tn, t1z * tn
    t2x = nyy * t1z - nz * t1y
    t2y = nz * t1x - nx * t1z
    t2z = nx * t1y - nyy * t1x
    return (t1x, t1y, t1z), (t2x, t2y, t2z)


def _make_partner_sweep_kernel(C, NZ, Bxy, ny, G, P, phys, walls, mode):
    """mode='u': u = u_free + M⁻¹ Dᵀ y → out (Bxy,6,C,NZ).
    mode='g': γ⁺ = Π(y − s(Du − b)) → gout (Bxy,3P,C,NZ), wout (Bxy,3W,C,NZ).
    """
    xy_lin = [dx * ny + dy for (dx, dy) in _XY_OFFSETS]
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
            out_ref, self_buf, nbuf, self_sem, nsem = rest
        else:
            gout_ref, wout_ref, self_buf, nbuf, self_sem, nsem = rest
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
        beta = beta_ref[0, 0]

        # per-partner y (read γ lattices ONCE)
        ys = []
        for p in range(P):
            r0 = 3 * p
            g0n = gam_ref[:, r0]
            g0u = gam_ref[:, r0 + 1]
            g0v = gam_ref[:, r0 + 2]
            ys.append((g0n + beta * (g0n - gprev_ref[:, r0]),
                       g0u + beta * (g0u - gprev_ref[:, r0 + 1]),
                       g0v + beta * (g0v - gprev_ref[:, r0 + 2])))
        codes = [codes_ref[:, p] for p in range(P)]          # (Bxy,C,NZ)

        spx = self_buf[:, _PX][:, :, None, :]
        spy = self_buf[:, _PY][:, :, None, :]
        spz = self_buf[:, _PZ][:, :, None, :]
        smask = self_buf[:, _MASK][:, :, None, :]
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

        # int iota + cast: Mosaic rejects float-typed tpu.iota on real TPU
        nbr_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, C, C, NZ), 2).astype(jnp.float32)  # c_nbr axis

        for k in range(9):
            if k + 1 < 9:
                nbr_dma((k + 1) % 2, k + 1).start()
            nbr_dma(k % 2, k).wait()
            slab = nbuf[k % 2]
            for dz in (-1, 0, 1):
                sl = slab if dz == 0 else pltpu.roll(slab, (-dz) % NZ, 3)
                npx = sl[:, _PX][:, None, :, :]
                npy = sl[:, _PY][:, None, :, :]
                npz = sl[:, _PZ][:, None, :, :]

                kcode = float(_k27(k, dz) * C)
                # match-gather y over partner slots: (Bxy,Cs,Cn,NZ)
                yn = jnp.zeros((Bxy, C, C, NZ), jnp.float32)
                yu = jnp.zeros((Bxy, C, C, NZ), jnp.float32)
                yv = jnp.zeros((Bxy, C, C, NZ), jnp.float32)
                hit = jnp.zeros((Bxy, C, C, NZ), jnp.float32)
                for p in range(P):
                    m = (codes[p][:, :, None, :] == (nbr_iota + kcode)
                         ).astype(jnp.float32)
                    yn = yn + m * ys[p][0][:, :, None, :]
                    yu = yu + m * ys[p][1][:, :, None, :]
                    yv = yv + m * ys[p][2][:, :, None, :]
                    hit = hit + m

                nhat, gap, arm, t1, t2 = pair_geometry(
                    spx, spy, spz, npx, npy, npz, radius)

                if mode == "u":
                    fx = fx + jnp.sum(
                        hit * -(yn * nhat[0] + yu * t1[0] + yv * t2[0]),
                        axis=2)
                    fy = fy + jnp.sum(
                        hit * -(yn * nhat[1] + yu * t1[1] + yv * t2[1]),
                        axis=2)
                    fz = fz + jnp.sum(
                        hit * -(yn * nhat[2] + yu * t1[2] + yv * t2[2]),
                        axis=2)
                    tx = tx + jnp.sum(
                        hit * arm * (yv * t1[0] - yu * t2[0]), axis=2)
                    ty = ty + jnp.sum(
                        hit * arm * (yv * t1[1] - yu * t2[1]), axis=2)
                    tz = tz + jnp.sum(
                        hit * arm * (yv * t1[2] - yu * t2[2]), axis=2)
                else:
                    nv = tuple(sl[:, f][:, None, :, :]
                               for f in (_VX, _VY, _VZ))
                    nw = tuple(sl[:, f][:, None, :, :]
                               for f in (_WX, _WY, _WZ))
                    gn_v, gu_v, gv_v = pair_velocity(
                        nhat, t1, t2, arm, sv, nv, sw, nw)
                    bn = contact_rhs(gap, stab_over_h, inv_h, max_recovery)
                    s = omega / (2.0 * inv_m + 2.0 * arm * arm * inv_I)
                    pn, pu, pv = cone_project(
                        yn - s * (gn_v - bn), yu - s * gu_v, yv - s * gv_v,
                        mu)
                    for p in range(P):
                        m = (codes[p][:, :, None, :] == (nbr_iota + kcode)
                             ).astype(jnp.float32)
                        gacc[3 * p] = gacc[3 * p] + jnp.sum(m * pn, axis=2)
                        gacc[3 * p + 1] = gacc[3 * p + 1] + jnp.sum(
                            m * pu, axis=2)
                        gacc[3 * p + 2] = gacc[3 * p + 2] + jnp.sum(
                            m * pv, axis=2)

        # walls (self-only rows) — identical math to the dense kernel
        px = self_buf[:, _PX]
        py = self_buf[:, _PY]
        pz = self_buf[:, _PZ]
        mask = self_buf[:, _MASK]
        if mode == "g":
            v0 = tuple(self_buf[:, f] for f in (_VX, _VY, _VZ))
            w0 = tuple(self_buf[:, f] for f in (_WX, _WY, _WZ))
        for w, wall in enumerate(walls):
            mu_w = wall[4] if wall[0] == "plane" else wall[5]
            nhat, gap, vsurf = wall_geometry(wall, px, py, pz, radius)
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
                s = omega / (inv_m + armw * armw * inv_I)
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
            for p in range(P):
                valid = (codes[p] >= 0.0).astype(jnp.float32)
                gout_ref[:, 3 * p] = gacc[3 * p] * valid
                gout_ref[:, 3 * p + 1] = gacc[3 * p + 1] * valid
                gout_ref[:, 3 * p + 2] = gacc[3 * p + 2] * valid

    return kernel


def _pad_feat(feat, G, nxy, nxy_pad):
    _, F, C, NZp = feat.shape
    pad_lo = jnp.zeros((G, F, C, NZp), jnp.float32)
    pad_hi = jnp.zeros((G + nxy_pad - nxy, F, C, NZp), jnp.float32)
    return jnp.concatenate([pad_lo, feat[:nxy], pad_hi], axis=0)


def _call_sweep(mode, feat, codes, gam, gprev, wgam, wgprev, beta, *,
                phys, walls, grid_dims, C, P, Bxy, interpret):
    """Shared wrapper: ghost-pads feat (the xy-offset DMAs stay in bounds;
    validity is carried entirely by the codes — a boundary cell simply has
    no code pointing at a missing/wrapped neighbor, so no edge table is
    needed in-kernel)."""
    nx, ny, nz = grid_dims
    nxy = nx * ny
    NZp = feat.shape[3]
    if NZp % 128 or nz > NZp - 1:
        raise ValueError(f"NZp={NZp} must be a 128-multiple > nz={nz}")
    G = ny + 1
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    feat_p = _pad_feat(feat, G, nxy, nxy_pad)
    for a, nm in ((gam, "gam"), (codes, "codes")):
        if a.shape[0] != nxy_pad:
            raise ValueError(f"{nm} rows {a.shape[0]} != nxy_pad {nxy_pad}")
    W3 = wgam.shape[1]
    P3 = gam.shape[1]

    kern = _make_partner_sweep_kernel(C, NZp, Bxy, ny, G, P, dict(phys),
                                      walls, mode)
    if mode == "u":
        out_shape = jax.ShapeDtypeStruct((nxy_pad, 6, C, NZp), jnp.float32)
        out_specs = pl.BlockSpec((Bxy, 6, C, NZp), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
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
    fn = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(nxy_pad // Bxy,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
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
        scratch_shapes=[
            pltpu.VMEM((Bxy, 10, C, NZp), jnp.float32),
            pltpu.VMEM((2, Bxy, 10, C, NZp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(60 + 8 * P) * 27 * C * C * nxy_pad * NZp,
            bytes_accessed=(3 * P3 + P + 2 * W3 + 10 * 10 + 6)
            * C * NZp * nxy_pad * 4,
            transcendentals=4 * 27 * C * C * nxy_pad * NZp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    beta_s = jnp.reshape(beta.astype(jnp.float32), (1, 1))
    return fn(beta_s, codes, gam, gprev, wgam, wgprev, feat_p)


def nsc_partner_sweep_u_pallas(feat, codes, gam, gprev, wgam, wgprev,
                               beta, *, phys, walls, grid_dims, C, P,
                               Bxy=1, interpret=False):
    return _call_sweep("u", feat, codes, gam, gprev, wgam, wgprev, beta,
                       phys=phys, walls=walls, grid_dims=grid_dims, C=C,
                       P=P, Bxy=Bxy, interpret=interpret)


def nsc_partner_sweep_g_pallas(featU, codes, gam, gprev, wgam, wgprev,
                               beta, *, phys, walls, grid_dims, C, P,
                               Bxy=1, interpret=False):
    return _call_sweep("g", featU, codes, gam, gprev, wgam, wgprev, beta,
                       phys=phys, walls=walls, grid_dims=grid_dims, C=C,
                       P=P, Bxy=Bxy, interpret=interpret)
