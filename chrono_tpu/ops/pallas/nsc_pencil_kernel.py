"""Pallas TPU kernels for the NSC/DVI many-body solve (pencil layout).

TPU-native redesign of the reference's iterative cone-complementarity stack
(/root/reference/src/chrono/solver/ChSolverAPGD.cpp:30 APGD loop,
ChSolverPSOR.cpp projected relaxation, ChSystemDescriptor.cpp:519
SchurComplementProduct, ChConstraintContactNormal.cpp:47 cone projection;
parallel assembly role: chrono_multicore ChIterativeSolverMulticoreNSC.cpp:22).

The reference stores one multiplier triple per detected contact and walks
constraint objects to form ``N·γ = D M⁻¹ Dᵀ γ``.  On TPU every gather/scatter
of that walk is poison, so the whole VI is restated on the DEM pencil lattice
(see dem_pencil_kernel):

* Bodies (uniform spheres) live in dense cell slots ``feat (NXY, F, C, NZp)``.
* Multipliers live in a dense PAIR lattice ``gam (NXY, 27·3·C, C, NZp)``:
  entry ``[c, (k27·3+comp)·C + a, b, z]`` is the (γ_n, γ_u, γ_v) triple of the
  contact between slot ``a`` of cell (c, z) and slot ``b`` of the cell at
  27-offset ``k27`` — every pair is stored TWICE (once from each side); the
  update expressions below are arranged so both copies stay **bitwise equal**
  (negation and multiplication by exact negations are exact in fp32, and all
  dot products sum components in the same order).
* Contact geometry (normal, gap, tangent basis) is frozen during one DVI step
  and **recomputed from positions inside every sweep** — trading cheap VPU
  flops for lattice memory traffic, which is the actual bottleneck.
* One solver iteration = two neighbor sweeps with zero gathers:
    sweep U:  u(y) = u_free + M⁻¹ Dᵀ y           (y = γ + β(γ − γ_prev))
    sweep G:  g = D u − b;  γ⁺ = Π_cone(y − s·g)  (per-cone diagonal scaling)
  which is Nesterov-accelerated projected gradient (the APGD recurrence) with
  a per-cone Jacobi preconditioner ``s = ω / diag_t(N)``.

Walls (static planes + spinning cylinder drums) are compile-time constants
like the DEM kernel's fused walls; their multipliers live in a small per-slot
lattice ``wgam (NXY, W·3, C, NZp)``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# feature planes: positions, then velocity slots (u_free for sweep U, the
# current iterate u for sweep G), then angular-velocity slots, then mask
_PX, _PY, _PZ, _VX, _VY, _VZ, _WX, _WY, _WZ, _MASK = range(10)
F_FEAT = 10

_XY_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


# --------------------------------------------------------------------------
# shared per-pair math (used by the Pallas kernels AND the XLA-dense
# reference backend — all elementwise, shape-agnostic)
# --------------------------------------------------------------------------

def pair_geometry(spx, spy, spz, npx, npy, npz, radius):
    """Normal (self→nbr), signed gap, lever arm, tangent basis.

    The tangent basis is branch-free and maps exactly under side swap:
    t1(−n) = −t1(n), t2(−n) = t2(n).
    """
    dx = npx - spx
    dy = npy - spy
    dz = npz - spz
    d2 = dx * dx + dy * dy + dz * dz
    inv = jax.lax.rsqrt(d2 + 1e-18)
    dist = d2 * inv
    nx = dx * inv
    ny = dy * inv
    nz = dz * inv
    gap = dist - 2.0 * radius
    arm = radius + 0.5 * jnp.minimum(gap, 0.0)
    # axis least aligned with n (same choice for ±n)
    use_x = (jnp.abs(nx) < 0.9).astype(nx.dtype)
    # t1 = normalize(n × a); a = ex or ey
    t1x = use_x * 0.0 + (1.0 - use_x) * (-nz)
    t1y = use_x * nz
    t1z = use_x * (-ny) + (1.0 - use_x) * nx
    tn = jax.lax.rsqrt(t1x * t1x + t1y * t1y + t1z * t1z + 1e-18)
    t1x = t1x * tn
    t1y = t1y * tn
    t1z = t1z * tn
    # t2 = n × t1
    t2x = ny * t1z - nz * t1y
    t2y = nz * t1x - nx * t1z
    t2z = nx * t1y - ny * t1x
    return (nx, ny, nz), gap, arm, (t1x, t1y, t1z), (t2x, t2y, t2z)


def contact_rhs(gap, stab_over_h, inv_h, max_recovery):
    """Normal-row rhs b_n: clamped penetration recovery for gap<0, free
    approach up to the gap for gap>0 (reference clamp: ChSystem.cpp:1626)."""
    rec = jnp.minimum(-stab_over_h * gap, max_recovery)
    return jnp.where(gap < 0.0, rec, -inv_h * gap)


def cone_project(gn, gu, gv, mu):
    """Anitescu–Tasora cone projection (same regimes as
    chrono_tpu.solver.projection.project_friction_cone)."""
    t2 = gu * gu + gv * gv
    tnorm = jnp.sqrt(t2 + 1e-18)
    inside = (tnorm <= mu * gn).astype(gn.dtype)
    polar = (mu * tnorm <= -gn).astype(gn.dtype)
    gn_s = jnp.maximum((tnorm * mu + gn) / (mu * mu + 1.0), 0.0)
    scale_t = mu * gn_s / tnorm
    gn_new = inside * gn + (1.0 - inside) * (1.0 - polar) * gn_s
    ts = inside + (1.0 - inside) * (1.0 - polar) * scale_t
    return gn_new, gu * ts, gv * ts


def pair_velocity(nhat, t1, t2, arm, sv, nv, sw, nw):
    """Constraint-space relative velocity (n̂·vr, t1·vr, t2·vr) where
    ``vr = v_nbr − v_self − arm (ω_self + ω_nbr) × n̂`` — exactly
    sign-symmetric under side swap."""
    nx, ny, nz = nhat
    wsx = sw[0] + nw[0]
    wsy = sw[1] + nw[1]
    wsz = sw[2] + nw[2]
    cx = wsy * nz - wsz * ny
    cy = wsz * nx - wsx * nz
    cz = wsx * ny - wsy * nx
    vrx = nv[0] - sv[0] - arm * cx
    vry = nv[1] - sv[1] - arm * cy
    vrz = nv[2] - sv[2] - arm * cz
    gn = vrx * nx + vry * ny + vrz * nz
    gu = vrx * t1[0] + vry * t1[1] + vrz * t1[2]
    gv = vrx * t2[0] + vry * t2[1] + vrz * t2[2]
    return gn, gu, gv


def wall_geometry(wall, px, py, pz, radius, cs=None):
    """Wall contact geometry: normal (self→wall), gap, surface velocity at
    the contact point.  ``wall`` is a compile-time tuple:
      ("plane", (nx,ny,nz), offset, (vx,vy,vz), mu)
      ("cyl", axis (0|1|2), (cx,cy,cz), R, spin, mu)   — inner surface
      ("rotbox", axis (0|1|2), (cx,cy,cz), (ha,hb,hc), spin, mu)
        — a box obstacle (the reference mixer's blade,
        /root/reference/src/tests/benchmark_tests/physics/
        btest_CH_mixerNSC.cpp:100-108) rotating about the world ``axis``
        through its center at constant ``spin``; half-extents (ha, hb)
        in the rotating plane, hc along the axis.  The pose angle is
        TRACED: ``cs = (cos θ, sin θ)`` scalars (the only run-time wall
        state — everything else is compile-time like the other kinds).
        An ideal speed motor makes the blade motion exactly prescribed,
        so this kinematic treatment is exact for the particle dynamics;
        the motor torque is the contact-impulse sum (wall_reactions).
        A 3-scalar ``cs = (cos θ, sin θ, ω)`` makes the angular VELOCITY
        traced too — the dynamic-blade mode, where ω is a solver variable
        (the revolute joint solved exactly in reduced coordinates, see
        solver.nsc_pencil dynamic_walls).
    """
    kind = wall[0]
    if kind == "rotbox":
        axis, (cx, cy, cz), (ha, hb, hc), spin, _ = (
            wall[1], wall[2], wall[3], wall[4], wall[5])
        if cs is not None and len(cs) == 3:
            cth, sth, spin = cs          # traced angular velocity
        else:
            cth, sth = cs
        dx = px - cx
        dy = py - cy
        dz = pz - cz
        # permute so the rotation axis is the local 3rd component
        if axis == 0:
            a1, a2, a3 = dy, dz, dx
        elif axis == 1:
            a1, a2, a3 = dz, dx, dy
        else:
            a1, a2, a3 = dx, dy, dz
        u = cth * a1 + sth * a2          # blade-frame coords
        v = -sth * a1 + cth * a2
        w = a3
        qu = jnp.abs(u) - ha
        qv = jnp.abs(v) - hb
        qw = jnp.abs(w) - hc
        ou = jnp.maximum(qu, 0.0)
        ov = jnp.maximum(qv, 0.0)
        ow = jnp.maximum(qw, 0.0)
        d_out = jnp.sqrt(ou * ou + ov * ov + ow * ow + 1e-18)
        q_in = jnp.minimum(jnp.maximum(jnp.maximum(qu, qv), qw), 0.0)
        sdf = jnp.where(q_in < 0.0, q_in, d_out)
        # outward normal in the blade frame (branch-free):
        is_out = (q_in >= 0.0).astype(px.dtype)
        inv_do = 1.0 / d_out
        no_u = jnp.sign(u) * ou * inv_do
        no_v = jnp.sign(v) * ov * inv_do
        no_w = jnp.sign(w) * ow * inv_do
        # inside: face of least penetration (max q)
        iu = ((qu >= qv) & (qu >= qw)).astype(px.dtype)
        iv = ((qv > qu) & (qv >= qw)).astype(px.dtype)
        iw = 1.0 - iu - iv
        ni_u = jnp.sign(u) * iu
        ni_v = jnp.sign(v) * iv
        ni_w = jnp.sign(w) * iw
        nl_u = is_out * no_u + (1.0 - is_out) * ni_u
        nl_v = is_out * no_v + (1.0 - is_out) * ni_v
        nl_w = is_out * no_w + (1.0 - is_out) * ni_w
        # back to the permuted world frame; nhat points self → wall = −n_out
        n1 = cth * nl_u - sth * nl_v
        n2 = sth * nl_u + cth * nl_v
        n3 = nl_w
        # surface velocity = spin · axis × (p − c) in permuted coords
        s1 = -spin * a2
        s2 = spin * a1
        s3 = jnp.zeros_like(px)
        if axis == 0:
            nx, ny, nz = n3, n1, n2
            sx, sy, sz = s3, s1, s2
        elif axis == 1:
            nx, ny, nz = n2, n3, n1
            sx, sy, sz = s2, s3, s1
        else:
            nx, ny, nz = n1, n2, n3
            sx, sy, sz = s1, s2, s3
        return (-nx, -ny, -nz), sdf - radius, (sx, sy, sz)
    if kind == "plane":
        (wnx, wny, wnz), off, (vx, vy, vz), _ = wall[1], wall[2], wall[3], \
            wall[4]
        # plane with outward normal w (pointing INTO the domain): the contact
        # normal from particle to wall is −w
        d = wnx * px + wny * py + wnz * pz - off
        gap = d - radius
        nx = jnp.full_like(px, -wnx)
        ny = jnp.full_like(px, -wny)
        nz = jnp.full_like(px, -wnz)
        sx = jnp.full_like(px, vx)
        sy = jnp.full_like(px, vy)
        sz = jnp.full_like(px, vz)
        return (nx, ny, nz), gap, (sx, sy, sz)
    if kind == "cyl":
        axis, (cx, cy, cz), R, spin, _ = wall[1], wall[2], wall[3], wall[4], \
            wall[5]
        rx = px - cx
        ry = py - cy
        rz = pz - cz
        if axis == 0:
            rx = jnp.zeros_like(px)
        elif axis == 1:
            ry = jnp.zeros_like(px)
        else:
            rz = jnp.zeros_like(px)
        d2 = rx * rx + ry * ry + rz * rz
        inv = jax.lax.rsqrt(d2 + 1e-18)
        d = d2 * inv
        nx = rx * inv
        ny = ry * inv
        nz = rz * inv          # radial, particle → wall (outward)
        gap = (R - d) - radius
        # surface velocity = spin · (axis × R n̂)
        if axis == 0:
            sx, sy, sz = jnp.zeros_like(px), spin * R * (-nz), spin * R * ny
        elif axis == 1:
            sx, sy, sz = spin * R * nz, jnp.zeros_like(px), spin * R * (-nx)
        else:
            sx, sy, sz = spin * R * (-ny), spin * R * nx, jnp.zeros_like(px)
        return (nx, ny, nz), gap, (sx, sy, sz)
    raise ValueError(f"unknown wall kind {kind!r}")


# --------------------------------------------------------------------------
# Pallas sweeps
# --------------------------------------------------------------------------

def _k27(k_xy, dz):
    return k_xy * 3 + (dz + 1)


def _make_sweep_u_kernel(C, NZ, Bxy, ny, G, phys, walls):
    """y = γ + β(γ−γ_prev);  u = u_free + M⁻¹ (Dᵀ y)  →  out (Bxy,6,C,NZ)."""
    xy_lin = [dx * ny + dy for (dx, dy) in _XY_OFFSETS]
    radius = phys["radius"]
    inv_m = phys["inv_m"]
    inv_I = phys["inv_I"]
    envelope = phys["envelope"]

    def kernel(edge_ref, beta_ref, gam_ref, gprev_ref, wgam_ref, wgprev_ref,
               feat_ref, out_ref, self_buf, nbuf, self_sem, nsem):
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

        spx = self_buf[:, _PX][:, :, None, :]
        spy = self_buf[:, _PY][:, :, None, :]
        spz = self_buf[:, _PZ][:, :, None, :]
        smask = self_buf[:, _MASK][:, :, None, :]

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
            slab = nbuf[k % 2]
            ok_xy = edge_ref[0, :, k][:, None, None, None]
            for dz in (-1, 0, 1):
                sl = slab if dz == 0 else pltpu.roll(slab, (-dz) % NZ, 3)
                npx = sl[:, _PX][:, None, :, :]
                npy = sl[:, _PY][:, None, :, :]
                npz = sl[:, _PZ][:, None, :, :]
                nmask = sl[:, _MASK][:, None, :, :]

                nhat, gap, arm, t1, t2 = pair_geometry(
                    spx, spy, spz, npx, npy, npz, radius)
                ok = smask * nmask * ok_xy * (gap < envelope).astype(
                    jnp.float32)
                if k == 4 and dz == 0:
                    ok = ok * neq[None]

                r0 = _k27(k, dz) * 3 * C
                gn0 = gam_ref[:, r0:r0 + C]
                gu0 = gam_ref[:, r0 + C:r0 + 2 * C]
                gv0 = gam_ref[:, r0 + 2 * C:r0 + 3 * C]
                yn = gn0 + beta * (gn0 - gprev_ref[:, r0:r0 + C])
                yu = gu0 + beta * (gu0 - gprev_ref[:, r0 + C:r0 + 2 * C])
                yv = gv0 + beta * (gv0 - gprev_ref[:, r0 + 2 * C:r0 + 3 * C])

                pfx = ok * -(yn * nhat[0] + yu * t1[0] + yv * t2[0])
                pfy = ok * -(yn * nhat[1] + yu * t1[1] + yv * t2[1])
                pfz = ok * -(yn * nhat[2] + yu * t1[2] + yv * t2[2])
                fx = fx + jnp.sum(pfx, axis=2)
                fy = fy + jnp.sum(pfy, axis=2)
                fz = fz + jnp.sum(pfz, axis=2)
                # τ = arm (γ_v t1 − γ_u t2)  (equal on both sides of the pair)
                tx = tx + jnp.sum(ok * arm * (yv * t1[0] - yu * t2[0]), axis=2)
                ty = ty + jnp.sum(ok * arm * (yv * t1[1] - yu * t2[1]), axis=2)
                tz = tz + jnp.sum(ok * arm * (yv * t1[2] - yu * t2[2]), axis=2)

        # walls (self-only rows)
        px = self_buf[:, _PX]
        py = self_buf[:, _PY]
        pz = self_buf[:, _PZ]
        mask = self_buf[:, _MASK]
        for w, wall in enumerate(walls):
            nhat, gap, _ = wall_geometry(wall, px, py, pz, radius)
            okw = mask * (gap < envelope).astype(jnp.float32)
            armw = radius + 0.5 * jnp.minimum(gap, 0.0)
            # tangent basis via the same branch-free rule
            nx, nyy, nz = nhat
            use_x = (jnp.abs(nx) < 0.9).astype(nx.dtype)
            t1x = (1.0 - use_x) * (-nz)
            t1y = use_x * nz
            t1z = use_x * (-nyy) + (1.0 - use_x) * nx
            tn = jax.lax.rsqrt(t1x * t1x + t1y * t1y + t1z * t1z + 1e-18)
            t1x, t1y, t1z = t1x * tn, t1y * tn, t1z * tn
            t2x = nyy * t1z - nz * t1y
            t2y = nz * t1x - nx * t1z
            t2z = nx * t1y - nyy * t1x
            r0 = w * 3
            wn0 = wgam_ref[:, r0]
            wu0 = wgam_ref[:, r0 + 1]
            wv0 = wgam_ref[:, r0 + 2]
            yn = wn0 + beta * (wn0 - wgprev_ref[:, r0])
            yu = wu0 + beta * (wu0 - wgprev_ref[:, r0 + 1])
            yv = wv0 + beta * (wv0 - wgprev_ref[:, r0 + 2])
            fx = fx + okw * -(yn * nx + yu * t1x + yv * t2x)
            fy = fy + okw * -(yn * nyy + yu * t1y + yv * t2y)
            fz = fz + okw * -(yn * nz + yu * t1z + yv * t2z)
            tx = tx + okw * armw * (yv * t1x - yu * t2x)
            ty = ty + okw * armw * (yv * t1y - yu * t2y)
            tz = tz + okw * armw * (yv * t1z - yu * t2z)

        m = mask
        out_ref[:, 0] = (self_buf[:, _VX] + inv_m * fx) * m
        out_ref[:, 1] = (self_buf[:, _VY] + inv_m * fy) * m
        out_ref[:, 2] = (self_buf[:, _VZ] + inv_m * fz) * m
        out_ref[:, 3] = (self_buf[:, _WX] + inv_I * tx) * m
        out_ref[:, 4] = (self_buf[:, _WY] + inv_I * ty) * m
        out_ref[:, 5] = (self_buf[:, _WZ] + inv_I * tz) * m

    return kernel


def _make_sweep_g_kernel(C, NZ, Bxy, ny, G, phys, walls):
    """g = D u − b;  γ⁺ = Π(y − s g)  →  new pair + wall lattices.

    featU carries positions in the pos planes and the CURRENT iterate u in
    the velocity planes.  u_free is NOT needed here (b carries the rhs).
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

    def kernel(edge_ref, beta_ref, gam_ref, gprev_ref, wgam_ref, wgprev_ref,
               feat_ref, gout_ref, wout_ref, self_buf, nbuf, self_sem, nsem):
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

        spx = self_buf[:, _PX][:, :, None, :]
        spy = self_buf[:, _PY][:, :, None, :]
        spz = self_buf[:, _PZ][:, :, None, :]
        sv = tuple(self_buf[:, f][:, :, None, :] for f in (_VX, _VY, _VZ))
        sw = tuple(self_buf[:, f][:, :, None, :] for f in (_WX, _WY, _WZ))
        smask = self_buf[:, _MASK][:, :, None, :]

        neq = (jax.lax.broadcasted_iota(jnp.int32, (C, C, NZ), 0)
               != jax.lax.broadcasted_iota(jnp.int32, (C, C, NZ), 1)
               ).astype(jnp.float32)

        for k in range(9):
            if k + 1 < 9:
                nbr_dma((k + 1) % 2, k + 1).start()
            nbr_dma(k % 2, k).wait()
            slab = nbuf[k % 2]
            ok_xy = edge_ref[0, :, k][:, None, None, None]
            for dz in (-1, 0, 1):
                sl = slab if dz == 0 else pltpu.roll(slab, (-dz) % NZ, 3)
                npx = sl[:, _PX][:, None, :, :]
                npy = sl[:, _PY][:, None, :, :]
                npz = sl[:, _PZ][:, None, :, :]
                nv = tuple(sl[:, f][:, None, :, :] for f in (_VX, _VY, _VZ))
                nw = tuple(sl[:, f][:, None, :, :] for f in (_WX, _WY, _WZ))
                nmask = sl[:, _MASK][:, None, :, :]

                nhat, gap, arm, t1, t2 = pair_geometry(
                    spx, spy, spz, npx, npy, npz, radius)
                ok = smask * nmask * ok_xy * (gap < envelope).astype(
                    jnp.float32)
                if k == 4 and dz == 0:
                    ok = ok * neq[None]

                gn_v, gu_v, gv_v = pair_velocity(nhat, t1, t2, arm, sv, nv,
                                                 sw, nw)
                bn = contact_rhs(gap, stab_over_h, inv_h, max_recovery)

                r0 = _k27(k, dz) * 3 * C
                g0n = gam_ref[:, r0:r0 + C]
                g0u = gam_ref[:, r0 + C:r0 + 2 * C]
                g0v = gam_ref[:, r0 + 2 * C:r0 + 3 * C]
                yn = g0n + beta * (g0n - gprev_ref[:, r0:r0 + C])
                yu = g0u + beta * (g0u - gprev_ref[:, r0 + C:r0 + 2 * C])
                yv = g0v + beta * (g0v - gprev_ref[:, r0 + 2 * C:r0 + 3 * C])

                # per-cone diagonal scaling (tangential row diag is largest)
                s = omega / (2.0 * inv_m + 2.0 * arm * arm * inv_I)
                pn, pu, pv = cone_project(
                    yn - s * (gn_v - bn), yu - s * gu_v, yv - s * gv_v, mu)
                gout_ref[:, r0:r0 + C] = ok * pn
                gout_ref[:, r0 + C:r0 + 2 * C] = ok * pu
                gout_ref[:, r0 + 2 * C:r0 + 3 * C] = ok * pv

        # walls
        px = self_buf[:, _PX]
        py = self_buf[:, _PY]
        pz = self_buf[:, _PZ]
        mask = self_buf[:, _MASK]
        v0 = tuple(self_buf[:, f] for f in (_VX, _VY, _VZ))
        w0 = tuple(self_buf[:, f] for f in (_WX, _WY, _WZ))
        for w, wall in enumerate(walls):
            mu_w = wall[4] if wall[0] == "plane" else wall[5]
            nhat, gap, vsurf = wall_geometry(wall, px, py, pz, radius)
            okw = mask * (gap < envelope).astype(jnp.float32)
            armw = radius + 0.5 * jnp.minimum(gap, 0.0)
            nx, nyy, nz = nhat
            use_x = (jnp.abs(nx) < 0.9).astype(nx.dtype)
            t1x = (1.0 - use_x) * (-nz)
            t1y = use_x * nz
            t1z = use_x * (-nyy) + (1.0 - use_x) * nx
            tn = jax.lax.rsqrt(t1x * t1x + t1y * t1y + t1z * t1z + 1e-18)
            t1x, t1y, t1z = t1x * tn, t1y * tn, t1z * tn
            t2x = nyy * t1z - nz * t1y
            t2y = nz * t1x - nx * t1z
            t2z = nx * t1y - nyy * t1x
            gn_v, gu_v, gv_v = pair_velocity(
                (nx, nyy, nz), (t1x, t1y, t1z), (t2x, t2y, t2z), armw,
                v0, vsurf, w0, (jnp.zeros_like(px),) * 3)
            bn = contact_rhs(gap, stab_over_h, inv_h, max_recovery)
            r0 = w * 3
            wn0 = wgam_ref[:, r0]
            wu0 = wgam_ref[:, r0 + 1]
            wv0 = wgam_ref[:, r0 + 2]
            yn = wn0 + beta * (wn0 - wgprev_ref[:, r0])
            yu = wu0 + beta * (wu0 - wgprev_ref[:, r0 + 1])
            yv = wv0 + beta * (wv0 - wgprev_ref[:, r0 + 2])
            s = omega / (inv_m + armw * armw * inv_I)
            pn, pu, pv = cone_project(
                yn - s * (gn_v - bn), yu - s * gu_v, yv - s * gv_v, mu_w)
            wout_ref[:, r0] = okw * pn
            wout_ref[:, r0 + 1] = okw * pu
            wout_ref[:, r0 + 2] = okw * pv

    return kernel


def _pad_feat(feat, G, nxy, nxy_pad):
    F = feat.shape[1]
    C = feat.shape[2]
    NZp = feat.shape[3]
    pad_lo = jnp.zeros((G, F, C, NZp), jnp.float32)
    pad_hi = jnp.zeros((G + nxy_pad - nxy, F, C, NZp), jnp.float32)
    return jnp.concatenate([pad_lo, feat, pad_hi], axis=0)


def _pad_edge(edge_ok, nxy, nxy_pad, Bxy):
    return jnp.concatenate(
        [edge_ok, jnp.zeros((9, nxy_pad - nxy), jnp.float32)],
        axis=1).T.reshape(nxy_pad // Bxy, Bxy, 9)


@functools.partial(jax.jit, static_argnames=(
    "phys", "walls", "grid_dims", "C", "Bxy", "interpret"))
def nsc_sweep_u_pallas(feat, edge_ok, gam, gprev, wgam, wgprev, beta, *,
                       phys, walls, grid_dims, C, Bxy=1, interpret=False):
    """u(y) planes (NXY, 6, C, NZp) from the multiplier lattices."""
    nx, ny, nz = grid_dims
    nxy = nx * ny
    NZp = feat.shape[3]
    if NZp % 128 or nz > NZp - 1:
        raise ValueError(f"NZp={NZp} must be a 128-multiple > nz={nz}")
    G = ny + 1
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    feat_p = _pad_feat(feat, G, nxy, nxy_pad)
    edge_p = _pad_edge(edge_ok, nxy, nxy_pad, Bxy)
    # multiplier lattices are allocated at nxy_pad once by the driver and
    # ping-ponged across iterations — re-padding here would copy the largest
    # arrays in the whole solve every sweep
    if gam.shape[0] != nxy_pad:
        raise ValueError(f"gam rows {gam.shape[0]} != nxy_pad {nxy_pad}")
    gam_p, gprev_p, wgam_p, wgprev_p = gam, gprev, wgam, wgprev
    W3 = wgam.shape[1]

    kernel = _make_sweep_u_kernel(C, NZp, Bxy, ny, G, dict(phys), walls)
    lat = 3 * 27 * C
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nxy_pad, 6, C, NZp), jnp.float32),
        grid=(nxy_pad // Bxy,),
        in_specs=[
            pl.BlockSpec((1, Bxy, 9), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Bxy, lat, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, lat, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, W3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, W3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Bxy, 6, C, NZp), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Bxy, F_FEAT, C, NZp), jnp.float32),
            pltpu.VMEM((2, Bxy, F_FEAT, C, NZp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=120 * 27 * C * C * nxy_pad * NZp,
            bytes_accessed=(2 * lat + 2 * W3 + 10 * 10 + 6) * C * NZp
            * nxy_pad * 4,
            transcendentals=4 * 27 * C * C * nxy_pad * NZp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(edge_p, beta.reshape(1, 1), gam_p, gprev_p, wgam_p, wgprev_p, feat_p)
    return out[:nxy]


@functools.partial(jax.jit, static_argnames=(
    "phys", "walls", "grid_dims", "C", "Bxy", "interpret"))
def nsc_sweep_g_pallas(featU, edge_ok, gam, gprev, wgam, wgprev, beta, *,
                       phys, walls, grid_dims, C, Bxy=1, interpret=False):
    """Projected-gradient update → (gam⁺ (NXY,81C,C,NZp), wgam⁺)."""
    nx, ny, nz = grid_dims
    nxy = nx * ny
    NZp = featU.shape[3]
    G = ny + 1
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    feat_p = _pad_feat(featU, G, nxy, nxy_pad)
    edge_p = _pad_edge(edge_ok, nxy, nxy_pad, Bxy)
    if gam.shape[0] != nxy_pad:
        raise ValueError(f"gam rows {gam.shape[0]} != nxy_pad {nxy_pad}")
    gam_p, gprev_p, wgam_p, wgprev_p = gam, gprev, wgam, wgprev
    W3 = wgam.shape[1]

    kernel = _make_sweep_g_kernel(C, NZp, Bxy, ny, G, dict(phys), walls)
    lat = 3 * 27 * C
    gout, wout = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nxy_pad, lat, C, NZp), jnp.float32),
            jax.ShapeDtypeStruct((nxy_pad, W3, C, NZp), jnp.float32),
        ),
        grid=(nxy_pad // Bxy,),
        in_specs=[
            pl.BlockSpec((1, Bxy, 9), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Bxy, lat, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, lat, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, W3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, W3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((Bxy, lat, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bxy, W3, C, NZp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bxy, F_FEAT, C, NZp), jnp.float32),
            pltpu.VMEM((2, Bxy, F_FEAT, C, NZp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=160 * 27 * C * C * nxy_pad * NZp,
            bytes_accessed=(3 * lat + 3 * W3 + 10 * 10) * C * NZp
            * nxy_pad * 4,
            transcendentals=6 * 27 * C * C * nxy_pad * NZp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(edge_p, beta.reshape(1, 1), gam_p, gprev_p, wgam_p, wgprev_p, feat_p)
    return gout, wout    # padded to nxy_pad (ping-pong without re-padding)
