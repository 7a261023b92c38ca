"""DEM substep on the flat-lane symmetric sweep (v5).

The v4 pencil kernel (dem_sym_kernel) keeps z in the lane dimension padded
to a 128 multiple: a settling bed ~60 cells tall wastes >50% of every lane
tile on air/padding, and the cell size it was tuned at (1.45 diameters,
C=8) leaves the C x C slot lattice ~2.6x underfilled.  v5 attacks both:

  * layout: rows = x, lane = y*SZ + z (ops.pallas.flatlane_kernel) with SZ
    trimmed to the ACTIVE z range of the scene — lane utilization tracks
    the bed height instead of the 128 pad,
  * geometry: bigger cells (host picks ~1.6-1.75 diameters) so the same
    C=8 slot tile carries 2x the real pairs per slot-eval; the worst-case
    occupancy stays under 8 even at crystal close packing for cell sizes
    up to ~1.77 d (sqrt(2)*1.77^3 < 8), enforced by the binning overflow
    counter.

Physics is the v4 pair force verbatim (Hertz(-Mindlin) normal + single-step
Coulomb friction; reference hot loop
/root/reference/src/chrono_dem/gpu/ChDemSMC.cuh:629-696) expressed through
the layout-blind pair2/post callback contract, so it is parity-tested
against both the XLA 27-roll backend and the v4 kernel.  The fused tail
(static plane walls + semi-implicit Euler) matches dem_sym_kernel's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from chrono_tpu.ops.pallas.flatlane_kernel import sym_sweep_flat

_PX, _PY, _PZ, _VX, _VY, _VZ, _WX, _WY, _WZ, _MASK = range(10)
F_FEAT = 10


def _make_pair2(radius, kn, gn, kt, gt, mu, dt, friction):
    """pair2_fn: force/torque on self (ts) and the Newton-third-law
    reaction on the neighbor (tr).  Math identical to
    dem_sym_kernel._make_sym_kernel.pair_phys."""

    def pair2(s, n, ok):
        dx = n[_PX] - s[_PX]
        dy = n[_PY] - s[_PY]
        dzz = n[_PZ] - s[_PZ]
        dist2 = dx * dx + dy * dy + dzz * dzz
        inv = jax.lax.rsqrt(dist2 + 1e-18)
        dist = dist2 * inv
        nxh = dx * inv
        nyh = dy * inv
        nzh = dzz * inv
        overlap = 2.0 * radius - dist
        ok = ok * (overlap > 0.0).astype(jnp.float32)
        delta = jnp.maximum(overlap, 0.0)
        sq = jnp.sqrt(delta)
        q4 = jnp.sqrt(sq)
        arm = radius - 0.5 * delta

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
            coef = kt * sq * dt + gt * q4
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
        ptx = arm * (nyh * pfz - nzh * pfy)
        pty = arm * (nzh * pfx - nxh * pfz)
        ptz = arm * (nxh * pfy - nyh * pfx)
        # self: +F, +tau.  neighbor reaction: -F, +tau (equal radii).
        return ((pfx, pfy, pfz, ptx, pty, ptz),
                (-pfx, -pfy, -pfz, ptx, pty, ptz))

    return pair2


def _make_post(radius, kn, gn, kt, gt, mu, dt, friction, walls, wall_coefs,
               gravity, inv_m, inv_I):
    """post_fn: static plane walls + semi-implicit Euler (v4 fused tail)."""

    def post(pls, acc):
        fx, fy, fz, tx, ty, tz = acc
        px, py, pz = pls[_PX], pls[_PY], pls[_PZ]
        vx0, vy0, vz0 = pls[_VX], pls[_VY], pls[_VZ]
        wx0, wy0, wz0 = pls[_WX], pls[_WY], pls[_WZ]
        mask = pls[_MASK]
        knw, gnw, ktw, gtw, muw = wall_coefs
        for nw, off, vw in walls:
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

        gx, gy, gz = gravity
        vx1 = vx0 + dt * (fx * inv_m + gx) * mask
        vy1 = vy0 + dt * (fy * inv_m + gy) * mask
        vz1 = vz0 + dt * (fz * inv_m + gz) * mask
        return (px + dt * vx1 * mask,
                py + dt * vy1 * mask,
                pz + dt * vz1 * mask,
                vx1, vy1, vz1,
                wx0 + dt * tx * inv_I * mask,
                wy0 + dt * ty * inv_I * mask,
                wz0 + dt * tz * inv_I * mask,
                mask)

    return post


@functools.partial(jax.jit, static_argnames=(
    "radius", "kn", "gn", "kt", "gt", "mu", "dt", "friction",
    "grid_dims", "SZ", "C", "Bxy", "interpret", "walls", "wall_coefs",
    "gravity", "inv_m", "inv_I"))
def dem_flat_substep_pallas(feat, *, radius, kn, gn, kt=0.0, gt=0.0,
                            mu=0.0, dt=0.0, friction=False, grid_dims,
                            SZ, C, Bxy=8, interpret=False, walls=(),
                            wall_coefs=(), gravity=(0, 0, 0), inv_m=1.0,
                            inv_I=1.0, active=None):
    """One whole DEM substep on flat-lane planes.

    ``feat``: (nx, 10, C, NL) with lane = y*SZ + z (see
    cell_dense.field_to_flat); returns updated planes of the same shape.
    """
    pair2 = _make_pair2(float(radius), float(kn), float(gn), float(kt),
                        float(gt), float(mu), float(dt), bool(friction))
    post = _make_post(float(radius), float(kn), float(gn), float(kt),
                      float(gt), float(mu), float(dt), bool(friction),
                      walls, wall_coefs, gravity, float(inv_m),
                      float(inv_I))
    flops = 95 if friction else 70
    return sym_sweep_flat(
        feat, grid_dims=grid_dims, SZ=SZ, C=C, Bxy=Bxy, n_out=F_FEAT,
        n_acc=6, pair2_fn=pair2, post_fn=post, interpret=interpret,
        flops_per_pair=flops, n_dz=1, val_idx=_MASK, active=active)
