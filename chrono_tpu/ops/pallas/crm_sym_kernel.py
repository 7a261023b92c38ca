"""Symmetric half-stencil CRM (elastoplastic granular SPH) Pallas kernels.

The TPU hot path for CRM terrain (BASELINE config #5): one explicit
elastoplastic substep (chrono_tpu.fsi.sph.crm.crm_step; reference hot loop
/root/reference/src/chrono_fsi/sph/physics/SphForceWCSPH.cu CrmRHS:1396)
as TWO fused symmetric sweeps over the same pencil structure as
sph_sym_kernel — each marker pair evaluated once, partner terms scattered
through the forward-only rolling window:

  M  momentum: stress divergence (with wall stress mirroring), artificial
     viscosity, short-range mixed-pair boundary penalty → velocity kick
     (+ the raw granular acceleration planes, used for the BCE reduction)
  G  velocity gradient (9 channels) + continuity AT THE KICKED velocities
     → Jaumann stress rate + Drucker–Prager radial return + density update
     + position drift, all in the post stage (per-marker, channelwise)

Feature planes (F = 16): pos xyz, vel xyz, rho, tau_d (sxx syy szz),
tau_o (sxy sxz syz), granular flag (FLUID|FROZEN), integrate flag (FLUID),
valid.  Physics matches fsi/sph/crm.py term for term (parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from chrono_tpu.ops.pallas.sph_pencil_kernel import _cubic_dwdr
from chrono_tpu.ops.pallas.sph_sym_kernel import _sym_sweep

(_PX, _PY, _PZ, _VX, _VY, _VZ, _RHO, _SXX, _SYY, _SZZ, _SXY, _SXZ, _SYZ,
 _GRN, _INT, _VAL) = range(16)
F_CRM = 16
# derived per-marker plane appended by the substep drivers: 1/rho^2 for the
# M sweep, 1/rho for the G sweep (computed once per marker, not per pair)
_IR2 = 16


def _with_ir2(feat):
    rho = feat[:, _RHO:_RHO + 1]
    return jnp.concatenate(
        [feat, 1.0 / jnp.maximum(rho * rho, 1e-9)], axis=1)


def _with_irho(feat):
    rho = feat[:, _RHO:_RHO + 1]
    return jnp.concatenate([feat, 1.0 / jnp.maximum(rho, 1e-9)], axis=1)


def _pair_geom(s, n):
    dx = s[_PX] - n[_PX]
    dy = s[_PY] - n[_PY]
    dz = s[_PZ] - n[_PZ]
    r2 = dx * dx + dy * dy + dz * dz
    r = jnp.sqrt(r2 + 1e-12)
    return dx, dy, dz, r2, r


def _crm_phys(cp, with_acc=False):
    """Physics closures shared by the single- and dual-field drivers:
    (pairM, postM, pairG, postG, postF).  All are field-layout-blind."""
    p = dict(cp)
    h = p["h"]; m = p["m"]; dt = p["dt"]; d0 = p["d0"]; c_s = p["c_s"]
    g = (p["gx"], p["gy"], p["gz"])
    k_bc = c_s * c_s / d0
    c_bc = 3.0 * (k_bc / d0) ** 0.5

    SIG = (_SXX, _SYY, _SZZ, _SXY, _SXZ, _SYZ)

    def stress_of(pl):
        return [pl[i] for i in SIG]

    def sig_dot_v(T, gx_, gy_, gz_):
        """(T·gw) for a symmetric 3x3 in 6-channel form."""
        return (T[0] * gx_ + T[3] * gy_ + T[4] * gz_,
                T[3] * gx_ + T[1] * gy_ + T[5] * gz_,
                T[4] * gx_ + T[5] * gy_ + T[2] * gz_)

    # ---- sweep M: momentum (stress divergence + viscosity + penalty) ----
    # per-marker 1/rho^2 rides as a derived plane (index _IR2, appended by
    # the substep drivers) — evaluated once per marker instead of per
    # pair-slot; the two viscosity denominators fold into ONE reciprocal
    def pairM(s, n, ok):
        dx, dy, dz, r2, r = _pair_geom(s, n)
        dwdr = _cubic_dwdr(r, h)
        inv_r = jax.lax.rsqrt(r2 + 1e-12)
        gwx = dwdr * inv_r * dx
        gwy = dwdr * inv_r * dy
        gwz = dwdr * inv_r * dz
        gi, gj = s[_GRN], n[_GRN]
        inv_ri2 = s[_IR2]
        inv_rj2 = n[_IR2]
        si = stress_of(s)
        sj = stress_of(n)
        # wall markers carry no evolved stress: mirror the granular side's
        T = [si[a] * inv_ri2 + (gj * sj[a] + (1 - gj) * si[a]) * inv_rj2
             for a in range(6)]
        Tp = [sj[a] * inv_rj2 + (gi * si[a] + (1 - gi) * sj[a]) * inv_ri2
              for a in range(6)]
        cm = ok * m
        ax, ay, az = sig_dot_v(T, cm * gwx, cm * gwy, cm * gwz)
        bx, by, bz = sig_dot_v(Tp, -cm * gwx, -cm * gwy, -cm * gwz)

        # artificial viscosity (sign-symmetric)
        vx = s[_VX] - n[_VX]
        vy = s[_VY] - n[_VY]
        vz = s[_VZ] - n[_VZ]
        v_dot_r = vx * dx + vy * dy + vz * dz
        rho_avg = 0.5 * (s[_RHO] + n[_RHO])
        invq = 1.0 / ((r2 + 0.01 * h * h) * jnp.maximum(rho_avg, 1e-9))
        Pi = jnp.where(v_dot_r < 0,
                       -p["alpha_visc"] * c_s * h * v_dot_r * invq,
                       0.0)
        cP = cm * Pi
        ax, ay, az = ax - cP * gwx, ay - cP * gwy, az - cP * gwz
        bx, by, bz = bx + cP * gwx, by + cP * gwy, bz + cP * gwz

        # mixed-pair boundary penalty with approach damping
        mixed = gi * (1 - gj) + (1 - gi) * gj
        close = ok * mixed * (r < d0).astype(jnp.float32)
        overlap = close * (d0 - r) / d0
        nhx, nhy, nhz = dx * inv_r, dy * inv_r, dz * inv_r
        vn = vx * nhx + vy * nhy + vz * nhz
        damp = close * (-c_bc) * vn * jnp.where(vn < 0, 1.0, 0.3)
        pen = k_bc * overlap + damp
        ax, ay, az = ax + pen * nhx, ay + pen * nhy, az + pen * nhz
        bx, by, bz = bx - pen * nhx, by - pen * nhy, bz - pen * nhz
        return (ax, ay, az), (bx, by, bz)

    def postF(pls, acc):
        return acc

    def postM(pls, acc):
        it = pls[_INT]
        vx = pls[_VX] + it * dt * (acc[0] + g[0])
        vy = pls[_VY] + it * dt * (acc[1] + g[1])
        vz = pls[_VZ] + it * dt * (acc[2] + g[2])
        if with_acc:
            return (vx, vy, vz, acc[0], acc[1], acc[2])
        return (vx, vy, vz)

    # ---- sweep G: velocity gradient + continuity at kicked velocities ----
    def pairG(s, n, ok):
        dx, dy, dz, r2, r = _pair_geom(s, n)
        dwdr = _cubic_dwdr(r, h)
        inv_r = jax.lax.rsqrt(r2 + 1e-12)
        gwx = dwdr * inv_r * dx
        gwy = dwdr * inv_r * dy
        gwz = dwdr * inv_r * dz
        ux = n[_VX] - s[_VX]          # v_j − v_i
        uy = n[_VY] - s[_VY]
        uz = n[_VZ] - s[_VZ]
        wj = ok * m * n[_IR2]         # derived plane: 1/rho (G-sweep slot)
        wi = ok * m * s[_IR2]
        drho = -ok * m * (ux * gwx + uy * gwy + uz * gwz)
        ts = (wj * ux * gwx, wj * ux * gwy, wj * ux * gwz,
              wj * uy * gwx, wj * uy * gwy, wj * uy * gwz,
              wj * uz * gwx, wj * uz * gwy, wj * uz * gwz,
              drho)
        # swapped pair: two sign flips per gradv term; drho symmetric
        tr = (wi * ux * gwx, wi * ux * gwy, wi * ux * gwz,
              wi * uy * gwx, wi * uy * gwy, wi * uy * gwz,
              wi * uz * gwx, wi * uz * gwy, wi * uz * gwz,
              drho)
        return ts, tr

    def postG(pls, acc):
        (gxx, gxy, gxz, gyx, gyy, gyz, gzx, gzy, gzz, drho) = acc
        it = pls[_INT]
        # strain rate (symmetric) and spin (antisymmetric)
        dxx, dyy, dzz = gxx, gyy, gzz
        dxy = 0.5 * (gxy + gyx)
        dxz = 0.5 * (gxz + gzx)
        dyz = 0.5 * (gyz + gzy)
        w1 = 0.5 * (gxy - gyx)        # W_xy
        w2 = 0.5 * (gxz - gzx)        # W_xz
        w3 = 0.5 * (gyz - gzy)        # W_yz
        trD = dxx + dyy + dzz
        G2 = 2.0 * p["shear_G"]
        K = p["bulk_K"]
        sxx, syy, szz, sxy, sxz, syz = [pls[i] for i in SIG]
        third = trD / 3.0
        # Jaumann: 2G devD + K trD I + (Wσ − σW)
        nxx = sxx + dt * (G2 * (dxx - third) + K * trD
                          + 2.0 * (w1 * sxy + w2 * sxz))
        nyy = syy + dt * (G2 * (dyy - third) + K * trD
                          + 2.0 * (-w1 * sxy + w3 * syz))
        nzz = szz + dt * (G2 * (dzz - third) + K * trD
                          + 2.0 * (-w2 * sxz - w3 * syz))
        nxy = sxy + dt * (G2 * dxy + w1 * (syy - sxx) + w2 * syz
                          + w3 * sxz)
        nxz = sxz + dt * (G2 * dxz + w1 * syz + w2 * (szz - sxx)
                          - w3 * sxy)
        nyz = syz + dt * (G2 * dyz - w1 * sxz - w2 * sxy
                          + w3 * (szz - syy))
        # Drucker–Prager radial return with tension cut-off (channelwise
        # replica of fsi.sph.crm.drucker_prager_return)
        fa = p["friction_angle"]
        den = (9.0 + 3.0 * fa * fa) ** 0.5
        alpha = fa / den
        k_c = 3.0 * p["cohesion"] / den
        p_mean = -(nxx + nyy + nzz) / 3.0
        exx = nxx + p_mean
        eyy = nyy + p_mean
        ezz = nzz + p_mean
        J2 = 0.5 * (exx * exx + eyy * eyy + ezz * ezz) \
            + nxy * nxy + nxz * nxz + nyz * nyz
        sqrtJ2 = jnp.sqrt(J2 + 1e-20)
        p_apex = -k_c / max(alpha, 1e-9)
        p_new = jnp.maximum(p_mean, p_apex)
        scale = jnp.minimum(1.0, (alpha * p_new + k_c) / sqrtJ2)
        oxx = exx * scale - p_new
        oyy = eyy * scale - p_new
        ozz = ezz * scale - p_new
        oxy = nxy * scale
        oxz = nxz * scale
        oyz = nyz * scale
        keep = 1.0 - it
        out_sig = (keep * sxx + it * oxx, keep * syy + it * oyy,
                   keep * szz + it * ozz, keep * sxy + it * oxy,
                   keep * sxz + it * oxz, keep * syz + it * oyz)
        rho = pls[_RHO] + it * dt * drho
        rho = jnp.clip(rho, 0.5 * p["rho0"], 2.0 * p["rho0"])
        rho = jnp.where(pls[_VAL] > 0, rho, pls[_RHO])
        px = pls[_PX] + it * dt * pls[_VX]
        py = pls[_PY] + it * dt * pls[_VY]
        pz = pls[_PZ] + it * dt * pls[_VZ]
        return (px, py, pz, rho) + out_sig

    return pairM, postM, pairG, postG, postF


@functools.partial(jax.jit, static_argnames=(
    "cp", "grid_dims", "C", "Bxy", "interpret", "n_dz", "forces_only",
    "layout", "SZ", "with_acc"))
def crm_substep_sym(feat, edge_fwd, *, cp, grid_dims, C, Bxy=4,
                    interpret=False, n_dz=1, forces_only=False,
                    layout="pencil", SZ=0, with_acc=False):
    """One CRM substep on pencil planes (or, with ``forces_only``, just the
    granular-reaction acceleration planes for the BCE force reduction).

    ``cp``: hashable tuple of static python floats: h (kernel), m, d0, c_s,
    alpha_visc, dt, gx, gy, gz, shear_G, bulk_K, friction_angle, cohesion,
    rho0.  Returns updated (NXY, 16, C, NZp) planes, or (NXY, 3, C, NZp)
    acceleration planes when ``forces_only``; ``with_acc`` returns
    (planes, acc) with the M-sweep granular acceleration (evaluated at the
    pre-substep state) as a free by-product — callers coupling explicitly
    every few substeps can use it for the BCE reduction instead of paying
    a separate ``forces_only`` sweep.

    ``layout``: "pencil" (rows = xy columns, lanes = z) or "flat" (rows = x,
    lanes = y·SZ + z — the small-grid engine, ops.pallas.flatlane_kernel;
    ``edge_fwd`` is unused there and may be None)."""
    pairM, postM, pairG, postG, postF = _crm_phys(cp, with_acc)

    if layout == "flat":
        from chrono_tpu.ops.pallas.flatlane_kernel import sym_sweep_flat

        def SWEEP(ft, *, n_out, n_acc, pair2_fn, post_fn, flops_per_pair):
            return sym_sweep_flat(
                ft, grid_dims=grid_dims, SZ=SZ, C=C, Bxy=Bxy, n_out=n_out,
                n_acc=n_acc, pair2_fn=pair2_fn, post_fn=post_fn,
                interpret=interpret, flops_per_pair=flops_per_pair,
                n_dz=n_dz, val_idx=_VAL)
    elif layout == "pencil":
        def SWEEP(ft, *, n_out, n_acc, pair2_fn, post_fn, flops_per_pair):
            return _sym_sweep(
                ft, edge_fwd, grid_dims=grid_dims, C=C, Bxy=Bxy,
                n_out=n_out, n_acc=n_acc, pair2_fn=pair2_fn,
                post_fn=post_fn, interpret=interpret,
                flops_per_pair=flops_per_pair, n_dz=n_dz, val_idx=_VAL)
    else:
        raise ValueError(f"unknown layout {layout!r}")

    if forces_only:
        return SWEEP(_with_ir2(feat), n_out=3, n_acc=3, pair2_fn=pairM,
                     post_fn=postF, flops_per_pair=90)

    outM = SWEEP(_with_ir2(feat), n_out=6 if with_acc else 3, n_acc=3,
                 pair2_fn=pairM, post_fn=postM, flops_per_pair=90)
    velM, accM = outM[:, 0:3], outM[:, 3:6]

    featG = _with_irho(
        jnp.concatenate([feat[:, 0:3], velM, feat[:, 6:]], axis=1))
    outG = SWEEP(featG, n_out=10, n_acc=10, pair2_fn=pairG, post_fn=postG,
                 flops_per_pair=60)

    out = jnp.concatenate(
        [outG[:, 0:3], velM, outG[:, 3:4], outG[:, 4:10], feat[:, 13:]],
        axis=1)
    if with_acc:
        return out, accM
    return out


@functools.partial(jax.jit, static_argnames=(
    "cp", "grid_dims", "CA", "CB", "Bxy", "interpret", "n_dz",
    "forces_only", "SZ", "with_acc"))
def crm_substep_sym_dual(featA, featB, rowA, rowB, *, cp, grid_dims, SZ,
                         CA, CB, Bxy=1, interpret=False, n_dz=1,
                         forces_only=False, with_acc=False):
    """Two-tier CRM substep on flat-lane planes (ops.pallas.
    flatlane_dual_kernel): field A holds the first CA markers of every
    cell, field B the spill — so the dense pair lattice is sized for the
    TYPICAL cell while spike cells (wheel contact, wall stacks) pay the
    cross sweeps only in their own row blocks.

    Physics identical to :func:`crm_substep_sym` (same closures); returns
    (outA, outB) with the same plane contracts per field.  ``rowA``/
    ``rowB``: (nx,) row occupancy masks (any valid marker)."""
    from chrono_tpu.ops.pallas.flatlane_dual_kernel import (
        sym_sweep_flat_dual,
    )

    pairM, postM, pairG, postG, postF = _crm_phys(cp, with_acc)

    def SWEEP(fA, fB, *, n_out, n_acc, pair2_fn, post_fn, flops_per_pair):
        return sym_sweep_flat_dual(
            fA, fB, grid_dims=grid_dims, SZ=SZ, CA=CA, CB=CB, Bxy=Bxy,
            n_out=n_out, n_acc=n_acc, pair2_fn=pair2_fn, post_fn=post_fn,
            interpret=interpret, flops_per_pair=flops_per_pair,
            n_dz=n_dz, val_idx=_VAL, rowA=rowA, rowB=rowB)

    if forces_only:
        return SWEEP(_with_ir2(featA), _with_ir2(featB), n_out=3, n_acc=3,
                     pair2_fn=pairM, post_fn=postF, flops_per_pair=90)

    outMA, outMB = SWEEP(_with_ir2(featA), _with_ir2(featB),
                         n_out=6 if with_acc else 3,
                         n_acc=3, pair2_fn=pairM, post_fn=postM,
                         flops_per_pair=90)
    velMA, accMA = outMA[:, 0:3], outMA[:, 3:6]
    velMB, accMB = outMB[:, 0:3], outMB[:, 3:6]

    featGA = _with_irho(
        jnp.concatenate([featA[:, 0:3], velMA, featA[:, 6:]], axis=1))
    featGB = _with_irho(
        jnp.concatenate([featB[:, 0:3], velMB, featB[:, 6:]], axis=1))
    outGA, outGB = SWEEP(featGA, featGB, n_out=10, n_acc=10,
                         pair2_fn=pairG, post_fn=postG, flops_per_pair=60)

    outA = jnp.concatenate(
        [outGA[:, 0:3], velMA, outGA[:, 3:4], outGA[:, 4:10],
         featA[:, 13:]], axis=1)
    outB = jnp.concatenate(
        [outGB[:, 0:3], velMB, outGB[:, 3:4], outGB[:, 4:10],
         featB[:, 13:]], axis=1)
    if with_acc:
        return (outA, outB), (accMA, accMB)
    return outA, outB


def crm_static_params(params, crm) -> tuple:
    """Compile-time python-float parameter tuple for the pencil substep."""
    if params.kernel != "cubic":
        raise ValueError("pencil CRM implements the cubic kernel")
    m = float(params.rho0) * float(params.d0) ** 3
    return tuple(sorted(dict(
        h=float(params.h), m=m, d0=float(params.d0),
        c_s=float(params.c_s), alpha_visc=float(params.alpha_visc),
        dt=float(params.dt), rho0=float(params.rho0),
        gx=float(params.gravity[0]), gy=float(params.gravity[1]),
        gz=float(params.gravity[2]),
        shear_G=float(crm.shear_G), bulk_K=float(crm.bulk_K),
        friction_angle=float(crm.friction_angle),
        cohesion=float(crm.cohesion)).items()))
