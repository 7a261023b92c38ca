"""Pallas TPU WCSPH kernels, pencil layout — the SPH analogue of
dem_pencil_kernel.

One symplectic WCSPH substep (chrono_tpu.fsi.sph.system.sph_substep,
"symplectic" scheme; reference hot loop /root/reference/src/chrono_fsi/sph/
physics/SphForceWCSPH.cu: CfdAdamiBC :723, CfdRHS :1640, Calc_Shifting
:1875) decomposes into four neighbor sweeps, each one `pallas_call` over the
same pencil structure as the DEM kernel (markers binned into (C, NZp) cell
slots per xy pencil; 9 leading-dim DMA fetches; dz = ±1 by in-register lane
rotation):

  A  Adami wall BC: extrapolate pressure + no-slip ghost velocity onto
     solid markers                                  feat9  → [p, v_bc(3)]
  B  momentum RHS (pressure gradient + artificial/laminar viscosity) and
     velocity kick                                  feat13 → v⁺(3)
  C  continuity (+ δ-SPH diffusion) AT THE KICKED velocities, density
     update + clip                                  feat9  → ρ⁺(1)
  D  XSPH transport velocity and position drift     feat9  → x⁺(3)

Physics matches fsi/sph/wcsph.py term for term (same kernels, same epsilon
regularizations); parity is tested in tests/test_sph_pencil.py.  Fixed
boundaries only (body_acc = 0); non-periodic boxes.

Feature-plane layout (F = 9): pos xyz, vel xyz, rho, is_fluid, valid.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PX, _PY, _PZ, _VX, _VY, _VZ, _RHO, _FLU, _VAL = range(9)
F_FEAT = 9

_XY_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _cubic_w(r, h):
    sigma = 1.0 / (np.pi * h**3)
    q = r / h
    w1 = 1.0 - 1.5 * q * q + 0.75 * q**3
    w2 = 0.25 * (2.0 - q) ** 3
    return sigma * jnp.where(q < 1.0, w1, jnp.where(q < 2.0, w2, 0.0))


def _cubic_dwdr(r, h):
    sigma = 1.0 / (np.pi * h**3)
    q = r / h
    d1 = -3.0 * q + 2.25 * q * q
    d2 = -0.75 * (2.0 - q) ** 2
    return sigma / h * jnp.where(q < 1.0, d1, jnp.where(q < 2.0, d2, 0.0))


def _tait_p(rho, rho0, c_s, gamma):
    B = c_s * c_s * rho0 / gamma
    return B * ((rho / rho0) ** gamma - 1.0)


def _tait_rho(p, rho0, c_s, gamma):
    B = c_s * c_s * rho0 / gamma
    return rho0 * jnp.maximum(1.0 + p / B, 0.1) ** (1.0 / gamma)


def _make_sweep_kernel(F_in, n_out, C, NZ, Bxy, ny, G, pair_fn, post_fn,
                       n_dz=1):
    """Shared pencil-sweep scaffolding.

    The self-slot axis is processed in chunks of CS = 8 (one sublane tile):
    pair temporaries are (Bxy, 8, C, NZ) instead of (Bxy, C, C, NZ), which
    keeps VMEM pressure flat as C grows (SPH cells hold up to 32 markers —
    wall cells stack 3 BCE layers plus fluid — vs DEM's 8).

    pair_fn(s: F_in planes (Bxy,CS,1,NZ), n: F_in planes (Bxy,1,C,NZ),
            ok: base pair mask, acc: tuple of (Bxy,CS,NZ)) -> acc
    post_fn(self planes (Bxy,C,NZ) list, acc of (Bxy,C,NZ)) -> n_out planes
    """
    xy_lin = [dx * ny + dy for (dx, dy) in _XY_OFFSETS]
    CS = min(8, C)
    n_chunks = (C + CS - 1) // CS
    assert C % CS == 0

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

        s_chunks = [
            [self_buf[:, f, c * CS:(c + 1) * CS][:, :, None, :]
             for f in range(F_in)]
            for c in range(n_chunks)]
        accs = [tuple(jnp.zeros((Bxy, CS, NZ), jnp.float32)
                      for _ in range(pair_fn.n_acc))
                for _ in range(n_chunks)]
        neqs = [
            (jax.lax.broadcasted_iota(jnp.int32, (CS, C, NZ), 0) + c * CS
             != jax.lax.broadcasted_iota(jnp.int32, (CS, C, NZ), 1)
             ).astype(jnp.float32)
            for c in range(n_chunks)]

        for k in range(9):
            if k + 1 < 9:
                nbr_dma((k + 1) % 2, k + 1).start()
            nbr_dma(k % 2, k).wait()
            slab = nbuf[k % 2]
            ok_xy = edge_ref[0, :, k][:, None, None, None]
            for dz in range(-n_dz, n_dz + 1):
                sl = slab if dz == 0 else pltpu.roll(slab, (-dz) % NZ, 3)
                n = [sl[:, f][:, None, :, :] for f in range(F_in)]
                for c in range(n_chunks):
                    s = s_chunks[c]
                    ok = s[_VAL] * n[_VAL] * ok_xy
                    if k == 4 and dz == 0:
                        ok = ok * neqs[c][None]
                    accs[c] = pair_fn(s, n, ok, accs[c])

        acc = tuple(jnp.concatenate([accs[c][a] for c in range(n_chunks)],
                                    axis=1)
                    for a in range(pair_fn.n_acc))
        planes = [self_buf[:, f] for f in range(F_in)]
        outs = post_fn(planes, acc)
        for f in range(n_out):
            out_ref[:, f] = outs[f]

    return kernel


def _pencil_sweep(feat, edge_ok, *, grid_dims, C, Bxy, n_out, pair_fn,
                  post_fn, interpret=False, flops_per_pair=40, n_dz=1):
    nx, ny, nz = grid_dims
    nxy = nx * ny
    F_in = feat.shape[1]
    NZp = feat.shape[3]
    if NZp % 128 or nz > NZp - n_dz:
        raise ValueError(f"NZp={NZp} must be a 128-multiple ≥ nz+{n_dz}")
    G = ny + 1
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    pad_lo = jnp.zeros((G, F_in, C, NZp), jnp.float32)
    pad_hi = jnp.zeros((G + nxy_pad - nxy, F_in, C, NZp), jnp.float32)
    feat_p = jnp.concatenate([pad_lo, feat, pad_hi], axis=0)
    # (n_blocks, Bxy, 9): per-block edge slabs — block shape (1, Bxy, 9)
    # is alignment-legal for ANY Bxy (trailing dims equal the array dims)
    edge_p = jnp.concatenate(
        [edge_ok, jnp.zeros((9, nxy_pad - nxy), jnp.float32)],
        axis=1).T.reshape(nxy_pad // Bxy, Bxy, 9)

    kernel = _make_sweep_kernel(F_in, n_out, C, NZp, Bxy, ny, G,
                                pair_fn, post_fn, n_dz=n_dz)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nxy_pad, n_out, C, NZp),
                                       jnp.float32),
        grid=(nxy_pad // Bxy,),
        in_specs=[
            pl.BlockSpec((1, Bxy, 9), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Bxy, n_out, C, NZp),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Bxy, F_in, C, NZp), jnp.float32),
            pltpu.VMEM((2, Bxy, F_in, C, NZp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * 9 * (2 * n_dz + 1) * C * C * nxy_pad
            * NZp,
            bytes_accessed=(9 + 1) * F_in * C * NZp * nxy_pad * 4
            + n_out * C * NZp * nxy_pad * 4,
            transcendentals=3 * 9 * (2 * n_dz + 1) * C * C * nxy_pad * NZp,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(edge_p, feat_p)
    return out[:nxy]


def _pair_geom(s, n, h):
    dx = s[_PX] - n[_PX]          # d = x_i − x_j (i = self), matches wcsph
    dy = s[_PY] - n[_PY]
    dz = s[_PZ] - n[_PZ]
    r2 = dx * dx + dy * dy + dz * dz
    r = jnp.sqrt(r2 + 1e-12)
    return dx, dy, dz, r2, r


@functools.partial(jax.jit, static_argnames=(
    "sp", "grid_dims", "C", "Bxy", "interpret", "n_dz"))
def sph_substep_pencil(feat, edge_ok, *, sp, grid_dims, C, Bxy=4,
                       interpret=False, n_dz=1):
    """One symplectic WCSPH substep on pencil planes.

    ``sp``: hashable dict-like (tuple of pairs) of static python-float
    parameters: h, m, rho0, c_s, gamma, delta_sph, alpha_visc, mu, xsph_eps,
    dt, gx, gy, gz, viscosity ("artificial"|"laminar").
    Returns the updated (NXY, 9, C, NZp) planes.
    """
    p = dict(sp)
    h = p["h"]; m = p["m"]; rho0 = p["rho0"]; c_s = p["c_s"]
    gamma = p["gamma"]; dt = p["dt"]
    g = (p["gx"], p["gy"], p["gz"])

    # ---- sweep A: Adami BC ----
    def pairA(s, n, ok, acc):
        dx, dy, dz, r2, r = _pair_geom(s, n, h)
        Wij = _cubic_w(r, h)
        Wf = ok * n[_FLU] * Wij
        p_j = _tait_p(n[_RHO], rho0, c_s, gamma)
        # hydro = (−acc_w)·d·ρ_j with acc_w = −g (fixed walls)
        hydro = (g[0] * dx + g[1] * dy + g[2] * dz) * n[_RHO]
        return (acc[0] + jnp.sum(Wf * (p_j + hydro), axis=2),
                acc[1] + jnp.sum(Wf * n[_VX], axis=2),
                acc[2] + jnp.sum(Wf * n[_VY], axis=2),
                acc[3] + jnp.sum(Wf * n[_VZ], axis=2),
                acc[4] + jnp.sum(Wf, axis=2))
    pairA.n_acc = 5

    def postA(pls, acc):
        swp, swx, swy, swz, sw = acc
        has = (sw > 1e-12).astype(jnp.float32)
        den = jnp.maximum(sw, 1e-12)
        p_solid = has * swp / den
        flu = pls[_FLU]
        p_own = _tait_p(pls[_RHO], rho0, c_s, gamma)
        p_all = flu * p_own + (1.0 - flu) * p_solid
        vbx = 2.0 * pls[_VX] - swx / den
        vby = 2.0 * pls[_VY] - swy / den
        vbz = 2.0 * pls[_VZ] - swz / den
        vbx = has * vbx + (1.0 - has) * pls[_VX]
        vby = has * vby + (1.0 - has) * pls[_VY]
        vbz = has * vbz + (1.0 - has) * pls[_VZ]
        return (p_all,
                flu * pls[_VX] + (1.0 - flu) * vbx,
                flu * pls[_VY] + (1.0 - flu) * vby,
                flu * pls[_VZ] + (1.0 - flu) * vbz)

    outA = _pencil_sweep(feat, edge_ok, grid_dims=grid_dims, C=C, Bxy=Bxy,
                         n_out=4, pair_fn=pairA, post_fn=postA,
                         interpret=interpret, n_dz=n_dz)

    # ---- sweep B: momentum + kick ----
    _P, _VBX, _VBY, _VBZ = 9, 10, 11, 12
    featB = jnp.concatenate([feat, outA], axis=1)

    def rho_all_of(pn):
        return pn[_FLU] * pn[_RHO] + (1.0 - pn[_FLU]) * _tait_rho(
            pn[_P], rho0, c_s, gamma)

    def pairB(s, n, ok, acc):
        dx, dy, dz, r2, r = _pair_geom(s, n, h)
        dwdr = _cubic_dwdr(r, h)
        inv_r = 1.0 / jnp.maximum(r, 1e-12)
        gwx = dwdr * inv_r * dx
        gwy = dwdr * inv_r * dy
        gwz = dwdr * inv_r * dz
        rho_i = rho_all_of(s)
        rho_j = rho_all_of(n)
        # viscous velocity: ghost velocity for solid neighbors
        vjx = n[_FLU] * n[_VX] + (1.0 - n[_FLU]) * n[_VBX]
        vjy = n[_FLU] * n[_VY] + (1.0 - n[_FLU]) * n[_VBY]
        vjz = n[_FLU] * n[_VZ] + (1.0 - n[_FLU]) * n[_VBZ]
        vx = s[_VX] - vjx
        vy = s[_VY] - vjy
        vz = s[_VZ] - vjz
        pterm = s[_P] / (rho_i * rho_i) + n[_P] / (rho_j * rho_j)
        coef_p = ok * m * pterm
        ax = -coef_p * gwx
        ay = -coef_p * gwy
        az = -coef_p * gwz
        if p["viscosity"] == "laminar":
            cl = ok * m * 2.0 * p["mu"] / (rho_i * rho_j) \
                * (dx * gwx + dy * gwy + dz * gwz) / (r2 + 0.01 * h * h)
            ax = ax + cl * vx
            ay = ay + cl * vy
            az = az + cl * vz
        else:
            v_dot_r = vx * dx + vy * dy + vz * dz
            mu_ij = h * v_dot_r / (r2 + 0.01 * h * h)
            Pi = jnp.where(v_dot_r < 0,
                           -p["alpha_visc"] * c_s * mu_ij
                           / (0.5 * (rho_i + rho_j)), 0.0)
            cP = ok * m * Pi
            ax = ax - cP * gwx
            ay = ay - cP * gwy
            az = az - cP * gwz
        return (acc[0] + jnp.sum(ax, axis=2),
                acc[1] + jnp.sum(ay, axis=2),
                acc[2] + jnp.sum(az, axis=2))
    pairB.n_acc = 3

    def postB(pls, acc):
        flu = pls[_FLU]
        vx = pls[_VX] + flu * dt * (acc[0] + g[0])
        vy = pls[_VY] + flu * dt * (acc[1] + g[1])
        vz = pls[_VZ] + flu * dt * (acc[2] + g[2])
        return (vx, vy, vz)

    velB = _pencil_sweep(featB, edge_ok, grid_dims=grid_dims, C=C, Bxy=Bxy,
                         n_out=3, pair_fn=pairB, post_fn=postB,
                         interpret=interpret, flops_per_pair=60, n_dz=n_dz)

    featC = jnp.concatenate(
        [feat[:, 0:3], velB, feat[:, 6:9]], axis=1)

    # ---- sweep C: continuity at kicked velocities ----
    def pairC(s, n, ok, acc):
        dx, dy, dz, r2, r = _pair_geom(s, n, h)
        dwdr = _cubic_dwdr(r, h)
        inv_r = 1.0 / jnp.maximum(r, 1e-12)
        gwx = dwdr * inv_r * dx
        gwy = dwdr * inv_r * dy
        gwz = dwdr * inv_r * dz
        vdotg = ((s[_VX] - n[_VX]) * gwx + (s[_VY] - n[_VY]) * gwy
                 + (s[_VZ] - n[_VZ]) * gwz)
        drho = jnp.sum(ok * m * vdotg, axis=2)
        psi = 2.0 * (n[_RHO] - s[_RHO]) * (
            -(dx * gwx + dy * gwy + dz * gwz)) / (r2 + 1e-12)
        okff = ok * s[_FLU] * n[_FLU]
        # safe denominator: empty slots carry rho = 0 and inf·(mask 0) = NaN
        diff = jnp.sum(okff * m / jnp.maximum(n[_RHO], 1e-9) * psi, axis=2)
        return (acc[0] + drho + p["delta_sph"] * h * c_s * diff,)
    pairC.n_acc = 1

    def postC(pls, acc):
        rho = pls[_RHO] + pls[_FLU] * dt * acc[0]
        return (jnp.clip(rho, 0.7 * rho0, 1.5 * rho0),)

    rhoC = _pencil_sweep(featC, edge_ok, grid_dims=grid_dims, C=C, Bxy=Bxy,
                         n_out=1, pair_fn=pairC, post_fn=postC,
                         interpret=interpret, n_dz=n_dz)

    # XSPH weight at ρⁿ — the reference's single-force-pass time level
    # (SphForceWCSPH.cu); matches the gather backend and the fused CD sweep
    # of sph_sym_kernel.
    featD = jnp.concatenate(
        [feat[:, 0:3], velB, feat[:, 6:7], feat[:, 7:9]], axis=1)

    # ---- sweep D: XSPH transport + drift ----
    def pairD(s, n, ok, acc):
        dx, dy, dz, r2, r = _pair_geom(s, n, h)
        Wij = _cubic_w(r, h)
        okff = ok * s[_FLU] * n[_FLU]
        rho_avg = jnp.maximum(0.5 * (s[_RHO] + n[_RHO]), 1e-9)
        c = okff * m / rho_avg * Wij
        return (acc[0] + jnp.sum(c * (n[_VX] - s[_VX]), axis=2),
                acc[1] + jnp.sum(c * (n[_VY] - s[_VY]), axis=2),
                acc[2] + jnp.sum(c * (n[_VZ] - s[_VZ]), axis=2))
    pairD.n_acc = 3

    def postD(pls, acc):
        flu = pls[_FLU]
        vtx = pls[_VX] + p["xsph_eps"] * acc[0]
        vty = pls[_VY] + p["xsph_eps"] * acc[1]
        vtz = pls[_VZ] + p["xsph_eps"] * acc[2]
        return (pls[_PX] + flu * dt * vtx,
                pls[_PY] + flu * dt * vty,
                pls[_PZ] + flu * dt * vtz)

    posD = _pencil_sweep(featD, edge_ok, grid_dims=grid_dims, C=C, Bxy=Bxy,
                         n_out=3, pair_fn=pairD, post_fn=postD,
                         interpret=interpret, n_dz=n_dz)

    return jnp.concatenate([posD, velB, rhoC, feat[:, 7:9]], axis=1)


def sph_static_params(params) -> tuple:
    """Concrete python-float parameter tuple for the pencil substep (the
    GranParams analogue — compile-time constants)."""
    if params.kernel != "cubic":
        raise ValueError("pencil SPH currently implements the cubic kernel")
    if params.shifting != "xsph":
        raise ValueError("pencil SPH currently implements XSPH shifting")
    if params.integrator != "symplectic":
        raise ValueError("pencil SPH implements the symplectic scheme")
    m = float(params.rho0) * float(params.d0) ** 3
    return tuple(sorted(dict(
        h=float(params.h), m=m, rho0=float(params.rho0),
        c_s=float(params.c_s), gamma=float(params.eos_gamma),
        delta_sph=float(params.delta_sph),
        alpha_visc=float(params.alpha_visc), mu=float(params.mu),
        xsph_eps=float(params.xsph_eps), dt=float(params.dt),
        gx=float(params.gravity[0]), gy=float(params.gravity[1]),
        gz=float(params.gravity[2]),
        viscosity=params.viscosity_model).items()))
