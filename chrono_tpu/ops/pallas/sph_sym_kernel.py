"""Symmetric half-stencil WCSPH Pallas kernels — the SPH analogue of
dem_sym_kernel (v4).

Each of the four sweeps of the symplectic substep (see sph_pencil_kernel:
A Adami BC, B momentum+kick, C continuity, D XSPH drift) evaluates every
marker pair ONCE and scatters the partner's contribution through the same
forward-only rolling VMEM window as the DEM kernel: the half stencil keeps
the self cell (strict upper triangle), the dz = +1..n_dz lane-roll column,
and the four forward xy offsets (pencil-row deltas +1, ny−1, ny, ny+1),
with the Pallas grid executing sequentially on one TensorCore.

Unlike DEM, SPH pair contributions are not all antisymmetric: each sweep's
``pair2`` function emits the self terms AND the partner terms computed
from the shared pair geometry (kernel value/gradient, densities,
pressures).  The only genuinely two-sided physics is the mixed
fluid–solid viscous interaction in sweep B — the partner term needs the
ghost velocity of the *other* side — which the pair2 evaluates explicitly
with the roles swapped.  14 of 27 (n_dz = 1) or 22 of 45 (n_dz = 2) offset
blocks evaluated, 5 DMA slabs instead of 10.

Physics matches sph_pencil_kernel term for term (parity-tested); reference
hot loop: /root/reference/src/chrono_fsi/sph/physics/SphForceWCSPH.cu.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chrono_tpu.ops.pallas.sph_pencil_kernel import (
    _cubic_w, _cubic_dwdr, _tait_p, _tait_rho, _pair_geom,
    _PX, _PY, _PZ, _VX, _VY, _VZ, _RHO, _FLU, _VAL,
)

# forward xy offsets (dx, dy) with positive pencil-row delta dx·ny + dy
_FWD_XY = [(0, 1), (1, -1), (1, 0), (1, 1)]


def _make_sym_sweep_kernel(F_in, n_out, n_acc, C, NZ, Bxy, ny, G, WB,
                           pair2_fn, post_fn, n_dz, val_idx=_VAL,
                           hold_map=None):
    """Symmetric pencil sweep scaffold.

    pair2_fn(s, n, ok) -> (self_terms, react_terms): two tuples of n_acc
    arrays (Bxy, CS, C, NZ); self terms are summed over the neighbor axis
    into the self accumulators, react terms over the (chunked) self axis
    into the partner accumulators.  post_fn(self planes, acc) -> n_out."""
    fwd_lin = [dx * ny + dy for (dx, dy) in _FWD_XY]
    CS = min(8, C)
    n_chunks = (C + CS - 1) // CS
    assert C % CS == 0

    def kernel(act_ref, edge_ref, feat_ref, out_ref, self_buf, nbuf, accA,
               accB, self_sem, nsem):
        b = pl.program_id(0)
        base = b * Bxy + G
        if hold_map is None:
            act = kp = act_ref[b] > 0
        else:
            # eval/keep gating, BIT-PACKED into one int per block (a 2-D
            # scalar-prefetch array is lane-padded 2 -> 128 in SMEM and
            # overflows the 1 MB budget at 1M-marker block counts):
            # bit 0 = eval (run the pair sweeps), bit 1 = keep (write post
            # outputs); kept-not-evaluated rows HOLD their input planes
            # per hold_map (valid when post(planes, acc) == those planes
            # for such rows — reactions into held rows are discarded)
            act = act_ref[b] % 2 > 0
            kp = act_ref[b] // 2 > 0

        @pl.when(b == 0)
        def _init():
            accA[...] = jnp.zeros((WB, n_acc, C, NZ), jnp.float32)

        @pl.when(jnp.logical_not(act))
        def _skip():
            # (hold-mode: kept-but-not-evaluated rows handled below)
            # inactive row block (no markers in its rows): no pairs touch
            # it, so skip the DMAs and every sweep — just advance the
            # rolling reaction window (ping-pong must stay in step) and
            # blank the outputs
            def shift(acc_in, acc_out):
                acc_out[0:WB - Bxy] = acc_in[Bxy:WB]
                acc_out[WB - Bxy:WB] = jnp.zeros((Bxy, n_acc, C, NZ),
                                                 jnp.float32)

            @pl.when(b % 2 == 0)
            def _even():
                shift(accA, accB)

            @pl.when(b % 2 == 1)
            def _odd():
                shift(accB, accA)

            out_ref[...] = jnp.zeros(
                (Bxy, out_ref.shape[1], C, NZ), jnp.float32)

        if hold_map is not None:
            @pl.when(jnp.logical_not(act) & kp)
            def _hold():
                # frozen outputs = input planes per hold_map (needs the
                # self DMA even though every sweep was skipped)
                cph = pltpu.make_async_copy(
                    feat_ref.at[pl.ds(base, Bxy)], self_buf, self_sem)
                cph.start()
                cph.wait()
                for f in range(n_out):
                    if hold_map[f] < 0:
                        out_ref[:, f] = jnp.zeros((Bxy, C, NZ), jnp.float32)
                    else:
                        out_ref[:, f] = self_buf[:, hold_map[f]]

        def _active_body():
            cp_self = pltpu.make_async_copy(
                feat_ref.at[pl.ds(base, Bxy)], self_buf, self_sem)
            cp_self.start()

            def nbr_dma(slot, k):
                return pltpu.make_async_copy(
                    feat_ref.at[pl.ds(base + fwd_lin[k], Bxy)],
                    nbuf.at[slot], nsem.at[slot])

            nbr_dma(0, 0).start()
            cp_self.wait()

            s_chunks = [
                [self_buf[:, f, c * CS:(c + 1) * CS][:, :, None, :]
                 for f in range(F_in)]
                for c in range(n_chunks)]
            # strict upper triangle per chunk: global c_self < c_nbr
            tris = [
                (jax.lax.broadcasted_iota(jnp.int32, (CS, C, NZ), 0) + c * CS
                 < jax.lax.broadcasted_iota(jnp.int32, (CS, C, NZ), 1)
                 ).astype(jnp.float32)
                for c in range(n_chunks)]

            accs = [tuple(jnp.zeros((Bxy, CS, NZ), jnp.float32)
                          for _ in range(n_acc)) for _ in range(n_chunks)]
            # reactions within this block's own rows (self column)
            own_react = [jnp.zeros((Bxy, C, NZ), jnp.float32)
                         for _ in range(n_acc)]
            L = jnp.zeros((WB, n_acc, C, NZ), jnp.float32)

            def sweep_block(slab, ok_extra, dz, d, L, own_react, accs):
                """One (offset, dz) block: action += self sums; reactions either
                into own rows (d = None: self column, lane roll) or into the
                window L at forward row delta d."""
                into_own = d is None
                sl = slab if dz == 0 else pltpu.roll(slab, (-dz) % NZ, 3)
                n = [sl[:, f][:, None, :, :] for f in range(F_in)]
                rsum = [jnp.zeros((Bxy, C, NZ), jnp.float32)
                        for _ in range(n_acc)]
                for c in range(n_chunks):
                    s = s_chunks[c]
                    ok = s[val_idx] * n[val_idx]
                    if ok_extra is not None:
                        ok = ok * ok_extra
                    if into_own and dz == 0:
                        ok = ok * tris[c][None]
                    ts, tr = pair2_fn(s, n, ok)
                    accs[c] = tuple(accs[c][a] + jnp.sum(ts[a], axis=2)
                                    for a in range(n_acc))
                    for a in range(n_acc):
                        rsum[a] = rsum[a] + jnp.sum(tr[a], axis=1)
                if dz != 0:
                    rsum = [pltpu.roll(r, dz % NZ, 2) for r in rsum]
                if into_own:
                    own_react = [own_react[a] + rsum[a] for a in range(n_acc)]
                else:
                    react = jnp.stack(rsum, axis=1)       # (Bxy, n_acc, C, NZ)
                    L = L + jnp.pad(
                        react, ((d, WB - d - Bxy), (0, 0), (0, 0), (0, 0)))
                return L, own_react, accs

            # ---- self column: dz = 0 triangle + dz = 1..n_dz ----
            for dz in range(0, n_dz + 1):
                L, own_react, accs = sweep_block(self_buf[...], None, dz, None,
                                                 L, own_react, accs)

            # ---- 4 forward xy offsets × dz ∈ [−n_dz, n_dz] ----
            for k in range(4):
                if k + 1 < 4:
                    nbr_dma((k + 1) % 2, k + 1).start()
                nbr_dma(k % 2, k).wait()
                slab = nbuf[k % 2]
                ok_xy = edge_ref[0, :, k][:, None, None, None]
                for dz in range(-n_dz, n_dz + 1):
                    L, own_react, accs = sweep_block(slab, ok_xy, dz,
                                                     fwd_lin[k],
                                                     L, own_react, accs)

            # ---- combine: action + own reactions + rolling window ----
            def window(acc_in, acc_out):
                fin = acc_in[0:Bxy] + L[0:Bxy]
                acc_out[0:WB - Bxy] = acc_in[Bxy:WB] + L[Bxy:WB]
                acc_out[WB - Bxy:WB] = jnp.zeros((Bxy, n_acc, C, NZ),
                                                 jnp.float32)
                return fin

            is_even = b % 2 == 0

            @pl.when(is_even)
            def _even():
                out_ref[:, 0:n_acc] = window(accA, accB)

            @pl.when(jnp.logical_not(is_even))
            def _odd():
                out_ref[:, 0:n_acc] = window(accB, accA)

            acc = []
            for a in range(n_acc):
                act = jnp.concatenate([accs[c][a] for c in range(n_chunks)],
                                      axis=1)
                acc.append(act + own_react[a] + out_ref[:, a])
            planes = [self_buf[:, f] for f in range(F_in)]
            outs = post_fn(planes, tuple(acc))
            for f in range(n_out):
                out_ref[:, f] = outs[f]

        @pl.when(act)
        def _active():
            _active_body()

    return kernel


def _sym_sweep(feat, edge_fwd, *, grid_dims, C, Bxy, n_out, n_acc,
               pair2_fn, post_fn, interpret=False, flops_per_pair=60,
               n_dz=1, val_idx=_VAL, active=None, hold_map=None):
    nx, ny, nz = grid_dims
    if ny < 2:
        raise ValueError("symmetric sweep needs ny >= 2")
    nxy = nx * ny
    F_in = feat.shape[1]
    NZp = feat.shape[3]
    if NZp % 128 or nz > NZp - n_dz:
        raise ValueError(f"NZp={NZp} must be a 128-multiple ≥ nz+{n_dz}")
    G = ny + 1
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    WB = ny + 1 + Bxy
    pad_lo = jnp.zeros((G, F_in, C, NZp), jnp.float32)
    pad_hi = jnp.zeros((G + nxy_pad - nxy, F_in, C, NZp), jnp.float32)
    feat_p = jnp.concatenate([pad_lo, feat, pad_hi], axis=0)
    edge_p = jnp.concatenate(
        [edge_fwd, jnp.zeros((4, nxy_pad - nxy), jnp.float32)],
        axis=1).T.reshape(nxy_pad // Bxy, Bxy, 4)
    n_blocks = nxy_pad // Bxy
    if active is None:
        act_b = jnp.full((n_blocks,), 3 if hold_map is not None else 1,
                         jnp.int32)
    elif hold_map is None:
        act_rows = jnp.pad(active.astype(jnp.int32), (0, nxy_pad - nxy))
        act_b = jnp.max(act_rows.reshape(n_blocks, Bxy), axis=1)
    else:
        # hold mode: ``active`` is (nxy, 2) = [eval, keep] per row; block
        # flags are the row-wise max, bit-packed eval + 2*keep.  eval ⊆
        # keep is assumed (an eval-but-not-keep block would still write
        # post outputs).
        act_rows = jnp.pad(active.astype(jnp.int32),
                           ((0, nxy_pad - nxy), (0, 0)))
        ek = jnp.max(act_rows.reshape(n_blocks, Bxy, 2), axis=1)
        act_b = ek[:, 0] + 2 * ek[:, 1]

    n_wide = max(n_out, n_acc)
    import os as _os
    if _os.environ.get("CHRONO_SPH_DEBUG_SHAPES"):
        print("SYM_SWEEP act_b", act_b.shape, act_b.dtype, "edge_p",
              edge_p.shape, "feat_p", feat_p.shape, "hold", hold_map,
              flush=True)
    kernel = _make_sym_sweep_kernel(F_in, n_out, n_acc, C, NZp, Bxy, ny, G,
                                    WB, pair2_fn, post_fn, n_dz,
                                    val_idx=val_idx, hold_map=hold_map)
    n_blocks_half = 0.5 * (2 * n_dz + 1) * 9 + 0.5  # ≈ evaluated fraction
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nxy_pad, n_wide, C, NZp),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,     # the (n_blocks,) activity mask
            grid=(nxy_pad // Bxy,),
            in_specs=[
                pl.BlockSpec((1, Bxy, 4), lambda b, act: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((Bxy, n_wide, C, NZp),
                                   lambda b, act: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((Bxy, F_in, C, NZp), jnp.float32),
                pltpu.VMEM((2, Bxy, F_in, C, NZp), jnp.float32),
                pltpu.VMEM((WB, n_acc, C, NZp), jnp.float32),
                pltpu.VMEM((WB, n_acc, C, NZp), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ]),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_pair * n_blocks_half * C * C * nxy_pad
                      * NZp),
            bytes_accessed=(5 + 2) * F_in * C * NZp * nxy_pad * 4,
            transcendentals=int(3 * n_blocks_half * C * C * nxy_pad * NZp),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(act_b, edge_p, feat_p)
    return out[:nxy, :n_out]


@functools.partial(jax.jit, static_argnames=(
    "sp", "grid_dims", "C", "Bxy", "interpret", "n_dz", "layout", "SZ",
    "n_dy", "n_dx"))
def sph_substep_sym(feat, edge_fwd, *, sp, grid_dims, C, Bxy=4,
                    interpret=False, n_dz=1, layout="pencil", SZ=0,
                    active=None, active_solid=None, n_dy=1, n_dx=1):
    """One symplectic WCSPH substep on the symmetric half stencil.  Same
    contract as sph_pencil_kernel.sph_substep_pencil but ``edge_fwd`` is
    the 4-offset forward table (dem_sym_kernel.edge_ok_fwd).  With
    ``layout="flat"`` the sweeps run on the flat-lane layout
    (ops.pallas.flatlane_kernel — rows = x, lanes = y·SZ + z; the
    small-grid engine; ``edge_fwd`` unused)."""
    p = dict(sp)
    h = p["h"]; m = p["m"]; rho0 = p["rho0"]; c_s = p["c_s"]
    gamma = p["gamma"]; dt = p["dt"]
    g = (p["gx"], p["gy"], p["gz"])

    if layout == "flat":
        from chrono_tpu.ops.pallas.flatlane_kernel import sym_sweep_flat

        def _SW(ft, *, n_out, n_acc, pair2_fn, post_fn, flops_per_pair,
                active_over=None, hold_map=None):
            return sym_sweep_flat(
                ft, grid_dims=grid_dims, SZ=SZ, C=C, Bxy=Bxy, n_out=n_out,
                n_acc=n_acc, pair2_fn=pair2_fn, post_fn=post_fn,
                interpret=interpret, flops_per_pair=flops_per_pair,
                n_dz=n_dz, val_idx=_VAL, n_dy=n_dy, n_dx=n_dx,
                active=active if active_over is None else active_over,
                hold_map=hold_map)
    else:
        def _SW(ft, *, n_out, n_acc, pair2_fn, post_fn, flops_per_pair,
                active_over=None, hold_map=None):
            return _sym_sweep(
                ft, edge_fwd, grid_dims=grid_dims, C=C, Bxy=Bxy,
                n_out=n_out, n_acc=n_acc, pair2_fn=pair2_fn,
                post_fn=post_fn, interpret=interpret,
                flops_per_pair=flops_per_pair, n_dz=n_dz,
                active=active if active_over is None else active_over,
                hold_map=hold_map)

    # Derived per-MARKER planes are computed ONCE per sweep as elementwise
    # plane passes and appended to the features, instead of per pair-slot
    # inside the sweep: the Tait pressure/density (x^7 and x^(1/7) — a
    # transcendental pow on TPU) and the 1/rho family cost more than the
    # rest of the pair arithmetic combined when evaluated C x C times per
    # cell.  Parity with the gather backend is unchanged (same values, one
    # evaluation site).

    # ---- sweep A: Adami BC (solid pressure + ghost velocity) ----
    _PWN = 9
    p_own_pl = _tait_p(feat[:, _RHO:_RHO + 1], rho0, c_s, gamma)
    featA = jnp.concatenate([feat, p_own_pl], axis=1)

    def pairA(s, n, ok):
        dx, dy, dz, r2, r = _pair_geom(s, n, h)
        Wij = _cubic_w(r, h)
        Wf = ok * n[_FLU] * Wij          # fluid neighbors of self
        Wr = ok * s[_FLU] * Wij          # fluid self seen by the neighbor
        gd = g[0] * dx + g[1] * dy + g[2] * dz
        ts = (Wf * (n[_PWN] + gd * n[_RHO]),
              Wf * n[_VX], Wf * n[_VY], Wf * n[_VZ], Wf)
        tr = (Wr * (s[_PWN] - gd * s[_RHO]),
              Wr * s[_VX], Wr * s[_VY], Wr * s[_VZ], Wr)
        return ts, tr

    def postA(pls, acc):
        swp, swx, swy, swz, sw = acc
        has = (sw > 1e-12).astype(jnp.float32)
        den = jnp.maximum(sw, 1e-12)
        p_solid = has * swp / den
        flu = pls[_FLU]
        p_all = flu * pls[_PWN] + (1.0 - flu) * p_solid
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

    # CHRONO_SPH_SWEEPS: measurement-only gate ("a,b,cd" default) — probe
    # tooling reads per-sweep costs by differencing (tools/probe_sph.py);
    # excluded sweeps are replaced by their shape-correct pass-throughs
    import os as _os
    _sweeps = _os.environ.get("CHRONO_SPH_SWEEPS", "a,b,cd").split(",")

    if "a" in _sweeps:
        if active_solid is not None and active is not None:
            # Sweep A only matters for pairs with a solid marker on either
            # side: rows owning such pairs (``active_solid`` — the
            # forward-dilated solid-row mask) EVALUATE; other wet rows HOLD
            # — for an all-fluid row postA is the identity on
            # (p_own, vx, vy, vz), so holding those input planes IS postA.
            # Reactions arriving into held rows are fluid-neighbor sums
            # that postA discards for fluid markers.  Reference analogue:
            # CfdAdamiBC touches only BCE markers
            # (/root/reference/src/chrono_fsi/sph/physics/SphForceWCSPH.cu:723).
            act2 = jnp.stack(
                [active_solid.astype(jnp.int32) * active.astype(jnp.int32),
                 active.astype(jnp.int32)], axis=1)
            outA = _SW(featA, n_out=4, n_acc=5, pair2_fn=pairA,
                       post_fn=postA, flops_per_pair=50,
                       active_over=act2, hold_map=(_PWN, _VX, _VY, _VZ))
        else:
            outA = _SW(featA, n_out=4, n_acc=5, pair2_fn=pairA,
                       post_fn=postA, flops_per_pair=50)
    else:
        outA = jnp.concatenate([p_own_pl, feat[:, 3:6]], axis=1)

    # ---- sweep B: momentum + kick ----
    _P, _VBX, _VBY, _VBZ, _RAL, _PR2 = 9, 10, 11, 12, 13, 14
    p_all_pl = outA[:, 0:1]
    flu_pl = feat[:, _FLU:_FLU + 1]
    rho_all_pl = flu_pl * feat[:, _RHO:_RHO + 1] + (1.0 - flu_pl) \
        * _tait_rho(p_all_pl, rho0, c_s, gamma)
    pr2_pl = p_all_pl / (rho_all_pl * rho_all_pl)
    featB = jnp.concatenate([feat, outA, rho_all_pl, pr2_pl], axis=1)
    if p["viscosity"] == "laminar":
        inv_rho_pl = 1.0 / rho_all_pl
        featB = jnp.concatenate([featB, inv_rho_pl], axis=1)
    _IRH = 15

    def pairB(s, n, ok):
        dx, dy, dz, r2, r = _pair_geom(s, n, h)
        dwdr = _cubic_dwdr(r, h)
        inv_r = jax.lax.rsqrt(r2 + 1e-12)
        gwx = dwdr * inv_r * dx
        gwy = dwdr * inv_r * dy
        gwz = dwdr * inv_r * dz
        # ghost-aware velocities of both sides
        vix = s[_FLU] * s[_VX] + (1.0 - s[_FLU]) * s[_VBX]
        viy = s[_FLU] * s[_VY] + (1.0 - s[_FLU]) * s[_VBY]
        viz = s[_FLU] * s[_VZ] + (1.0 - s[_FLU]) * s[_VBZ]
        vjx = n[_FLU] * n[_VX] + (1.0 - n[_FLU]) * n[_VBX]
        vjy = n[_FLU] * n[_VY] + (1.0 - n[_FLU]) * n[_VBY]
        vjz = n[_FLU] * n[_VZ] + (1.0 - n[_FLU]) * n[_VBZ]
        # action relative velocity (self raw − neighbor ghost) and reaction
        vx, vy, vz = s[_VX] - vjx, s[_VY] - vjy, s[_VZ] - vjz
        ux, uy, uz = n[_VX] - vix, n[_VY] - viy, n[_VZ] - viz
        pterm = s[_PR2] + n[_PR2]
        coef_p = ok * m * pterm
        ax, ay, az = -coef_p * gwx, -coef_p * gwy, -coef_p * gwz
        bx, by, bz = coef_p * gwx, coef_p * gwy, coef_p * gwz
        if p["viscosity"] == "laminar":
            cl = ok * m * 2.0 * p["mu"] * (s[_IRH] * n[_IRH]) \
                * (dx * gwx + dy * gwy + dz * gwz) / (r2 + 0.01 * h * h)
            ax, ay, az = ax + cl * vx, ay + cl * vy, az + cl * vz
            bx, by, bz = bx + cl * ux, by + cl * uy, bz + cl * uz
        else:
            rho_avg = 0.5 * (s[_RAL] + n[_RAL])
            # ONE reciprocal serves both viscosity directions
            invq = 1.0 / ((r2 + 0.01 * h * h) * rho_avg)
            vr = vx * dx + vy * dy + vz * dz
            Pi = jnp.where(vr < 0,
                           -p["alpha_visc"] * c_s * h * vr * invq, 0.0)
            cP = ok * m * Pi
            ax, ay, az = ax - cP * gwx, ay - cP * gwy, az - cP * gwz
            # swapped roles: v' = u, d' = −d → v'·d' = −u·d, ∇W' = −∇W
            ur = -(ux * dx + uy * dy + uz * dz)
            Pi2 = jnp.where(ur < 0,
                            -p["alpha_visc"] * c_s * h * ur * invq, 0.0)
            cP2 = ok * m * Pi2
            bx, by, bz = bx + cP2 * gwx, by + cP2 * gwy, bz + cP2 * gwz
        return (ax, ay, az), (bx, by, bz)

    def postB(pls, acc):
        flu = pls[_FLU]
        vx = pls[_VX] + flu * dt * (acc[0] + g[0])
        vy = pls[_VY] + flu * dt * (acc[1] + g[1])
        vz = pls[_VZ] + flu * dt * (acc[2] + g[2])
        return (vx, vy, vz)

    if "b" in _sweeps:
        velB = _SW(featB, n_out=3, n_acc=3, pair2_fn=pairB, post_fn=postB,
                   flops_per_pair=80)
    else:
        velB = feat[:, 3:6]

    _IRN = 9
    inv_rho_n_pl = 1.0 / jnp.maximum(feat[:, _RHO:_RHO + 1], 1e-9)
    featC = jnp.concatenate([feat[:, 0:3], velB, feat[:, 6:9],
                             inv_rho_n_pl], axis=1)

    # ---- fused sweep CD: continuity at kicked velocities + XSPH drift ----
    # One pass instead of two: both sweeps share the pair geometry (r, the
    # kernel value and gradient) and the same feature planes (positions,
    # kicked velocities, ρⁿ).  The XSPH weight uses ρⁿ — the same time
    # level the reference uses (SphForceWCSPH.cu evaluates every RHS term
    # from the current state in one kernel pass); the gather backend
    # (fsi/sph/system.py symplectic branch) matches term for term.
    def pairCD(s, n, ok):
        dx, dy, dz, r2, r = _pair_geom(s, n, h)
        dwdr = _cubic_dwdr(r, h)
        inv_r = jax.lax.rsqrt(r2 + 1e-12)
        gwx = dwdr * inv_r * dx
        gwy = dwdr * inv_r * dy
        gwz = dwdr * inv_r * dz
        vdotg = ((s[_VX] - n[_VX]) * gwx + (s[_VY] - n[_VY]) * gwy
                 + (s[_VZ] - n[_VZ]) * gwz)
        drho = ok * m * vdotg                       # symmetric
        ddgw = -(dx * gwx + dy * gwy + dz * gwz)
        okff = ok * s[_FLU] * n[_FLU]
        dh = p["delta_sph"] * h * c_s
        # XSPH transport correction (shares the pair geometry); the
        # (r2+eps) and rho_avg denominators are folded into ONE reciprocal
        Wij = _cubic_w(r, h)
        rho_avg = jnp.maximum(0.5 * (s[_RHO] + n[_RHO]), 1e-9)
        invq = 1.0 / ((r2 + 1e-12) * rho_avg)
        psi = 2.0 * (n[_RHO] - s[_RHO]) * ddgw * invq * rho_avg
        cx = okff * m * Wij * invq * (r2 + 1e-12)
        tx = cx * (n[_VX] - s[_VX])
        ty = cx * (n[_VY] - s[_VY])
        tz = cx * (n[_VZ] - s[_VZ])
        ts = (drho + dh * okff * m * n[_IRN] * psi,
              tx, ty, tz)
        tr = (drho - dh * okff * m * s[_IRN] * psi,
              -tx, -ty, -tz)
        return ts, tr

    def postCD(pls, acc):
        flu = pls[_FLU]
        rho = jnp.clip(pls[_RHO] + flu * dt * acc[0],
                       0.7 * rho0, 1.5 * rho0)
        vtx = pls[_VX] + p["xsph_eps"] * acc[1]
        vty = pls[_VY] + p["xsph_eps"] * acc[2]
        vtz = pls[_VZ] + p["xsph_eps"] * acc[3]
        return (rho,
                pls[_PX] + flu * dt * vtx,
                pls[_PY] + flu * dt * vty,
                pls[_PZ] + flu * dt * vtz)

    if "cd" in _sweeps:
        outCD = _SW(featC, n_out=4, n_acc=4, pair2_fn=pairCD, post_fn=postCD,
                    flops_per_pair=70)
    else:
        outCD = jnp.concatenate([feat[:, 6:7], feat[:, 0:3]], axis=1)
    rhoC = outCD[:, 0:1]
    posD = outCD[:, 1:4]

    return jnp.concatenate([posD, velB, rhoC, feat[:, 7:9]], axis=1)
