"""Two-tier (dual-field) flat-lane symmetric sweep.

The single-field flat kernel (ops.pallas.flatlane_kernel) must size its slot
capacity C for the WORST cell: the vehicle-on-CRM bed needs C = 32 because
wheel-rim BCE + compressed bed stack 27 markers in a contact cell, while the
typical bed cell holds ~14 — so >75% of every C x C pair lattice is padding.
This kernel splits the markers of each cell into two fields by bin rank:

  * field A (capacity CA): the first CA markers of every cell — sized for
    the TYPICAL cell, so the A x A lattice stays dense,
  * field B (capacity CB): the spill — non-empty only in the rare spike
    cells (wheel contact, wall-layer stacks), concentrated in a few rows.

Every pair is still evaluated exactly once: A-A and B-B run the usual
half-stencil with triangular self masks; A-B cross pairs are owned by the
A side for the self cell and split into an A-self x B-neighbor and a
B-self x A-neighbor family for forward offsets.  Cross and B-B sweeps are
gated per row block on B occupancy (scalar-prefetched), so rows without
spill cells pay ONLY the dense A x A lattice — with CA = CB = C/2 a
spill-free row block costs 1/4 of the single-field sweep.

Reaction scatter uses one rolling window per field (same ping-pong scheme
as flatlane_kernel, including the register-pressure design: scratch-backed
accumulators + a zero-token data dependency serializing the sweep chains).

Reference role: the occupancy-tiered layouts of the reference's GPU solvers
(/root/reference/src/chrono_fsi/sph/physics/FsiDataManager.cuh — markers
sorted by cell with per-type offsets); the tiering itself is TPU-native
(born of the (8,128) vreg tile, not a translation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifts(SZ, n_dz):
    return [(0, dz) for dz in range(1, n_dz + 1)] + \
        [(0, SZ + dz) for dz in range(-n_dz, n_dz + 1)] + \
        [(1, dy * SZ + dz) for dy in (-1, 0, 1)
         for dz in range(-n_dz, n_dz + 1)]


def _make_dual_kernel(F_in, n_out, n_acc, CA, CB, NL, SZ, Bxy, WB,
                      pair2_fn, post_fn, n_dz, val_idx):
    CSA = min(8, CA)
    CSB = min(8, CB)
    nA_ch = CA // CSA
    nB_ch = CB // CSB
    assert CA % CSA == 0 and CB % CSB == 0
    shifts = _shifts(SZ, n_dz)

    def kernel(act_ref, featA_ref, featB_ref, outA_ref, outB_ref,
               bufA, bufB, awinA, awinB, bwinA, bwinB, reactA, reactB,
               accA_ref, accB_ref, semA, semB):
        b = pl.program_id(0)
        base = b * Bxy
        evA = act_ref[b, 0] > 0          # A markers in own rows
        evAg = act_ref[b, 1] > 0         # A markers in own+ghost rows
        evB = act_ref[b, 2] > 0
        evBg = act_ref[b, 3] > 0

        @pl.when(b == 0)
        def _init():
            awinA[...] = jnp.zeros((WB, n_acc, CA, NL), jnp.float32)
            bwinA[...] = jnp.zeros((WB, n_acc, CB, NL), jnp.float32)

        reactA[...] = jnp.zeros((WB, n_acc, CA, NL), jnp.float32)
        reactB[...] = jnp.zeros((WB, n_acc, CB, NL), jnp.float32)
        accA_ref[...] = jnp.zeros((Bxy, n_acc, CA, NL), jnp.float32)
        accB_ref[...] = jnp.zeros((Bxy, n_acc, CB, NL), jnp.float32)

        @pl.when(evAg)
        def _dmaA():
            cp = pltpu.make_async_copy(
                featA_ref.at[pl.ds(base, Bxy + 1)], bufA, semA)
            cp.start()
            cp.wait()

        @pl.when(evBg)
        def _dmaB():
            cp = pltpu.make_async_copy(
                featB_ref.at[pl.ds(base, Bxy + 1)], bufB, semB)
            cp.start()
            cp.wait()

        def chunks_of(buf, CS, n_ch):
            slab = buf[0:Bxy]
            return [[slab[:, f, c * CS:(c + 1) * CS][:, :, None, :]
                     for f in range(F_in)] for c in range(n_ch)]

        def tri_of(CS, C, c0):
            return (jax.lax.broadcasted_iota(jnp.int32, (CS, C, NL), 0) + c0
                    < jax.lax.broadcasted_iota(jnp.int32, (CS, C, NL), 1)
                    ).astype(jnp.float32)

        def sweep(s_chunks, CS, nbuf, Cn, off, shift, tri, acc_ref, react,
                  tok):
            """One (self chunks) x (neighbor slab at offset) block.

            tri: None (cross/forward) or a per-chunk strict-upper mask
            (same-field self block).  ``tok`` serializes chains (see
            flatlane_kernel.sweep)."""
            dep = jnp.where(jnp.isfinite(tok), 0.0, tok)
            slab = nbuf[off:off + Bxy]
            rsum = [jnp.zeros((Bxy, Cn, NL), jnp.float32)
                    for _ in range(n_acc)]
            outs = []
            for c, s in enumerate(s_chunks):
                n = [((slab[:, f] if shift == 0 else
                       pltpu.roll(slab[:, f], (-shift) % NL, 2))
                      + dep)[:, None]
                     for f in range(F_in)]
                ok = s[val_idx] * n[val_idx]
                if tri is not None:
                    ok = ok * tri_of(CS, Cn, c * CS)[None]
                ts, tr = pair2_fn(s, n, ok)
                outs.append(tuple(jnp.sum(ts[a], axis=2)
                                  for a in range(n_acc)))
                for a in range(n_acc):
                    rsum[a] = rsum[a] + jnp.sum(tr[a], axis=1)
            acc_ref[...] += jnp.stack(
                [jnp.concatenate([o[a] for o in outs], axis=1)
                 for a in range(n_acc)], axis=1)
            if shift != 0:
                rsum = [pltpu.roll(r, shift % NL, 2) for r in rsum]
            stk = jnp.stack(rsum, axis=1)
            react[off:off + Bxy] += stk
            return jnp.sum(stk[:, 0, 0])

        @pl.when(evA)
        def _aa():
            sA = chunks_of(bufA, CSA, nA_ch)
            tok = sweep(sA, CSA, bufA, CA, 0, 0, True, accA_ref, reactA,
                        jnp.zeros((), jnp.float32))
            for off, sh in shifts:
                tok = sweep(sA, CSA, bufA, CA, off, sh, None, accA_ref,
                            reactA, tok)
            reactA[0, 0] += jnp.full(
                (CA, NL), jnp.where(jnp.isfinite(tok), 0.0, tok),
                jnp.float32)

        @pl.when(jnp.logical_and(evA, evBg))
        def _ab():
            # A-self x B-neighbor: self cell (all A-B pairs of the cell,
            # evaluated once from the A side) + every forward offset
            sA = chunks_of(bufA, CSA, nA_ch)
            tok = sweep(sA, CSA, bufB, CB, 0, 0, None, accA_ref, reactB,
                        jnp.zeros((), jnp.float32))
            for off, sh in shifts:
                tok = sweep(sA, CSA, bufB, CB, off, sh, None, accA_ref,
                            reactB, tok)
            reactB[0, 0] += jnp.full(
                (CB, NL), jnp.where(jnp.isfinite(tok), 0.0, tok),
                jnp.float32)

        @pl.when(jnp.logical_and(evB, evAg))
        def _ba():
            # B-self x A-neighbor: forward offsets only (self cell already
            # covered by the A-side sweep above)
            sB = chunks_of(bufB, CSB, nB_ch)
            tok = jnp.zeros((), jnp.float32)
            for off, sh in shifts:
                tok = sweep(sB, CSB, bufA, CA, off, sh, None, accB_ref,
                            reactA, tok)
            reactA[0, 1] += jnp.full(
                (CA, NL), jnp.where(jnp.isfinite(tok), 0.0, tok),
                jnp.float32)

        @pl.when(evB)
        def _bb():
            sB = chunks_of(bufB, CSB, nB_ch)
            tok = sweep(sB, CSB, bufB, CB, 0, 0, True, accB_ref, reactB,
                        jnp.zeros((), jnp.float32))
            for off, sh in shifts:
                tok = sweep(sB, CSB, bufB, CB, off, sh, None, accB_ref,
                            reactB, tok)
            reactB[0, 1] += jnp.full(
                (CB, NL), jnp.where(jnp.isfinite(tok), 0.0, tok),
                jnp.float32)

        # rolling windows + ping-pong combine (every block, active or not)
        def window(win_in, win_out, react, C):
            fin = win_in[0:Bxy] + react[0:Bxy]
            win_out[0:WB - Bxy] = win_in[Bxy:WB] + react[Bxy:WB]
            win_out[WB - Bxy:WB] = jnp.zeros((Bxy, n_acc, C, NL),
                                             jnp.float32)
            return fin

        is_even = b % 2 == 0

        @pl.when(is_even)
        def _even():
            outA_ref[:, 0:n_acc] = window(awinA, awinB, reactA, CA)
            outB_ref[:, 0:n_acc] = window(bwinA, bwinB, reactB, CB)

        @pl.when(jnp.logical_not(is_even))
        def _odd():
            outA_ref[:, 0:n_acc] = window(awinB, awinA, reactA, CA)
            outB_ref[:, 0:n_acc] = window(bwinB, bwinA, reactB, CB)

        def post_field(out_ref, buf, acc_ref, C):
            planes0 = [buf[0:Bxy][:, f] for f in range(F_in)]
            acc = [acc_ref[:, a] + out_ref[:, a] for a in range(n_acc)]
            outs = post_fn(planes0, tuple(acc))
            for f in range(n_out):
                out_ref[:, f] = outs[f]

        @pl.when(evA)
        def _postA():
            post_field(outA_ref, bufA, accA_ref, CA)

        @pl.when(jnp.logical_not(evA))
        def _blankA():
            outA_ref[...] = jnp.zeros(
                (Bxy, outA_ref.shape[1], CA, NL), jnp.float32)

        @pl.when(evB)
        def _postB():
            post_field(outB_ref, bufB, accB_ref, CB)

        @pl.when(jnp.logical_not(evB))
        def _blankB():
            outB_ref[...] = jnp.zeros(
                (Bxy, outB_ref.shape[1], CB, NL), jnp.float32)

    return kernel


def dual_auto_bxy(CA, CB, NL, budget_vregs=None, chain_temps=40):
    """Register-pressure clamp (see flatlane_kernel.flat_auto_bxy): the
    widest single chain is a CS x max(CA, CB) lattice."""
    if budget_vregs is None:
        from chrono_tpu.ops.pallas.flatlane_kernel import _VREG_BUDGET
        budget_vregs = _VREG_BUDGET
    C = max(CA, CB)
    CS = min(8, C)
    per_temp = max(1, (CS * C * NL) // (8 * 128))
    b = budget_vregs // (chain_temps * per_temp)
    return max(1, min(8, b))


def sym_sweep_flat_dual(featA, featB, *, grid_dims, SZ, CA, CB, Bxy,
                        n_out, n_acc, pair2_fn, post_fn, interpret=False,
                        flops_per_pair=60, n_dz=1, val_idx,
                        rowA=None, rowB=None):
    """Dual-field flat-lane sweep.  featA: (nx, F, CA, NL), featB:
    (nx, F, CB, NL); returns (outA (nx, n_out, CA, NL), outB (...CB...)).

    ``rowA``/``rowB``: (nx,) per-row occupancy masks (any valid marker in
    the row) — default all-active.  Cross and B-B sweeps run only for row
    blocks whose [own, own+ghost] windows hold B markers."""
    nx, ny, nz = grid_dims
    F_in = featA.shape[1]
    NL = featA.shape[3]
    if featB.shape[1] != F_in or featB.shape[3] != NL:
        raise ValueError("field plane shapes disagree")
    if NL % 128:
        raise ValueError("NL must be a multiple of 128")
    if SZ < nz + n_dz:
        raise ValueError("SZ too small for nz + n_dz")
    if NL < ny * SZ + SZ + n_dz:
        raise ValueError("NL leaves no roll headroom")
    Bxy = min(Bxy, dual_auto_bxy(CA, CB, NL))
    nx_pad = ((nx + Bxy - 1) // Bxy) * Bxy
    WB = Bxy + 1
    padA = jnp.zeros((nx_pad - nx + 1, F_in, CA, NL), jnp.float32)
    padB = jnp.zeros((nx_pad - nx + 1, F_in, CB, NL), jnp.float32)
    fA = jnp.concatenate([featA, padA], axis=0)
    fB = jnp.concatenate([featB, padB], axis=0)

    n_blocks = nx_pad // Bxy

    def block_flags(row):
        if row is None:
            own = g = jnp.ones((n_blocks,), jnp.int32)
        else:
            r = jnp.pad(row.astype(jnp.int32), (0, nx_pad + 1 - nx))
            own = jnp.max(r[:nx_pad].reshape(n_blocks, Bxy), axis=1)
            ghost = r[jnp.arange(n_blocks) * Bxy + Bxy]
            g = jnp.maximum(own, ghost)
        return own, g

    ownA, gA = block_flags(rowA)
    ownB, gB = block_flags(rowB)
    act = jnp.stack([ownA, gA, ownB, gB], axis=1)

    n_wide = max(n_out, n_acc)
    kernel = _make_dual_kernel(F_in, n_out, n_acc, CA, CB, NL, SZ, Bxy, WB,
                               pair2_fn, post_fn, n_dz, val_idx)
    n_off = len(_shifts(SZ, n_dz)) + 1
    outA, outB = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nx_pad, n_wide, CA, NL),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((nx_pad, n_wide, CB, NL),
                                        jnp.float32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nx_pad // Bxy,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec((Bxy, n_wide, CA, NL),
                                    lambda b, act: (b, 0, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((Bxy, n_wide, CB, NL),
                                    lambda b, act: (b, 0, 0, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((Bxy + 1, F_in, CA, NL), jnp.float32),
                pltpu.VMEM((Bxy + 1, F_in, CB, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, CA, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, CA, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, CB, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, CB, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, CA, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, CB, NL), jnp.float32),
                pltpu.VMEM((Bxy, n_acc, CA, NL), jnp.float32),
                pltpu.VMEM((Bxy, n_acc, CB, NL), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_pair * n_off
                      * (CA * CA + 2 * CA * CB + CB * CB)
                      * nx_pad * NL // 2),
            bytes_accessed=int(2.25 * F_in * (CA + CB) * NL * nx_pad * 4),
            transcendentals=int(3 * n_off * CA * CA * nx_pad * NL // 2),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(act, fA, fB)
    return outA[:nx, :n_out], outB[:nx, :n_out]
