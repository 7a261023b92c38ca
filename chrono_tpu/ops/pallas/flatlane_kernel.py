"""Flat-lane symmetric sweep: small-grid layout for the pencil kernels.

The pencil layout (rows = x·ny + y columns, lanes = z) wastes the 128-lane
dimension when no grid axis is long: the vehicle-on-CRM demo bed bins into
(22, 16, 19) cells, so every lane tile carries 19 useful cells out of 128
(15%) and the sweep runs ~13x slower per cell than the same kernel on a
1M-marker grid (measured).  This layout flattens (y, z) into the lane
dimension instead:

    row  = x                      (the Pallas grid dimension)
    lane = y · SZ + z,  SZ = nz + n_dz  (n_dz pad lanes split the columns)

Neighbor offsets (dx, dy, dz) become ``row + dx`` plus ONE static lane roll
by ``dy·SZ + dz`` — y-boundary wrap lands in the pad lanes (masked by the
valid plane), x handled by one trailing ghost row.  The half stencil keeps
dx ∈ {0, +1}: all dx = 0 reactions stay in the block's own rows (lane
roll-backs, no window), dx = +1 reactions flow through a (Bxy+1)-row rolling
window.  The forward slab shares Bxy−1 rows with the self slab, so ONE
(Bxy+1)-row DMA serves both — 2 logical slabs at 1.25 slabs of traffic
(the pencil layout needs 5).

Register-pressure design (learned on real v5e): carrying the self/reaction
accumulators as SSA values across all 14 unrolled shift sweeps makes the
Mosaic scheduler keep the whole pair chain live — 839 MB of vector spills
at (C=32, NL=384, Bxy=4), 6.5x over VMEM.  A ``lax.fori_loop`` over the
shifts with dynamic ``pltpu.roll`` amounts fits but runs ~1000x slower
(dynamic multi-vreg lane rotates + dynamic-offset VMEM RMW hit a scalar
path).  So: shifts stay UNROLLED with static rolls, but both accumulators
live in VMEM scratch and are updated after every sweep — the stores break
the SSA live ranges, bounding register pressure to one sweep's chain.
``Bxy`` should stay small here (the wrapper clamps by C·NL); each +1 of
Bxy multiplies every pair-lattice temporary.

Same pair2/post callback contract as sph_sym_kernel._sym_sweep: the physics
callbacks are layout-blind, so CRM/SPH sweeps run on either engine and are
parity-tested against each other.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# experiment knobs (read once at import): number of interleaved sweep
# serialization chains, and the spillable-vreg budget of the Bxy clamp
N_TOKENS = max(1, int(os.environ.get("CHRONO_FLAT_TOKENS", "1")))
_VREG_BUDGET = int(os.environ.get("CHRONO_FLAT_VREGS", "3000"))


def _make_flat_kernel(F_in, n_out, n_acc, C, NL, SZ, Bxy, WB,
                      pair2_fn, post_fn, n_dz, val_idx, hold_map=None,
                      n_dy=1, n_dx=1):
    CS = min(8, C)
    n_chunks = (C + CS - 1) // CS
    assert C % CS == 0

    # half-stencil lane shifts: (reaction row offset, lane shift)
    # dx = 0 forward half (dz > 0, then dy > 0), then the dx > 0 rings;
    # n_dy/n_dx > 1 serve cells SMALLER than the interaction support in
    # the y/x axes (e.g. the C=8 SPH configuration: cell = 2 d0 against a
    # 2.4 d0 support needs a ±2 ring)
    shifts = [(0, dz) for dz in range(1, n_dz + 1)] + \
             [(0, dy * SZ + dz) for dy in range(1, n_dy + 1)
              for dz in range(-n_dz, n_dz + 1)] + \
             [(dx, dy * SZ + dz) for dx in range(1, n_dx + 1)
              for dy in range(-n_dy, n_dy + 1)
              for dz in range(-n_dz, n_dz + 1)]

    def kernel(act_ref, feat_ref, out_ref, buf, accA, accB, react, acc_ref,
               sem):
        b = pl.program_id(0)
        base = b * Bxy
        if hold_map is None:
            ev = kp = act_ref[b] > 0
        else:
            # active-domain mode: ev = run the pair sweeps (keep rows + the
            # block owning pairs INTO them), kp = write updated outputs
            # (else HOLD the input planes — frozen markers persist)
            ev = act_ref[b, 0] > 0
            kp = act_ref[b, 1] > 0

        @pl.when(b == 0)
        def _init():
            accA[...] = jnp.zeros((WB, n_acc, C, NL), jnp.float32)

        react[...] = jnp.zeros((WB, n_acc, C, NL), jnp.float32)
        acc_ref[...] = jnp.zeros((Bxy, n_acc, C, NL), jnp.float32)

        def pair_work():
            # DMA + all pair sweeps — skipped wholesale for inactive row
            # blocks (rows with no markers in [base−n_dx, base+Bxy+n_dx−1]):
            # the sweeps would only accumulate zeros.  The rolling window
            # and the ping-pong combine below still run so reaction state
            # stays consistent across skipped blocks.
            cp = pltpu.make_async_copy(
                feat_ref.at[pl.ds(base, Bxy + n_dx)], buf, sem)
            cp.start()
            cp.wait()
            self_slab = buf[0:Bxy]

            s_chunks = [
                [self_slab[:, f, c * CS:(c + 1) * CS][:, :, None, :]
                 for f in range(F_in)]
                for c in range(n_chunks)]
            tris = [
                (jax.lax.broadcasted_iota(jnp.int32, (CS, C, NL), 0)
                 + c * CS
                 < jax.lax.broadcasted_iota(jnp.int32, (CS, C, NL), 1)
                 ).astype(jnp.float32)
                for c in range(n_chunks)]
            return self_slab, s_chunks, tris

        @pl.when(ev)
        def _sweeps():
            self_slab, s_chunks, tris = pair_work()

            def sweep(off, shift, tri, tok):
                """One neighbor block; scratch-accumulated (off = reaction
                row offset: 0 = own rows, 1 = one row forward).  ``tok``
                serializes consecutive sweeps: without it the Mosaic
                scheduler overlaps every sweep's independent pair chain
                (measured 208 MB of vector spills at C=32, NL=384 even with
                per-sweep scratch stores — the RMW only orders the cheap
                accumulate, not the chains).  ``dep`` is exactly +0.0 at
                runtime but not provably so, making every neighbor plane of
                sweep k+1 data-depend on sweep k (lax.optimization_barrier
                is unimplemented in this Pallas TPU lowering)."""
                dep = jnp.where(jnp.isfinite(tok), 0.0, tok)
                slab = buf[off:off + Bxy]
                rsum = [jnp.zeros((Bxy, C, NL), jnp.float32)
                        for _ in range(n_acc)]
                outs = []
                for c in range(n_chunks):
                    s = s_chunks[c]
                    n = [((slab[:, f] if shift == 0 else
                           pltpu.roll(slab[:, f], (-shift) % NL, 2))
                          + dep)[:, None]
                         for f in range(F_in)]
                    ok = s[val_idx] * n[val_idx]
                    if tri:
                        ok = ok * tris[c][None]
                    ts, tr = pair2_fn(s, n, ok)
                    outs.append(tuple(jnp.sum(ts[a], axis=2)
                                      for a in range(n_acc)))
                    for a in range(n_acc):
                        rsum[a] = rsum[a] + jnp.sum(tr[a], axis=1)
                acc_ref[...] += jnp.stack(
                    [jnp.concatenate([outs[c][a] for c in range(n_chunks)],
                                     axis=1) for a in range(n_acc)], axis=1)
                if shift != 0:
                    rsum = [pltpu.roll(r, shift % NL, 2) for r in rsum]
                stk = jnp.stack(rsum, axis=1)
                react[off:off + Bxy] += stk
                return jnp.sum(stk[:, 0, 0])

            # N_TOKENS independent serialization chains, interleaved: with
            # one token every sweep waits for the previous sweep's full
            # chain to drain; two chains let the scheduler overlap a pair
            # of sweeps (2x the register footprint — keep small)
            toks = [jnp.zeros((), jnp.float32) for _ in range(N_TOKENS)]
            toks[0] = sweep(0, 0, True, toks[0])
            for i, (off, sh) in enumerate(shifts):
                k = (i + 1) % N_TOKENS
                toks[k] = sweep(off, sh, False, toks[k])
            # Token sink: consume each chain's token so it ends with an
            # ordered side effect.  Must be a VECTOR-shaped store — Mosaic
            # rejects scalar stores to VMEM ("Cannot store scalars to
            # VMEM"), which crashed the r3 bench when this sink moved
            # inside @pl.when (was: react[0, 0, 0, 0] += ...).  The
            # broadcast adds exactly +0.0 to one (C, NL) plane.
            tok = sum(toks)
            react[0, 0] += jnp.full((C, NL),
                                    jnp.where(jnp.isfinite(tok), 0.0, tok),
                                    jnp.float32)

        # the rolling window and the ping-pong combine run for EVERY block
        # (active or not) so the reaction state stays consistent across
        # skipped blocks
        def window(acc_in, acc_out):
            fin = acc_in[0:Bxy] + react[0:Bxy]
            acc_out[0:WB - Bxy] = acc_in[Bxy:WB] + react[Bxy:WB]
            acc_out[WB - Bxy:WB] = jnp.zeros((Bxy, n_acc, C, NL),
                                             jnp.float32)
            return fin

        is_even = b % 2 == 0

        @pl.when(is_even)
        def _even():
            out_ref[:, 0:n_acc] = window(accA, accB)

        @pl.when(jnp.logical_not(is_even))
        def _odd():
            out_ref[:, 0:n_acc] = window(accB, accA)

        @pl.when(kp)
        def _post():
            planes0 = [buf[0:Bxy][:, f] for f in range(F_in)]
            acc = [acc_ref[:, a] + out_ref[:, a] for a in range(n_acc)]
            outs = post_fn(planes0, tuple(acc))
            for f in range(n_out):
                out_ref[:, f] = outs[f]

        if hold_map is None:
            @pl.when(jnp.logical_not(kp))
            def _blank():
                nw = max(n_out, n_acc)
                out_ref[...] = jnp.zeros((Bxy, nw, C, NL), jnp.float32)
        else:
            @pl.when(jnp.logical_not(kp))
            def _hold():
                # frozen rows: outputs = the input planes per hold_map
                # (needs the DMA even when the sweeps were skipped)
                cp = pltpu.make_async_copy(
                    feat_ref.at[pl.ds(base, Bxy + n_dx)], buf, sem)
                cp.start()
                cp.wait()
                for f in range(n_out):
                    if hold_map[f] < 0:
                        out_ref[:, f] = jnp.zeros((Bxy, C, NL), jnp.float32)
                    else:
                        out_ref[:, f] = buf[0:Bxy][:, hold_map[f]]

    return kernel


def flat_auto_bxy(C, NL, budget_vregs=None, chain_temps=40):
    """Largest Bxy whose one-sweep register chain plausibly fits: each
    pair-lattice temporary is Bxy·CS·C·NL/(8·128) vregs; measured on v5e,
    ~40 live temporaries per sweep chain and ~3000 spillable vregs stay
    within the 128 MB scoped-VMEM budget with margin."""
    if budget_vregs is None:
        budget_vregs = _VREG_BUDGET
    CS = min(8, C)
    per_temp = max(1, (CS * C * NL) // (8 * 128))
    b = budget_vregs // (chain_temps * per_temp)
    return max(1, min(8, b))


def sym_sweep_flat(feat, *, grid_dims, SZ, C, Bxy, n_out, n_acc,
                   pair2_fn, post_fn, interpret=False, flops_per_pair=60,
                   n_dz=1, val_idx, active=None, hold_map=None,
                   n_dy=1, n_dx=1):
    """feat: (nx, F, C, NL) flat-lane planes (lane = y·SZ + z); returns
    (nx, n_out, C, NL).  ``SZ`` must be ≥ nz + n_dz and ``NL`` a 128-multiple
    with roll headroom — the binning guarantees NL ≥ ny·SZ + SZ + n_dz.
    ``Bxy`` is clamped by the register-pressure model (flat_auto_bxy).

    ``active``: optional (nx,) row-activity mask (int/bool, traced) — rows
    with no markers in [r−1, r+1].  Row blocks whose rows are all inactive
    skip the DMA and every pair sweep (the dominant cost in scenes where
    most of the grid is air — a collapsing dam break wets ~1/7 of its tank).
    Activity is per REBUILD (markers move < skin within a cycle), so the
    mask is data-dependent but shape-static: dynamic work, static shapes.
    """
    nx, ny, nz = grid_dims
    F_in = feat.shape[1]
    NL = feat.shape[3]
    if NL % 128:
        raise ValueError("NL must be a multiple of 128")
    if SZ < nz + n_dz:
        raise ValueError("SZ too small for nz + n_dz")
    if NL < ny * SZ + n_dy * SZ + n_dz:
        raise ValueError("NL leaves no roll headroom")
    Bxy = min(Bxy, flat_auto_bxy(C, NL))
    nx_pad = ((nx + Bxy - 1) // Bxy) * Bxy
    WB = Bxy + n_dx
    pad_hi = jnp.zeros((nx_pad - nx + n_dx, F_in, C, NL), jnp.float32)
    feat_p = jnp.concatenate([feat, pad_hi], axis=0)

    n_blocks = nx_pad // Bxy
    if active is None:
        act_b = jnp.ones((n_blocks,) if hold_map is None
                         else (n_blocks, 2), jnp.int32)
    elif active.ndim == 2:
        # explicit [eval, keep] per row (caller already dilated eval
        # through the forward offsets — e.g. the SPH solid-restricted
        # Adami sweep); block flags are the row-wise max
        if hold_map is None:
            raise ValueError("2-column active needs hold_map")
        act_rows = jnp.pad(active.astype(jnp.int32),
                           ((0, nx_pad - nx), (0, 0)))
        act_b = jnp.max(act_rows.reshape(n_blocks, Bxy, 2), axis=1)
    else:
        act_rows = jnp.pad(active.astype(jnp.int32), (0, nx_pad - nx))
        keep_b = jnp.max(act_rows.reshape(n_blocks, Bxy), axis=1)
        if hold_map is None:
            # skip mode: block active ⇔ any of its rows holds markers
            act_b = keep_b
        else:
            # active-domain mode: [eval, keep] per block — a block owning
            # pairs into a kept block (up to ceil(n_dx/Bxy) blocks before
            # it) must still sweep
            eval_b = keep_b
            for d in range(1, -(-n_dx // Bxy) + 1):
                eval_b = jnp.maximum(
                    eval_b, jnp.concatenate(
                        [keep_b[d:], jnp.zeros((d,), keep_b.dtype)]))
            act_b = jnp.stack([eval_b, keep_b], axis=1)

    n_wide = max(n_out, n_acc)
    kernel = _make_flat_kernel(F_in, n_out, n_acc, C, NL, SZ, Bxy, WB,
                               pair2_fn, post_fn, n_dz, val_idx,
                               hold_map=hold_map, n_dy=n_dy, n_dx=n_dx)
    n_blocks_half = 0.5 * (2 * n_dz + 1) * (2 * n_dy + 1) \
        * (2 * n_dx + 1) + 0.5
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx_pad, n_wide, C, NL),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,     # the (n_blocks,) activity mask
            grid=(nx_pad // Bxy,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((Bxy, n_wide, C, NL),
                                   lambda b, act: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((Bxy + n_dx, F_in, C, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, C, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, C, NL), jnp.float32),
                pltpu.VMEM((WB, n_acc, C, NL), jnp.float32),
                pltpu.VMEM((Bxy, n_acc, C, NL), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ]),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_pair * n_blocks_half * C * C * nx_pad * NL),
            bytes_accessed=int(2.25 * F_in * C * NL * nx_pad * 4),
            transcendentals=int(3 * n_blocks_half * C * C * nx_pad * NL),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(act_b, feat_p)
    return out[:nx, :n_out]
