"""Whole-outer VMEM-resident CRM kernel (flat-lane layout).

The per-sweep dual kernel (ops.pallas.flatlane_dual_kernel) pays a fixed
per-`pallas_call` cost (~3.5 ms measured on the tunneled v5e) times
2 sweeps x n_substeps = 8 calls per coupled outer step — half the capstone
budget at the demo scale, where ALL the planes of the terrain bed fit in
VMEM (~7 MB vs the 128 MB v5e VMEM).  This kernel runs the ENTIRE outer
step's substep loop in ONE pallas call:

  * the feature planes live in VMEM scratch for the whole call,
  * the grid is (2·n_substeps,) — one SEQUENTIAL grid step per sweep
    (M momentum on even steps, G gradv/continuity/plasticity on odd),
    selected with pl.when on the program id; scratch persists across grid
    steps, so the compiled code is ONE sweep pair regardless of
    n_substeps (a fori_loop/dual-field variant of this kernel blew Mosaic
    compile past 25 min; this form compiles like the shipping per-sweep
    kernels),
  * reaction scatter needs no rolling window: with every row resident the
    react accumulator simply covers all rows (+1 ghost),
  * the derived per-marker planes (1/rho^2, 1/rho) are recomputed in VMEM
    between sweeps instead of re-binned through HBM,
  * the last M sweep's granular acceleration is emitted as three extra
    output planes (the ``dv_mode="last"`` BCE-reduction input).

SINGLE field: the caller concatenates the dual-field (A|B) slot planes —
without per-row activity gating (irrelevant once the air rows are
statically trimmed, see below) a two-field split costs exactly
(CA+CB)² pair slots anyway, so the merged field is the same FLOPs at half
the code.  The air rows above the bed (statically empty under the clip_z
active-domain trick) are trimmed OUTSIDE the call — the caller passes only
the active rows and asserts the trim via row occupancy
(fsi.sph.crm_pencil / fsi.crm_terrain).

Physics closures are shared verbatim with ops.pallas.crm_sym_kernel
(_crm_phys) — parity with the per-sweep engine is structural, tested in
tests/test_crm.py.  Reference hot loop this replaces:
/root/reference/src/chrono_fsi/sph/physics/SphForceWCSPH.cu CrmRHS:1396
(+ the per-kernel-launch overhead economics of
demo_VEH_CRMTerrain_WheeledVehicle.cpp's explicit substeps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chrono_tpu.ops.pallas.flatlane_dual_kernel import _shifts

_F = 16          # CRM feature planes (crm_sym_kernel layout)
_FD = 17         # + derived plane (1/rho^2 for M, 1/rho for G)
_VAL = 15
_RHO = 6
_NACC = 10       # G sweep accumulator channels (max of the two sweeps)


def _make_outer_kernel(R, C, NL, SZ, n_dz, n_sweeps,
                       pairM, postM, pairG, postG):
    """R = active rows (planes carry R+1 with one zero ghost row)."""
    CS = min(8, C)
    n_ch = C // CS
    assert C % CS == 0
    shifts = _shifts(SZ, n_dz)

    def kernel(in_ref, out_ref, sC, react, accS, asv):
        t = pl.program_id(0)
        even = t % 2 == 0

        @pl.when(t == 0)
        def _load():
            sC[:, 0:_F] = in_ref[...]

        @pl.when(even)
        def _deriveM():
            r = sC[:, _RHO]
            sC[:, _F] = 1.0 / jnp.maximum(r * r, 1e-9)

        @pl.when(jnp.logical_not(even))
        def _deriveG():
            r = sC[:, _RHO]
            sC[:, _F] = 1.0 / jnp.maximum(r, 1e-9)

        react[...] = jnp.zeros((R + 1, _NACC, C, NL), jnp.float32)
        accS[...] = jnp.zeros((R, _NACC, C, NL), jnp.float32)

        def chunks_of():
            slab = sC[0:R]
            return [[slab[:, f, c * CS:(c + 1) * CS][:, :, None, :]
                     for f in range(_FD)] for c in range(n_ch)]

        def tri_of(c0):
            return (jax.lax.broadcasted_iota(jnp.int32, (CS, C, NL), 0) + c0
                    < jax.lax.broadcasted_iota(jnp.int32, (CS, C, NL), 1)
                    ).astype(jnp.float32)

        def sweep(s_chunks, off, shift, tri, n_acc, pair_fn, tok):
            """(self chunks) x (rows [off, off+R) at lane shift).

            Same chain-serializing token scheme as flatlane_dual_kernel:
            ``tok`` is exactly 0.0 in a finite run and rides the neighbor
            planes, forcing Mosaic to order the shift chains instead of
            keeping every chain's temporaries live at once."""
            dep = jnp.where(jnp.isfinite(tok), 0.0, tok)
            slab = sC[off:off + R]
            rsum = [jnp.zeros((R, C, NL), jnp.float32)
                    for _ in range(n_acc)]
            outs = []
            for c, s in enumerate(s_chunks):
                n = [((slab[:, f] if shift == 0 else
                       pltpu.roll(slab[:, f], (-shift) % NL, 2))
                      + dep)[:, None]
                     for f in range(_FD)]
                ok = s[_VAL] * n[_VAL]
                if tri:
                    ok = ok * tri_of(c * CS)[None]
                ts, tr = pair_fn(s, n, ok)
                outs.append(tuple(jnp.sum(ts[a], axis=2)
                                  for a in range(n_acc)))
                for a in range(n_acc):
                    rsum[a] = rsum[a] + jnp.sum(tr[a], axis=1)
            accS[:, 0:n_acc] += jnp.stack(
                [jnp.concatenate([o[a] for o in outs], axis=1)
                 for a in range(n_acc)], axis=1)
            if shift != 0:
                rsum = [pltpu.roll(r, shift % NL, 2) for r in rsum]
            stk = jnp.stack(rsum, axis=1)
            react[off:off + R, 0:n_acc] += stk
            return jnp.sum(stk[:, 0, 0])

        def run_sweep(pair_fn, n_acc):
            cC = chunks_of()
            tok = sweep(cC, 0, 0, True, n_acc, pair_fn,
                        jnp.zeros((), jnp.float32))
            for off, sh in shifts:
                tok = sweep(cC, off, sh, False, n_acc, pair_fn, tok)
            # anchor the final token (exact 0.0 when finite)
            react[0, 0] += jnp.full(
                (C, NL), jnp.where(jnp.isfinite(tok), 0.0, tok),
                jnp.float32)
            return tuple(accS[:, a] + react[0:R, a] for a in range(n_acc))

        def post_into(post_fn, acc, idxs):
            planes0 = [sC[0:R, f] for f in range(_FD)]
            outs = post_fn(planes0, acc)
            for f, o in zip(idxs, outs):
                sC[0:R, f] = o

        @pl.when(even)
        def _sweepM():
            aM = run_sweep(pairM, 3)
            asv[...] = jnp.stack(aM, axis=1)      # dv_mode="last" planes
            post_into(postM, aM, (3, 4, 5))

        @pl.when(jnp.logical_not(even))
        def _sweepG():
            aG = run_sweep(pairG, _NACC)
            post_into(postG, aG, (0, 1, 2, 6, 7, 8, 9, 10, 11, 12))

        @pl.when(t == n_sweeps - 1)
        def _store():
            out_ref[:, 0:_F] = sC[0:R, 0:_F]
            out_ref[:, _F:_F + 3] = asv[...]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "cp", "grid_dims", "SZ", "CA", "CB", "n_dz", "n_substeps", "nx_act",
    "interpret"))
def crm_outer_substeps(featA, featB, *, cp, grid_dims, SZ, CA, CB,
                       n_substeps, nx_act=None, n_dz=1, interpret=False):
    """Run ``n_substeps`` fused CRM substeps in ONE pallas call.

    featA: (nx, 16, CA, NL), featB: (nx, 16, CB, NL) — the dual flat-lane
    planes of fsi.sph.pencil.bin_to_flat_dual (concatenated into one
    C = CA + CB field inside; same cell, more slots).  Returns
    ((outA, outB), (accA, accB)): planes [0:16] the post-substep features
    plus the LAST substep's M-sweep granular acceleration (evaluated at
    its pre-substep state — the dv_mode="last" contract of
    fsi.crm_terrain.make_crm_fsi_advance_persistent).

    ``nx_act``: static count of active rows (all markers live in rows
    [0, nx_act) — the caller asserts this via row occupancy; rows beyond
    are passed through untouched).
    """
    from chrono_tpu.ops.pallas.crm_sym_kernel import _crm_phys

    nx, ny, nz = grid_dims
    NL = featA.shape[3]
    if featA.shape[1] != _F or featB.shape[1] != _F:
        raise ValueError("expected 16 CRM feature planes")
    if NL % 128 or NL < ny * SZ + SZ + n_dz:
        raise ValueError("bad lane geometry")
    R = int(nx_act) if nx_act is not None else nx
    R = min(R, nx)
    C = CA + CB

    pairM, postM, pairG, postG, _ = _crm_phys(cp, with_acc=False)

    fC = jnp.concatenate([featA[0:R], featB[0:R]], axis=2)
    fC = jnp.concatenate(
        [fC, jnp.zeros((1, _F, C, NL), jnp.float32)], axis=0)

    n_sweeps = 2 * n_substeps
    kernel = _make_outer_kernel(R, C, NL, SZ, n_dz, n_sweeps,
                                pairM, postM, pairG, postG)
    n_off = len(_shifts(SZ, n_dz)) + 1
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, _F + 3, C, NL), jnp.float32),
        grid=(n_sweeps,),
        in_specs=[pl.BlockSpec((R + 1, _F, C, NL), lambda t: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, _F + 3, C, NL), lambda t: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R + 1, _FD, C, NL), jnp.float32),
            pltpu.VMEM((R + 1, _NACC, C, NL), jnp.float32),
            pltpu.VMEM((R, _NACC, C, NL), jnp.float32),
            pltpu.VMEM((R, 3, C, NL), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(90 * n_substeps * n_off * C * C * R * NL),
            bytes_accessed=int(2 * _F * C * NL * R * 4),
            transcendentals=int(4 * n_substeps * n_off * C * R * NL),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(fC)

    fA2 = jnp.concatenate([out[:, 0:_F, 0:CA], featA[R:]], axis=0)
    fB2 = jnp.concatenate([out[:, 0:_F, CA:C], featB[R:]], axis=0)
    accA = jnp.concatenate(
        [out[:, _F:_F + 3, 0:CA],
         jnp.zeros((nx - R, 3, CA, NL), jnp.float32)], axis=0)
    accB = jnp.concatenate(
        [out[:, _F:_F + 3, CA:C],
         jnp.zeros((nx - R, 3, CB, NL), jnp.float32)], axis=0)
    return (fA2, fB2), (accA, accB)
