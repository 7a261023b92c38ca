"""In-plane migration kernel for flat-lane cell layouts (DEM v6).

Re-bins (nx, F, C, NL) flat-lane planes after a substep cycle WITHOUT the
argsort/scatter/transpose pipeline: every particle has moved less than one
cell (the skin bound that already sets the rebuild cadence), so rebinning
is pure local data movement.  Three axis-split passes (z, y, x) run inside
ONE kernel invocation per row block:

  * z pass: each cell pulls its next occupants from {self, lane−1, lane+1}
    (the SZ guard lane between y columns absorbs the wrap),
  * y pass: {self, lane−SZ, lane+SZ} (the NL tail pads absorb),
  * x pass: {self, row−1, row+1} — plain slab-row slices, which is why the
    DMA fetches a (Bm+2)-row slab: the two ghost rows are z/y-migrated
    locally (row-local passes give identical results in every block that
    sees the row) and then feed the x pass of the block's own rows.

Within a pass, the 3·C candidates of a destination cell are ranked by an
unrolled exclusive prefix count over (R, 1, NL) slot planes, then placed
through slot-axis one-hots ((rank == slot_iota)·ok — one compare reused by
every feature, then one fma per (candidate, feature) on (R, C, NL)).  An
extra output plane carries the per-cell candidate count so the caller can
assert capacity overflow and particle conservation.

The reference re-sorts spheres into subdomains every step with atomics
(/root/reference/src/chrono_dem/gpu/ChDemSMC.cu:527-569: count / CUB scan /
fill).  The XLA formulation of this relabeling (jnp.roll + cumsum +
selects) measured 150-470 ms/pass at 1M on v5e with 10x run-to-run layout
variance; this kernel pins the data movement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_migrate_kernel(F_all, C, NL, SZ, Bm, nx, ny, nz, origin, inv_cell,
                         mask_idx):
    R = Bm + 2

    def kernel(feat_ref, out_ref, buf, st2, sem):
        b = pl.program_id(0)
        base = b * Bm
        cp = pltpu.make_async_copy(feat_ref.at[pl.ds(base, R)], buf, sem)
        cp.start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, NL), 2)
        cur_z = lane % SZ
        cur_y = lane // SZ
        cp.wait()

        def axis_pass(read, write, pos_f, cur, n_axis, o, src_of, nrows):
            # rank all 3·C candidates — only (nrows, 1, NL) planes stay
            # live across the feature loop (the (nrows, C, NL) one-hots are
            # rebuilt per feature: one compare per candidate, so register
            # pressure stays one feature's chain — the flatlane lesson)
            # int iota + cast: Mosaic rejects float-typed tpu.iota (the r3
            # hardware regression)
            slot_iota = jax.lax.broadcasted_iota(
                jnp.int32, (nrows, C, NL), 1).astype(jnp.float32)
            oks, ranks = [], []
            prefix = jnp.zeros((nrows, 1, NL), jnp.float32)
            srcs_pos = src_of(read(pos_f))
            srcs_msk = src_of(read(mask_idx))
            for s in range(3):
                dest = jnp.floor((srcs_pos[s] - o) * inv_cell).astype(
                    jnp.int32)
                dest = jnp.clip(dest, 0, n_axis - 1)
                okp = jnp.where(
                    (srcs_msk[s] > 0.5) & (dest == cur), 1.0, 0.0)
                for c in range(C):
                    oks.append(okp[:, c:c + 1])
                    ranks.append(prefix)
                    prefix = prefix + okp[:, c:c + 1]
            for f in range(F_all):
                srcs = src_of(read(f))
                acc = jnp.zeros((nrows, C, NL), jnp.float32)
                for k in range(3 * C):
                    hot = jnp.where(slot_iota == ranks[k], oks[k], 0.0)
                    acc = acc + hot * srcs[k // C][:, k % C:k % C + 1]
                write(f, acc)
            return prefix[:, 0]

        def lane_src(shift):
            def src_of(p):
                return [p, pltpu.roll(p, shift, 2),
                        pltpu.roll(p, (-shift) % NL, 2)]
            return src_of

        # z pass (buf -> st2) and y pass (st2 -> buf): row-local, computed
        # for the whole (Bm+2)-row slab so the ghost rows are consistent
        # with what the neighboring blocks compute for them
        cnt_z = axis_pass(lambda f: buf[:, f],
                          lambda f, v: st2.__setitem__((slice(None), f), v),
                          2, cur_z, nz, jnp.float32(origin[2]),
                          lane_src(1), R)
        cnt_y = axis_pass(lambda f: st2[:, f],
                          lambda f, v: buf.__setitem__((slice(None), f), v),
                          1, cur_y, ny, jnp.float32(origin[1]),
                          lane_src(SZ), R)

        # x pass: candidates are slab rows r−1, r, r+1 of the y-migrated
        # state; outputs only the Bm owned rows (slab rows 1..Bm)
        row = jax.lax.broadcasted_iota(jnp.int32, (Bm, 1, NL), 0) + base

        def row_src(p):
            return [p[1:Bm + 1], p[0:Bm], p[2:Bm + 2]]

        cnt_x = axis_pass(lambda f: buf[:, f],
                          lambda f, v: out_ref.__setitem__(
                              (slice(None), f), v),
                          0, row, nx, jnp.float32(origin[0]), row_src, Bm)

        # overflow/diagnostic plane: max candidate count over the 3 passes,
        # per (row, lane), broadcast over slots (caller asserts max−C ≤ 0)
        mx = jnp.maximum(jnp.maximum(cnt_z[1:Bm + 1], cnt_y[1:Bm + 1]),
                         cnt_x)
        out_ref[:, F_all] = jnp.broadcast_to(mx[:, None], (Bm, C, NL))

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "grid_dims", "SZ", "C", "Bm", "mask_idx", "origin", "cell_size",
    "interpret"))
def migrate_flat_pallas(feat, *, grid_dims, SZ, C, origin, cell_size,
                        Bm=2, mask_idx=9, interpret=False):
    """Migrate (nx, F_all, C, NL) flat-lane planes by one cell max per axis.

    Returns (planes', count_plane) where count_plane (nx, C, NL) holds the
    per-cell candidate count (max over the 3 passes, broadcast over slots);
    overflow = max(count) − C and a mask-sum conservation check are the
    caller's asserts.
    """
    nx, ny, nz = grid_dims
    F_all = feat.shape[1]
    NL = feat.shape[3]
    nx_pad = ((nx + Bm - 1) // Bm) * Bm
    pad_lo = jnp.zeros((1, F_all, C, NL), jnp.float32)
    pad_hi = jnp.zeros((nx_pad - nx + 1, F_all, C, NL), jnp.float32)
    feat_p = jnp.concatenate([pad_lo, feat, pad_hi], axis=0)
    kernel = _make_migrate_kernel(
        F_all, C, NL, SZ, Bm, nx, ny, nz, tuple(origin), 1.0 / cell_size,
        mask_idx)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx_pad, F_all + 1, C, NL),
                                       jnp.float32),
        grid=(nx_pad // Bm,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((Bm, F_all + 1, C, NL),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Bm + 2, F_all, C, NL), jnp.float32),
            pltpu.VMEM((Bm + 2, F_all, C, NL), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(feat_p)
    return out[:nx, :F_all], out[:nx, F_all]
