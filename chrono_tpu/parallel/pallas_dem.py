"""Sharded DEM on the flat-lane Pallas engine: the fast path, scaled out.

``parallel.domains.make_sharded_dem_advance`` shards the gather/XLA backend;
this module runs the SAME slab decomposition + ICI collectives around the
flat-lane symmetric Pallas kernel (`ops.pallas.dem_flat_kernel`) — the engine
that produces the headline bench numbers — so the multi-chip path and the
measured path are one engine.

Layout mapping (why this composition is natural on TPU):

  * the flat-lane feature array is (nx, F, C, NL) with **rows = x** — an
    x-slab decomposition is a contiguous row range, so a slab's halo is ONE
    row on each side;
  * the kernel's half stencil keeps dx ∈ {0, +1}: row r's sweep evaluates
    pair (r, r+1) once, keeping the force on r and scattering the Newton
    reaction to r+1 through the rolling window.  With a left halo row (the
    left neighbor's last owned row) at index 0 and a right halo row at
    index nxl+1, every OWNED row receives complete forces: the left halo's
    sweep scatters reactions into owned row 1, and owned row nxl keeps its
    own force against the right halo.  Cross-face pairs are evaluated twice
    (once per device) — duplicated FLOPs on one row out of nxl, zero extra
    communication rounds;
  * per-substep halo refresh = ONE ``lax.ppermute`` of a (F, C, NL) plane
    per direction — the neighbor's updated edge row replaces the halo row
    (fp32 plane of ~10·C·NL values: latency-bound on ICI, negligible vs the
    pair sweep).  Halo rows are integrated by the kernel with incomplete
    forces and immediately overwritten, so no masking pass is needed;
  * migration happens once per rebuild cycle in particle space through the
    shared ``parallel.domains.make_exchange`` machinery (particles move at
    most one slab per cycle — same skin argument as the re-binning cadence).

Positions stay GLOBAL in the feature planes (the static plane walls are
baked into the kernel as compile-time constants, identical on every device);
binning uses slab-local shifted coordinates against a per-slab local grid so
the (nx_local, ny, nz) bins line up across devices.  For pod-scale domains
compose with ``SlabSpec.local_coords`` upstream (see domains.py) — not yet
wired here.

The reference has no multi-GPU DEM at all (chrono_dem is single-device,
/root/reference/src/chrono_dem/gpu/ChDemSMC.cuh); this path is the TPU
framework's scale-out differentiator (SURVEY §5).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.parallel.domains import SlabSpec, make_exchange
from chrono_tpu.dem.cell_dense import (
    to_cells, field_to_flat, flat_to_particles, pallas_static_coefs,
    wall_static_coefs,
)


def make_sharded_flat_dem_advance(spec: SlabSpec, mesh: Mesh, params,
                                  boundaries, grid: GridSpec,
                                  capacity: int = 8, axis: str = "dp",
                                  pallas_block: int = 8,
                                  interpret: bool = False):
    """Sharded DEM advance on the flat-lane Pallas engine.

    ``grid``: GLOBAL grid covering the whole domain; ``grid.dims[0]`` must
    be divisible by ``spec.n_slabs`` and ``spec.width`` must equal
    ``nx_local · cell`` (slab faces on cell boundaries).  Frictionless or
    single-step friction (the cell-dense contract).  Returns
    ``advance(pos, vel, omega, valid, n_cycles) -> (pos, vel, omega, valid,
    overflow)`` over (D, C, ·) slab buffers (see ``domains.distribute``).
    """
    D = spec.n_slabs
    nx, ny, nz = grid.dims
    if nx % D:
        raise ValueError(f"grid nx={nx} not divisible by {D} slabs")
    nxl = nx // D
    cell = float(grid.cell_size)
    if abs(spec.width - nxl * cell) > 1e-6 * cell:
        raise ValueError("spec.width must equal nx_local * cell_size")
    if abs(spec.x0 - grid.origin[0]) > 1e-6 * cell:
        raise ValueError("spec.x0 must equal grid.origin[0]")
    if any(grid.periodic):
        raise ValueError("flat backend supports non-periodic boxes")
    if boundaries.cylinders is not None or boundaries.spheres is not None \
            or boundaries.cones is not None:
        raise ValueError("flat backend currently supports plane BCs")

    from chrono_tpu.ops.pallas.dem_flat_kernel import dem_flat_substep_pallas

    lgrid = GridSpec(origin=(0.0, grid.origin[1], grid.origin[2]),
                     cell_size=cell, dims=(nxl, ny, nz))
    SZ = nz + 1
    NL = ((ny * SZ + SZ + 1 + 127) // 128) * 128
    kdims = (nxl + 2, ny, nz)          # owned rows + 1 halo row each side

    coefs = pallas_static_coefs(params)
    wc = wall_static_coefs(params)
    wall_coefs = (wc["knw"], wc["gnw"], wc["ktw"], wc["gtw"], wc["muw"])
    pn = np.asarray(boundaries.planes.normal, float)
    pp = np.asarray(boundaries.planes.point, float)
    pv = np.asarray(boundaries.planes.vel, float)
    walls = tuple((tuple(pn[b]), float(pn[b] @ pp[b]), tuple(pv[b]))
                  for b in range(pn.shape[0]))
    gvec = tuple(float(v) for v in np.asarray(params.gravity))
    fused_kw = dict(walls=walls, wall_coefs=wall_coefs, gravity=gvec,
                    inv_m=1.0 / float(params.mass),
                    inv_I=1.0 / float(params.inertia))

    exchange = make_exchange(spec, axis, n_halo_extra_cols=0)
    right_perm = [(i, i + 1) for i in range(D - 1)]
    left_perm = [(i + 1, i) for i in range(D - 1)]

    def fill_halos(feat):
        """Replace the 2 halo rows with the neighbors' edge OWNED rows
        (one (F, C, NL) plane per direction; zero-filled ⇒ mask 0 at the
        domain ends)."""
        from_left = lax.ppermute(feat[nxl], axis, right_perm)
        from_right = lax.ppermute(feat[1], axis, left_perm)
        return jnp.concatenate(
            [from_left[None], feat[1:nxl + 1], from_right[None]], axis=0)

    def device_cycle(pos, vel, extra, valid):
        squeeze = pos.ndim == 3
        if squeeze:
            pos, vel, extra, valid = pos[0], vel[0], extra[0], valid[0]
        # ---- migration (particle space, once per cycle) ----
        (pos, vel, extra, valid, _hp, _hv, _hx, _hm, _hi,
         mig_overflow) = exchange(pos, vel, extra, valid)
        omega = extra[:, 0:3]

        # ---- bin against the slab-local grid, store global coords ----
        d = lax.axis_index(axis)
        x_shift = jnp.asarray(
            [spec.x0, 0.0, 0.0], pos.dtype) + jnp.asarray(
            [spec.width, 0.0, 0.0], pos.dtype) * d.astype(pos.dtype)
        field = to_cells(lgrid, capacity, pos, vel, omega,
                         valid=valid, bin_pos=pos - x_shift)
        feat = field_to_flat(field, SZ, NL)            # (nxl, 10, C, NL)
        feat = jnp.pad(feat, ((1, 1), (0, 0), (0, 0), (0, 0)))
        feat = fill_halos(feat)

        def substep(f, __):
            f2 = dem_flat_substep_pallas(
                f, grid_dims=kdims, SZ=SZ, C=capacity, Bxy=pallas_block,
                interpret=interpret, **coefs, **fused_kw)
            return fill_halos(f2), None

        feat, _ = lax.scan(substep, feat, None,
                           length=params.rebuild_every)

        p, v, o = flat_to_particles(feat[1:nxl + 1], field,
                                    (nxl, ny, nz), capacity, SZ)
        # invalid buffer rows gathered garbage through the discard bucket —
        # restore the fill convention
        p = jnp.where(valid[:, None], p, 1e30)
        v = jnp.where(valid[:, None], v, 0.0)
        o = jnp.where(valid[:, None], o, 0.0)
        overflow = jnp.maximum(mig_overflow, field.overflow)
        if squeeze:
            return p[None], v[None], o[None], valid[None], overflow[None]
        return p, v, o, valid, overflow

    sharded = shard_map(
        device_cycle, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,   # pallas_call out_shape carries no vma info
    )
    cycle_jit = jax.jit(sharded)

    def advance(pos, vel, omega, valid, n_cycles: int):
        ovf = jnp.zeros((), jnp.int32)
        for _ in range(n_cycles):
            pos, vel, omega, valid, ov = cycle_jit(pos, vel, omega, valid)
            ovf = jnp.maximum(ovf, ov.max())
        return pos, vel, omega, valid, ovf

    return advance
