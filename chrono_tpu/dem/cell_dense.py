"""Cell-dense DEM force backend: gather-free, roll-based neighbor access.

The alternative hot-loop layout for TPU: instead of per-particle neighbor
lists (gathers of arbitrary rows — serialized on TPU), particles are binned
into a dense (ncx, ncy, ncz, C) cell tensor and the 27-neighborhood is reached
by ROLLING the cell tensor — pure static data movement the XLA/TPU memory
system streams at full bandwidth, followed by dense (C × C) pair blocks on the
VPU.  This trades ~C²·27 / (avg contacts) extra pair evaluations for the
complete elimination of gather/scatter — the classic MD-on-TPU tradeoff.

Mirrors the physics of chrono_tpu.dem.forces (Hertz–Mindlin, frictionless or
single-step friction; multi-step history needs slot-stable identity and stays
on the neighbor-list backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.collision.cell_list import GridSpec, cell_ijk
from chrono_tpu.dem.params import DEMParams, hertz_coefficients
from chrono_tpu.dem.forces import _pair_force


@pytree_dataclass
class CellField:
    """Particles scattered into dense per-cell slots."""

    pos: Array     # (nx, ny, nz, C, 3)
    vel: Array
    omega: Array
    mask: Array    # (nx, ny, nz, C) bool
    perm: Array    # (N,) particle → (cell, slot) flat index, for scatter-back
    overflow: Array


def to_cells(grid: GridSpec, capacity: int, pos, vel, omega,
             valid=None, bin_pos=None) -> CellField:
    """Bin particles into cell slots (sort + rank-in-cell, no atomics).

    ``valid``: optional (N,) mask — invalid rows (fixed-capacity buffer
    padding) are routed to a discard bucket instead of the clamped corner
    cell.  ``bin_pos``: optional positions used ONLY for the cell-index
    computation (the stored values stay ``pos``) — lets a sharded caller bin
    against a slab-local grid while keeping global coordinates in the field.
    """
    n = pos.shape[0]
    nx, ny, nz = grid.dims
    n_cells = nx * ny * nz
    ids = (lambda ijk: (ijk[..., 0] * ny + ijk[..., 1]) * nz + ijk[..., 2])(
        cell_ijk(grid, pos if bin_pos is None else bin_pos))
    if valid is not None:
        ids = jnp.where(valid, ids, n_cells)       # discard bucket
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    # rank within the cell = position − first-occurrence index
    first = jnp.searchsorted(ids_sorted, ids_sorted)
    rank = jnp.arange(n) - first
    real = ids_sorted < n_cells
    overflow = (jnp.maximum(
        jnp.max(jnp.where(real, rank, 0)) + 1 - capacity, 0)
        .astype(jnp.int32))
    slot = jnp.minimum(rank, capacity - 1)
    flat = ids_sorted * capacity + slot            # slot of sorted particle k
    perm = jnp.zeros((n,), flat.dtype).at[order].set(flat)  # original order
    n_flat = (n_cells + (1 if valid is not None else 0)) * capacity

    def scatter(x):
        out = jnp.zeros((n_flat,) + x.shape[1:], x.dtype)
        out = out.at[flat].set(x[order])[:n_cells * capacity]
        return out.reshape((nx, ny, nz, capacity) + x.shape[1:])

    mask = jnp.zeros((n_flat,), bool).at[flat].set(
        (rank < capacity) & real)[:n_cells * capacity].reshape(
        nx, ny, nz, capacity)
    return CellField(pos=scatter(pos), vel=scatter(vel), omega=scatter(omega),
                     mask=mask, perm=perm, overflow=overflow)


def from_cells(field: CellField, *arrays):
    """Gather per-particle values back out of the cell tensor (one gather at
    the END of the force pass, not per pair)."""
    outs = []
    for a in arrays:
        flat = a.reshape((-1,) + a.shape[4:])
        outs.append(flat[field.perm])
    return outs


_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]


def cell_dense_forces(params: DEMParams, grid: GridSpec, field: CellField):
    """Per-slot forces/torques from all 27 rolled neighbor blocks."""
    r = params.radius
    kn, gn, kt, gt = hertz_coefficients(params.material, 0.5 * params.mass,
                                        0.5 * r)
    nx, ny, nz = grid.dims
    C = field.pos.shape[3]
    pos, vel, omega, mask = field.pos, field.vel, field.omega, field.mask

    # non-periodic edge masks per axis offset
    def edge_ok(axis_len, off, axis):
        idx = jnp.arange(axis_len)
        if off == -1:
            ok = idx > 0
        elif off == 1:
            ok = idx < axis_len - 1
        else:
            ok = jnp.ones((axis_len,), bool)
        if grid.periodic[axis]:
            ok = jnp.ones((axis_len,), bool)
        return ok

    force = jnp.zeros_like(pos)
    torque = jnp.zeros_like(pos)

    for (dx, dy, dz) in _OFFSETS:
        npos = jnp.roll(pos, (-dx, -dy, -dz), axis=(0, 1, 2))
        nvel = jnp.roll(vel, (-dx, -dy, -dz), axis=(0, 1, 2))
        nomega = jnp.roll(omega, (-dx, -dy, -dz), axis=(0, 1, 2))
        nmask = jnp.roll(mask, (-dx, -dy, -dz), axis=(0, 1, 2))
        ok_cells = (edge_ok(nx, dx, 0)[:, None, None]
                    & edge_ok(ny, dy, 1)[None, :, None]
                    & edge_ok(nz, dz, 2)[None, None, :])

        # (nx,ny,nz, C_self, C_nbr, 3) pair displacements
        d = npos[..., None, :, :] - pos[..., :, None, :]
        dist2 = jnp.sum(d * d, axis=-1)
        dist = jnp.sqrt(dist2 + 1e-18)
        nvec = d / dist[..., None]
        overlap = 2.0 * r - dist
        pair_ok = (mask[..., :, None] & nmask[..., None, :]
                   & ok_cells[..., None, None] & (overlap > 0))
        if (dx, dy, dz) == (0, 0, 0):
            eye = jnp.eye(C, dtype=bool)
            pair_ok &= ~eye

        arm = r - 0.5 * overlap
        v_rel = (nvel[..., None, :, :]
                 + jnp.cross(nomega[..., None, :, :], -arm[..., None] * nvec)
                 - (vel[..., :, None, :]
                    + jnp.cross(omega[..., :, None, :], arm[..., None] * nvec)))
        xi0 = jnp.zeros_like(d)
        f_pair, _, _ = _pair_force(params, nvec, overlap, v_rel, xi0,
                                   pair_ok, kn, gn, kt, gt)
        force = force + jnp.sum(f_pair, axis=-2)
        torque = torque + jnp.sum(
            jnp.cross(arm[..., None] * nvec, f_pair), axis=-2)

    return force, torque


def field_to_planes(field: CellField):
    """CellField → (10, C, NC) feature planes for the Pallas kernel.

    Plane order: pos xyz, vel xyz, omega xyz, mask (see
    chrono_tpu.ops.pallas.dem_cell_kernel).
    """
    nx, ny, nz, C = field.mask.shape
    nc = nx * ny * nz

    def t(a):  # (nx,ny,nz,C,3) -> (3, C, NC)
        return a.reshape(nc, C, 3).transpose(2, 1, 0)

    mask = field.mask.reshape(nc, C).T[None].astype(jnp.float32)  # (1, C, NC)
    return jnp.concatenate([t(field.pos), t(field.vel), t(field.omega), mask],
                           axis=0)


def field_to_pencils(field: CellField, nzp: int):
    """CellField → (nx·ny, F, C, NZp) pencil planes for the v2 Pallas kernel
    (chrono_tpu.ops.pallas.dem_pencil_kernel): xy pencils lead, z fills the
    lane dimension padded to ``nzp`` (a 128 multiple > nz)."""
    nx, ny, nz, C = field.mask.shape

    def t(a):  # (nx,ny,nz,C,k) -> (nx·ny, k, C, nz)
        return a.reshape(nx * ny, nz, C, a.shape[-1]).transpose(0, 3, 2, 1)

    mask = field.mask.reshape(nx * ny, nz, C).transpose(0, 2, 1)[:, None]
    feat = jnp.concatenate(
        [t(field.pos), t(field.vel), t(field.omega),
         mask.astype(jnp.float32)], axis=1)            # (NXY, 10, C, nz)
    return jnp.pad(feat, ((0, 0), (0, 0), (0, 0), (0, nzp - nz)))


def field_to_flat(field: CellField, SZ: int, NL: int):
    """CellField → (nx, F, C, NL) flat-lane planes (lane = y·SZ + z) for the
    v5 kernel (chrono_tpu.ops.pallas.dem_flat_kernel): rows = x, the (y, z)
    plane packed into lanes with SZ − nz pad lanes splitting the z columns."""
    nx, ny, nz, C = field.mask.shape

    def t(a):  # (nx,ny,nz,C,k) -> (nx, k, C, ny·SZ)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, SZ - nz), (0, 0), (0, 0)))
        return a.reshape(nx, ny * SZ, C, a.shape[-1]).transpose(0, 3, 2, 1)

    mask = jnp.pad(field.mask, ((0, 0), (0, 0), (0, SZ - nz), (0, 0)))
    mask = mask.reshape(nx, ny * SZ, C).transpose(0, 2, 1)[:, None]
    feat = jnp.concatenate(
        [t(field.pos), t(field.vel), t(field.omega),
         mask.astype(jnp.float32)], axis=1)            # (nx, 10, C, ny·SZ)
    return jnp.pad(feat, ((0, 0), (0, 0), (0, 0), (0, NL - ny * SZ)))


def flat_to_particles(feat, field: CellField, grid_dims, C, SZ):
    """Flat-lane planes → per-particle (pos, vel, omega) via the binning
    perm."""
    nx, ny, nz = grid_dims

    def grab(f0):  # 3 consecutive planes -> (nx,ny,nz,C,3)
        a = feat[:, f0:f0 + 3, :, :ny * SZ]            # (nx, 3, C, ny·SZ)
        a = a.transpose(0, 3, 2, 1).reshape(nx, ny, SZ, C, 3)
        return a[:, :, :nz]

    return from_cells(field, grab(_F_PX), grab(_F_VX), grab(_F_WX))


def flat_single(a, grid_dims, SZ, NL):
    """One (nx, ny, nz, C) per-slot array → a (nx, 1, C, NL) flat-lane plane
    (same packing as :func:`field_to_flat`'s mask plane)."""
    nx, ny, nz, C = a.shape
    a = jnp.pad(a, ((0, 0), (0, 0), (0, SZ - nz), (0, 0)))
    a = a.reshape(nx, ny * SZ, C).transpose(0, 2, 1)[:, None]
    return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, NL - ny * SZ)))


def migrate_flat(feat, extra, *, grid: GridSpec, SZ: int, C: int,
                 mask_idx: int = 9, interpret: bool = False):
    """Re-bin flat-lane planes IN PLACE of the sort pipeline (v6).

    After a substep cycle every particle has moved less than one cell (the
    skin bound the re-binning cadence already enforces), so re-binning is
    pure LOCAL data movement: three axis-split passes (z, y, x), each
    pulling every cell's next occupants from {self, axis−1, axis+1} via two
    static rolls, ranking them with a prefix sum over the 3·C candidate
    slots, and placing them with rank-match selects.  No argsort, no
    scatter, no layout transpose — the whole cycle pipeline stays in
    (nx, F, C, NL) planes and the migration costs a fraction of one pair
    substep (the sort pipeline it replaces cost ~20 substeps at 1M).

    The reference instead re-sorts spheres into subdomains every step with
    atomics (/root/reference/src/chrono_dem/gpu/ChDemSMC.cu:527-569
    runSphereBroadphase: count/scan/fill); the TPU design exploits the
    skin-bounded displacement to replace the global sort with a 1-cell
    stencil relabeling.

    ``feat``: (nx, F, C, NL) with positions in planes 0..2 and the validity
    mask in plane ``mask_idx``.  ``extra``: optional (nx, E, C, NL) planes
    that migrate alongside (particle ids).  Returns (feat', extra', ovf)
    where ovf counts capacity overflow PLUS any particle lost to a >1-cell
    jump (conservation check) — both assert-worthy.
    """
    from chrono_tpu.ops.pallas.migrate_kernel import migrate_flat_pallas

    E = 0 if extra is None else extra.shape[1]
    A = feat if extra is None else jnp.concatenate([feat, extra], axis=1)
    F_all = A.shape[1]
    n_before = jnp.sum(A[:, mask_idx])
    A, count = migrate_flat_pallas(
        A, grid_dims=grid.dims, SZ=SZ, C=C, origin=tuple(grid.origin),
        cell_size=float(grid.cell_size), mask_idx=mask_idx,
        interpret=interpret)
    ovf = (jnp.max(count) - C).astype(jnp.int32)
    lost = (n_before - jnp.sum(A[:, mask_idx])).astype(jnp.int32)
    ovf = jnp.maximum(ovf, jnp.abs(lost))
    feat2 = A[:, :F_all - E] if E else A
    extra2 = A[:, F_all - E:] if E else None
    return feat2, extra2, ovf


def pencils_to_field_arrays(out, grid_dims, C):
    """(NXY, 6, C, NZp) kernel output → force/torque (nx,ny,nz,C,3)."""
    nx, ny, nz = grid_dims

    def back(a):  # (NXY, 3, C, NZp) -> (nx,ny,nz,C,3)
        return a[:, :, :, :nz].transpose(0, 3, 2, 1).reshape(
            nx, ny, nz, C, 3)

    return back(out[:, 0:3]), back(out[:, 3:6])


def pallas_pencil_forces(params: DEMParams, grid: GridSpec, field: CellField,
                         edge_table, nzp: int, Bxy: int = 8,
                         interpret: bool = False, coefs: dict = None):
    """Drop-in replacement for :func:`cell_dense_forces` running the v2
    (pencil-layout) Pallas kernel."""
    from chrono_tpu.ops.pallas.dem_pencil_kernel import (
        dem_pencil_forces_pallas,
    )

    if coefs is None:
        coefs = pallas_static_coefs(params)
    nx, ny, nz, C = field.mask.shape
    feat = field_to_pencils(field, nzp)
    out = dem_pencil_forces_pallas(
        feat, edge_table, grid_dims=(nx, ny, nz), C=C, Bxy=Bxy,
        interpret=interpret, **coefs)
    return pencils_to_field_arrays(out, (nx, ny, nz), C)


def wall_static_coefs(params: DEMParams) -> dict:
    """Concrete wall-contact Hertz coefficients (baked into the plane-layout
    wall pass)."""
    kn, gn, kt, gt = hertz_coefficients(params.wall_material, params.mass,
                                        params.radius)
    return dict(knw=float(kn), gnw=float(gn), ktw=float(kt), gtw=float(gt),
                muw=float(params.wall_material.mu_s))


# feature-plane indices (must match ops.pallas.dem_pencil_kernel)
(_F_PX, _F_PY, _F_PZ, _F_VX, _F_VY, _F_VZ,
 _F_WX, _F_WY, _F_WZ, _F_MASK) = range(10)


def pencils_to_particles(feat, field: CellField, grid_dims, C, nz):
    """Pencil planes → per-particle (pos, vel, omega) via the binning perm."""
    nx, ny, _ = grid_dims

    def grab(f0):  # 3 consecutive planes -> (nx,ny,nz,C,3)
        return feat[:, f0:f0 + 3, :, :nz].transpose(0, 3, 2, 1).reshape(
            nx, ny, nz, C, 3)

    return from_cells(field, grab(_F_PX), grab(_F_VX), grab(_F_WX))


def pallas_static_coefs(params: DEMParams) -> dict:
    """Concrete (python-float) Hertz coefficients for the Pallas kernel.

    Must be called OUTSIDE any traced region (the kernel bakes them in as
    compile-time constants — the same role as the reference's unified-memory
    GranParams, ChDemSMC.cuh)."""
    kn, gn, kt, gt = hertz_coefficients(params.material, 0.5 * params.mass,
                                        0.5 * params.radius)
    return dict(radius=float(params.radius), kn=float(kn), gn=float(gn),
                kt=float(kt), gt=float(gt), mu=float(params.material.mu_s),
                dt=float(params.dt),
                friction=params.friction_mode != "frictionless")


def pallas_cell_forces(params: DEMParams, grid: GridSpec, field: CellField,
                       edge_table, B: int = 256, interpret: bool = False,
                       coefs: dict = None):
    """Drop-in replacement for :func:`cell_dense_forces` running the Pallas
    kernel (frictionless / single-step friction)."""
    from chrono_tpu.ops.pallas.dem_cell_kernel import dem_cell_forces_pallas

    if coefs is None:
        coefs = pallas_static_coefs(params)
    nx, ny, nz, C = field.mask.shape
    nc = nx * ny * nz
    feat = field_to_planes(field)
    out = dem_cell_forces_pallas(
        feat, edge_table, grid_dims=(nx, ny, nz), C=C, B=B,
        interpret=interpret, **coefs)                         # (6, C, NC)

    def back(a):  # (3, C, NC) -> (nx,ny,nz,C,3)
        return a.transpose(2, 1, 0).reshape(nx, ny, nz, C, 3)

    return back(out[0:3]), back(out[3:6])


def make_cell_dense_advance(params: DEMParams, bcs, grid: GridSpec,
                            capacity: int = 8, backend: str = "xla",
                            pallas_block: int = None,
                            pallas_interpret: bool = False,
                            migrate: bool = False):
    """Jitted advance using the cell-dense backend (frictionless/single-step).

    One cycle = re-bin + ``rebuild_every`` substeps (re-binning is just a sort,
    so it can afford to run every cycle with a small skin).
    ``backend``: "xla" (27-roll dense blocks) or "pallas" (explicit TPU kernel,
    chrono_tpu.ops.pallas.dem_cell_kernel).  ``migrate=True`` (flat backend
    only) replaces the per-cycle sort rebuild with in-plane migration
    (:func:`migrate_flat`) and fuses the whole run into one program.
    """
    from chrono_tpu.dem.forces import wall_forces
    from chrono_tpu.dem.system import _n_walls

    if params.friction_mode == "multi_step":
        params = params.replace(friction_mode="single_step")

    nb = _n_walls(bcs)
    if pallas_block is None:
        pallas_block = 8 if backend in ("pencil", "sym", "flat") else 256
    if backend == "pallas":
        from chrono_tpu.ops.pallas.dem_cell_kernel import edge_ok_table
        edge_table = edge_ok_table(grid.dims, tuple(grid.periodic))
        coefs = pallas_static_coefs(params)   # concrete, outside the trace
    elif backend in ("pencil", "sym", "flat"):
        from chrono_tpu.ops.pallas.dem_pencil_kernel import edge_ok_xy
        from chrono_tpu.ops.pallas.dem_sym_kernel import edge_ok_fwd
        if any(grid.periodic):
            raise ValueError("pencil backend supports non-periodic boxes")
        edge_table = (None if backend == "flat"
                      else edge_ok_fwd(grid.dims) if backend == "sym"
                      else edge_ok_xy(grid.dims))
        coefs = pallas_static_coefs(params)
        nzp = ((grid.dims[2] + 1 + 127) // 128) * 128
        # flat-lane layout geometry: SZ pads z with one guard lane, NL
        # leaves headroom for the largest forward roll (SZ + 1)
        flat_SZ = grid.dims[2] + 1
        flat_NL = ((grid.dims[1] * flat_SZ + flat_SZ + 1 + 127)
                   // 128) * 128
    elif backend != "xla":
        raise ValueError(f"unknown cell-dense backend {backend!r}")

    if backend in ("pencil", "sym", "flat"):
        # whole-substep plane pipeline: pair kernel + wall pass + integration
        # all stay in (NXY, ·, C, NZp) planes (minor dims = one (8,128) vreg)
        if bcs.cylinders is not None or bcs.spheres is not None \
                or bcs.cones is not None:
            raise ValueError("pencil backend currently supports plane BCs")
        from chrono_tpu.ops.pallas.dem_pencil_kernel import (
            dem_pencil_substep_pallas,
        )
        from chrono_tpu.ops.pallas.dem_sym_kernel import (
            dem_sym_substep_pallas,
        )
        from chrono_tpu.ops.pallas.dem_flat_kernel import (
            dem_flat_substep_pallas,
        )
        substep_pallas = (dem_flat_substep_pallas if backend == "flat"
                          else dem_sym_substep_pallas if backend == "sym"
                          else dem_pencil_substep_pallas)
        import numpy as _np

        wc = wall_static_coefs(params)
        wall_coefs = (wc["knw"], wc["gnw"], wc["ktw"], wc["gtw"], wc["muw"])
        pn = _np.asarray(bcs.planes.normal, float)
        pp = _np.asarray(bcs.planes.point, float)
        pv = _np.asarray(bcs.planes.vel, float)
        walls = tuple(
            (tuple(pn[b]), float(pn[b] @ pp[b]), tuple(pv[b]))
            for b in range(pn.shape[0]))
        gvec = tuple(float(v) for v in _np.asarray(params.gravity))
        fused_kw = dict(walls=walls, wall_coefs=wall_coefs, gravity=gvec,
                        inv_m=1.0 / float(params.mass),
                        inv_I=1.0 / float(params.inertia))

        def one_cycle(carry, _):
            pos, vel, omega = carry
            field = to_cells(grid, capacity, pos, vel, omega)
            if backend == "flat":
                feat0 = field_to_flat(field, flat_SZ, flat_NL)
            else:
                feat0 = field_to_pencils(field, nzp)

            def substep(feat, __):
                if backend == "flat":
                    feat2 = substep_pallas(
                        feat, grid_dims=grid.dims, SZ=flat_SZ, C=capacity,
                        Bxy=pallas_block, interpret=pallas_interpret,
                        **coefs, **fused_kw)
                else:
                    feat2 = substep_pallas(
                        feat, edge_table, grid_dims=grid.dims, C=capacity,
                        Bxy=pallas_block, interpret=pallas_interpret,
                        **coefs, **fused_kw)
                return feat2, None

            feat, _ = lax.scan(substep, feat0, None,
                               length=params.rebuild_every)
            if backend == "flat":
                p, v, o = flat_to_particles(feat, field, grid.dims,
                                            capacity, flat_SZ)
            else:
                p, v, o = pencils_to_particles(feat, field, grid.dims,
                                               capacity, grid.dims[2])
            return (p, v, o), field.overflow

        cycle_jit = jax.jit(lambda p, v, o: one_cycle((p, v, o), None))

        if backend == "flat" and migrate:
            # v6: the whole run is ONE program — bin once, then scan cycles
            # of [K substeps + in-plane migration] (migrate_flat replaces
            # the argsort/scatter/transpose rebuild, which cost ~20
            # substeps per cycle at 1M), unbin once at the end via a
            # carried particle-id plane.  Plane-shaped scan carries are
            # (8,128)-tile native, so the scan relayout disease of (N,3)
            # carries does not apply.
            def substep_m(feat, __):
                feat2 = substep_pallas(
                    feat, grid_dims=grid.dims, SZ=flat_SZ, C=capacity,
                    Bxy=pallas_block, interpret=pallas_interpret,
                    **coefs, **fused_kw)
                return feat2, None

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def cycle_m(feat, ids, ovf):
                feat, _ = lax.scan(substep_m, feat, None,
                                   length=params.rebuild_every)
                feat, ids, ov = migrate_flat(feat, ids, grid=grid,
                                             SZ=flat_SZ, C=capacity,
                                             interpret=pallas_interpret)
                return feat, ids, jnp.maximum(ovf, ov)

            @jax.jit
            def bin_m(pos, vel, omega):
                n = pos.shape[0]
                field = to_cells(grid, capacity, pos, vel, omega)
                feat = field_to_flat(field, flat_SZ, flat_NL)
                nx, ny, nz = grid.dims
                id_arr = jnp.zeros((nx * ny * nz * capacity,), jnp.float32)
                id_arr = id_arr.at[field.perm].set(
                    jnp.arange(n, dtype=jnp.float32))
                ids = flat_single(
                    id_arr.reshape(nx, ny, nz, capacity), grid.dims,
                    flat_SZ, flat_NL)
                return feat, ids, field.overflow

            @functools.partial(jax.jit, static_argnums=2)
            def unbin_m(feat, ids, n: int):
                # unbin: scatter by the carried ids (invalid slots → row n)
                valid = feat[:, _F_MASK].reshape(-1) > 0.5
                idx = jnp.where(valid, ids[:, 0].reshape(-1), n) \
                    .astype(jnp.int32)

                def unbin(f0):
                    vals = feat[:, f0:f0 + 3].transpose(0, 2, 3, 1) \
                        .reshape(-1, 3)
                    return jnp.zeros((n + 1, 3), vals.dtype) \
                        .at[idx].set(vals)[:n]

                return unbin(_F_PX), unbin(_F_VX), unbin(_F_WX)

            def advance(pos, vel, omega, n_cycles: int):
                # one compiled program per PHASE (bin / cycle / unbin), a
                # python loop over cycles: a static n_cycles would bake the
                # cycle count into the program and recompile per call
                feat, ids, ovf = bin_m(pos, vel, omega)
                for _ in range(n_cycles):
                    feat, ids, ovf = cycle_m(feat, ids, ovf)
                p, v, o = unbin_m(feat, ids, pos.shape[0])
                return p, v, o, ovf

            return advance

        def advance(pos, vel, omega, n_cycles: int):
            # python loop over cycles, ONE compiled program per cycle: a
            # lax.scan here makes XLA carry the (N, 3) particle arrays in
            # (8,128)-tiled loop buffers — 42x lane padding whose per-cycle
            # relayout copies cost more than the physics (measured ~1.1 s
            # per cycle at N=1M on v5e)
            ovf = jnp.zeros((), jnp.int32)
            for _ in range(n_cycles):
                (pos, vel, omega), ov = cycle_jit(pos, vel, omega)
                ovf = jnp.maximum(ovf, ov)
            return pos, vel, omega, ovf

        return advance

    def one_cycle(carry, _):
        pos, vel, omega = carry
        field = to_cells(grid, capacity, pos, vel, omega)

        def substep(f, __):
            if backend == "pallas":
                frc, trq = pallas_cell_forces(params, grid, f, edge_table,
                                              pallas_block, pallas_interpret,
                                              coefs)
            else:
                frc, trq = cell_dense_forces(params, grid, f)
            f_w, tau_w, _, _ = wall_forces(
                params, bcs,
                f.pos.reshape(-1, 3), f.vel.reshape(-1, 3),
                f.omega.reshape(-1, 3),
                jnp.zeros((f.pos.size // 3, nb, 3), f.pos.dtype))
            sh = f.pos.shape[:-1]
            acc = ((frc + f_w.reshape(sh + (3,))) / params.mass
                   + params.gravity)
            alpha = (trq + tau_w.reshape(sh + (3,))) / params.inertia
            m = f.mask[..., None]
            vel2 = jnp.where(m, f.vel + params.dt * acc, f.vel)
            om2 = jnp.where(m, f.omega + params.dt * alpha, f.omega)
            pos2 = jnp.where(m, f.pos + params.dt * vel2, f.pos)
            return f.replace(pos=pos2, vel=vel2, omega=om2), None

        field, _ = lax.scan(substep, field, None,
                            length=params.rebuild_every)
        p, v, o = from_cells(field, field.pos, field.vel, field.omega)
        return (p, v, o), field.overflow

    @functools.partial(jax.jit, static_argnums=3)
    def advance(pos, vel, omega, n_cycles: int):
        (p, v, o), ovs = lax.scan(one_cycle, (pos, vel, omega), None,
                                  length=n_cycles)
        return p, v, o, ovs.max()

    return advance
