"""Spatial domain decomposition for particle systems (DEM/SPH) over a device
mesh: slab ownership + halo exchange + migration, all inside ``shard_map``.

This is the TPU-native answer to the reference's spatial-scaling machinery
(SURVEY §5: DEM subdomains with int-local coordinates, FSI active domains,
moving patches — all single-GPU) and to what MPI domain decomposition would be
elsewhere: the domain is split into slabs along x, one per mesh device; each
device owns a fixed-capacity particle buffer and, per rebuild cycle,

  1. MIGRATES emigrants to neighbor devices (``lax.ppermute`` of fixed-size
     send buffers — particles move at most one slab per cycle), and
  2. imports HALO copies of neighbor particles within the interaction cutoff
     of the slab faces (also ppermute),

then runs the ordinary local force pipeline on owned+halo particles.  All
buffers are static-shape with validity masks, so the whole exchange compiles
into a handful of ICI collectives — no host involvement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from chrono_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class SlabSpec:
    """Static decomposition along x: device d owns [x0 + d·w, x0 + (d+1)·w).

    ``local_coords``: store x RELATIVE to the owning slab's origin (x ∈
    [0, w)) instead of globally — the fp32 answer to the reference's
    int64 fixed-point subdomain-local coordinates
    (/root/reference/src/chrono_dem/gpu/ChDemDefines.h int3 SD coords):
    at pod-scale domains (x ~ 10⁶ m) a global fp32 x has ~6 cm resolution
    while slab-local keeps ~1e-7·width everywhere.  Migration/halo sends
    re-express x in the receiver's frame (±width); y/z stay global."""

    x0: float = static_field(default=0.0)
    width: float = static_field(default=1.0)     # slab width
    n_slabs: int = static_field(default=1)
    capacity: int = static_field(default=1024)   # owned-particle slots/device
    halo_capacity: int = static_field(default=256)
    migrate_capacity: int = static_field(default=128)
    cutoff: float = static_field(default=0.1)    # halo width
    local_coords: bool = static_field(default=False)


class ShardedParticles(NamedTuple):
    """Per-device particle buffers (leading axis = device when outside
    shard_map; inside, each device sees its own (capacity, …) slice)."""

    pos: jnp.ndarray     # (D, C, 3)
    vel: jnp.ndarray     # (D, C, 3)
    valid: jnp.ndarray   # (D, C)


def distribute(spec: SlabSpec, pos, vel) -> ShardedParticles:
    """Host-side initial distribution of particles into slab buffers.
    With ``spec.local_coords`` the x column is re-expressed relative to each
    slab's origin in float64 BEFORE the fp32 cast (lossless at any x0)."""
    pos = np.asarray(pos, np.float64)
    vel = np.asarray(vel)
    D, C = spec.n_slabs, spec.capacity
    out_p = np.zeros((D, C, 3), np.float32)
    out_v = np.zeros((D, C, 3), np.float32)
    out_m = np.zeros((D, C), bool)
    slab = np.clip(((pos[:, 0] - spec.x0) / spec.width).astype(int), 0, D - 1)
    for d in range(D):
        idx = np.where(slab == d)[0]
        if len(idx) > C:
            raise ValueError(f"slab {d} overflow: {len(idx)} > {C}")
        p = pos[idx].copy()
        if spec.local_coords:
            p[:, 0] -= spec.x0 + d * spec.width
        out_p[d, : len(idx)] = p
        out_v[d, : len(idx)] = vel[idx]
        out_m[d, : len(idx)] = True
    return ShardedParticles(jnp.asarray(out_p), jnp.asarray(out_v),
                            jnp.asarray(out_m))


def gather_global(spec: SlabSpec, pos):
    """(D, C, 3) slab-buffer positions → global-frame positions (float64
    x reconstruction for local_coords; identity otherwise)."""
    pos = np.asarray(pos, np.float64)
    if spec.local_coords:
        off = spec.x0 + np.arange(spec.n_slabs) * spec.width
        pos = pos.copy()
        pos[:, :, 0] += off[:, None]
    return pos


def _compact(pos, vel, extra, valid, capacity, fill=1e30):
    """Left-pack valid rows into a fixed-size buffer (per device, local)."""
    order = jnp.argsort(~valid)           # valid first, stable
    pos = pos[order][:capacity]
    vel = vel[order][:capacity]
    extra = extra[order][:capacity]
    valid = valid[order][:capacity]
    pos = jnp.where(valid[:, None], pos, fill)
    return pos, vel, extra, valid


def make_exchange(spec: SlabSpec, axis: str = "dp",
                  n_halo_extra_cols: int = 0):
    """Build the per-device migrate+halo exchange (call INSIDE shard_map).

    Returns ``exchange(pos, vel, extra, valid) -> (pos, vel, extra, valid,
    halo_pos, halo_vel, halo_extra, halo_valid, halo_idx, overflow)``;
    ``extra`` is an arbitrary per-particle (C, F) payload that migrates with
    its particle (spin, friction history, global id, ...).  Halos carry
    pos/vel plus the first ``n_halo_extra_cols`` extra columns (e.g. spin +
    global id, needed for full-fidelity friction across slab faces).
    ``halo_idx`` (2, H) records which owned rows were exported per face so
    the caller can REFRESH halo state between substeps without re-packing
    (slot assignment must stay fixed while a neighbor list is alive).
    """
    D = spec.n_slabs
    C = spec.capacity
    E = spec.migrate_capacity
    H = spec.halo_capacity

    def exchange(pos, vel, extra, valid):
        # shard_map keeps the sharded (device) axis with local size 1
        squeeze = pos.ndim == 3
        if squeeze:
            pos, vel, extra, valid = pos[0], vel[0], extra[0], valid[0]
        d = lax.axis_index(axis)
        if spec.local_coords:
            lo, hi = 0.0, spec.width
            # x re-expressed in the receiver's frame on send
            shift_r = jnp.asarray([-spec.width, 0.0, 0.0], pos.dtype)
        else:
            lo = spec.x0 + d * spec.width
            hi = lo + spec.width
            shift_r = jnp.zeros((3,), pos.dtype)

        # ---- migration (one slab hop per cycle) ----
        go_left = valid & (pos[:, 0] < lo) & (d > 0)
        go_right = valid & (pos[:, 0] >= hi) & (d < D - 1)
        stay = valid & ~go_left & ~go_right

        def pack(mask, shift):
            idx = jnp.nonzero(mask, size=E, fill_value=C)[0]
            ok = idx < C
            idx = jnp.minimum(idx, C - 1)
            return pos[idx] + shift, vel[idx], extra[idx], ok & mask[idx]

        lp, lv, le, lm = pack(go_left, -shift_r)
        rp, rv, re_, rm = pack(go_right, shift_r)
        mig_overflow = (jnp.maximum(jnp.sum(go_left), jnp.sum(go_right))
                        > E).astype(jnp.int32)

        right_perm = [(i, i + 1) for i in range(D - 1)]
        left_perm = [(i + 1, i) for i in range(D - 1)]
        # receive from left neighbor (they sent right), and vice versa
        in_lp = lax.ppermute(rp, axis, right_perm)
        in_lv = lax.ppermute(rv, axis, right_perm)
        in_le = lax.ppermute(re_, axis, right_perm)
        in_lm = lax.ppermute(rm, axis, right_perm)
        in_rp = lax.ppermute(lp, axis, left_perm)
        in_rv = lax.ppermute(lv, axis, left_perm)
        in_re = lax.ppermute(le, axis, left_perm)
        in_rm = lax.ppermute(lm, axis, left_perm)

        all_pos = jnp.concatenate([pos, in_lp, in_rp])
        all_vel = jnp.concatenate([vel, in_lv, in_rv])
        all_extra = jnp.concatenate([extra, in_le, in_re])
        all_ok = jnp.concatenate([stay, in_lm, in_rm])
        own_overflow = (jnp.sum(all_ok) > C).astype(jnp.int32)
        pos2, vel2, extra2, valid2 = _compact(all_pos, all_vel, all_extra,
                                              all_ok, C)

        # ---- halo export: my particles near each face ----
        near_lo = valid2 & (pos2[:, 0] < lo + spec.cutoff)
        near_hi = valid2 & (pos2[:, 0] >= hi - spec.cutoff)

        def packh_idx(mask):
            idx = jnp.nonzero(mask, size=H, fill_value=C)[0]
            ok = idx < C
            idx = jnp.minimum(idx, C - 1)
            return idx, ok & mask[idx]

        idx_lo, ok_lo = packh_idx(near_lo)   # → left neighbor's right halo
        idx_hi, ok_hi = packh_idx(near_hi)   # → right neighbor's left halo
        halo_overflow = (jnp.maximum(jnp.sum(near_lo), jnp.sum(near_hi))
                         > H).astype(jnp.int32)

        hx = extra2[:, :n_halo_extra_cols] if n_halo_extra_cols else \
            jnp.zeros((C, 0), pos.dtype)

        h_from_left_p = lax.ppermute(pos2[idx_hi] + shift_r, axis,
                                     right_perm)
        h_from_left_v = lax.ppermute(vel2[idx_hi], axis, right_perm)
        h_from_left_x = lax.ppermute(hx[idx_hi], axis, right_perm)
        h_from_left_m = lax.ppermute(ok_hi, axis, right_perm)
        h_from_right_p = lax.ppermute(pos2[idx_lo] - shift_r, axis,
                                      left_perm)
        h_from_right_v = lax.ppermute(vel2[idx_lo], axis, left_perm)
        h_from_right_x = lax.ppermute(hx[idx_lo], axis, left_perm)
        h_from_right_m = lax.ppermute(ok_lo, axis, left_perm)

        halo_pos = jnp.concatenate([h_from_left_p, h_from_right_p])
        halo_vel = jnp.concatenate([h_from_left_v, h_from_right_v])
        halo_extra = jnp.concatenate([h_from_left_x, h_from_right_x])
        halo_valid = jnp.concatenate([h_from_left_m, h_from_right_m])
        halo_pos = jnp.where(halo_valid[:, None], halo_pos, 1e30)
        halo_idx = jnp.stack([idx_lo, idx_hi])

        overflow = jnp.maximum(jnp.maximum(mig_overflow, own_overflow),
                               halo_overflow)
        if squeeze:
            return (pos2[None], vel2[None], extra2[None], valid2[None],
                    halo_pos[None], halo_vel[None], halo_extra[None],
                    halo_valid[None], halo_idx[None], overflow[None])
        return (pos2, vel2, extra2, valid2,
                halo_pos, halo_vel, halo_extra, halo_valid, halo_idx,
                overflow)

    return exchange


def refresh_halos(spec: SlabSpec, axis, halo_idx, pos, vel, omega):
    """Re-export the SAME owned rows chosen at cycle start (halo slot
    assignment must not change while a neighbor list is alive) with their
    current state — the per-substep halo refresh that removes the frozen-halo
    O(h·substeps) boundary error.  Call inside shard_map."""
    D = spec.n_slabs
    right_perm = [(i, i + 1) for i in range(D - 1)]
    left_perm = [(i + 1, i) for i in range(D - 1)]
    idx_lo, idx_hi = halo_idx[0], halo_idx[1]
    if spec.local_coords:
        shift_r = jnp.asarray([-spec.width, 0.0, 0.0], pos.dtype)
    else:
        shift_r = jnp.zeros((3,), pos.dtype)

    def send(arr, s):
        from_left = lax.ppermute(arr[idx_hi] + s, axis, right_perm)
        from_right = lax.ppermute(arr[idx_lo] - s, axis, left_perm)
        return jnp.concatenate([from_left, from_right])

    z = jnp.zeros((3,), pos.dtype)
    return send(pos, shift_r), send(vel, z), send(omega, z)


def shift_boundaries_x(bcs, dx):
    """Re-express DEM analytic boundaries in a frame shifted by ``dx`` along
    x (world x_local = x_global − dx); ``dx`` may be traced (per-device slab
    origin inside shard_map)."""
    import dataclasses

    def sub_x(arr):
        return arr - jnp.asarray([dx, 0.0, 0.0], arr.dtype) \
            if arr.shape[-1] == 3 else arr.at[..., 0].add(-dx)

    out = {}
    for f in dataclasses.fields(bcs):
        v = getattr(bcs, f.name)
        if v is None:
            out[f.name] = None
            continue
        kw = {}
        for g in dataclasses.fields(v):
            a = getattr(v, g.name)
            # position-like leaves: point/center/apex (cylinder center is xy)
            if g.name in ("point", "apex") or (
                    g.name == "center" and a.shape[-1] == 3):
                kw[g.name] = sub_x(a)
            elif g.name == "center":                       # (B, 2) xy
                kw[g.name] = a.at[..., 0].add(-dx)
            else:
                kw[g.name] = a
        out[f.name] = type(v)(**kw)
    return type(bcs)(**out)


def migrate_history_by_gid(old_partner_gid, old_tan, new_partner_gid):
    """Re-key pair friction history onto a new neighbor list by GLOBAL ids
    (the sharded counterpart of dem/neighbors.migrate_history — ids stay
    meaningful across slab migration/compaction while local slots do not).

    old_partner_gid (C, K) int32 (−1 = none), old_tan (C, K, 3),
    new_partner_gid (C, K) → (C, K, 3).
    """
    eq = (new_partner_gid[:, :, None] == old_partner_gid[:, None, :]) \
        & (new_partner_gid[:, :, None] >= 0)
    return jnp.einsum("nko,nof->nkf", eq.astype(old_tan.dtype), old_tan)


def make_sharded_dem_advance(spec: SlabSpec, mesh: Mesh, dem_params,
                             boundaries, grid, axis: str = "dp"):
    """Sharded DEM advance at FULL physics fidelity: each cycle = exchange
    (migration + halo export) → local neighbor rebuild → history re-key by
    global particle id → ``rebuild_every`` substeps with per-substep halo
    refresh.

    Multi-step friction is fully supported: pair tangential history (and wall
    history) rides the migration payload keyed by stable global ids, and
    halos carry spin + id so cross-face contacts see the same kinematics as
    the single-device path (parity-tested in tests/test_domains.py).

    With ``spec.local_coords`` (pod-scale fp32 precision — the role of the
    reference's int64 fixed-point subdomain coordinates,
    /root/reference/src/chrono_dem/gpu/ChDemDefines.h): pass ``grid`` in
    SLAB-LOCAL coordinates (origin.x ≈ −cutoff, spanning
    [−cutoff, width+cutoff] — identical on every device) and ``boundaries``
    in GLOBAL coordinates (they are re-expressed per device in-program).
    Positions returned by ``advance`` stay slab-local; reconstruct global
    with :func:`gather_global`.
    """
    from chrono_tpu.dem.neighbors import build_neighbor_list
    from chrono_tpu.dem.forces import particle_forces, wall_forces
    from chrono_tpu.dem.system import _n_walls

    exchange = make_exchange(spec, axis, n_halo_extra_cols=4)
    C = spec.capacity
    Hn = 2 * spec.halo_capacity
    K = dem_params.max_neighbors
    B = _n_walls(boundaries)
    cutoff = 2.0 * float(dem_params.radius) * (1.0 + dem_params.skin)
    # extra payload layout (per owned particle):
    # [omega(3) | gid(1) | tan(K·3) | partner_gid(K) | bc_tan(B·3)]
    OFF_TAN = 4
    OFF_PID = 4 + 3 * K
    OFF_BC = OFF_PID + K
    F = OFF_BC + 3 * B

    def device_cycle(pos, vel, extra, valid):
        out = exchange(pos, vel, extra, valid)
        (pos, vel, extra, valid, hpos, hvel, hextra, hvalid, halo_idx,
         overflow) = jax.tree_util.tree_map(lambda a: a[0], out)
        if spec.local_coords:
            # walls re-expressed in this slab's frame (grid is caller-local)
            d = lax.axis_index(axis)
            bcs_dev = shift_boundaries_x(
                boundaries, spec.x0 + d.astype(jnp.float32) * spec.width)
        else:
            bcs_dev = boundaries

        all_pos = jnp.concatenate([pos, hpos])
        all_vel = jnp.concatenate([vel, hvel])
        all_omega = jnp.concatenate([extra[:, 0:3], hextra[:, 0:3]])
        all_valid = jnp.concatenate([valid, hvalid])
        all_gid = jnp.concatenate([extra[:, 3], hextra[:, 3]]) \
            .astype(jnp.int32)
        all_gid = jnp.where(all_valid, all_gid, -1)

        nbr = build_neighbor_list(grid, all_pos, cutoff,
                                  dem_params.max_per_cell,
                                  dem_params.max_neighbors)
        pair_valid = nbr.valid & all_valid[:, None] \
            & all_valid[jnp.maximum(nbr.idx, 0)]
        new_partner = jnp.where(pair_valid,
                                all_gid[jnp.maximum(nbr.idx, 0)], -1)

        # re-key friction history by global id (slots moved in compaction)
        old_tan = extra[:, OFF_TAN:OFF_PID].reshape(C, K, 3)
        old_pid = extra[:, OFF_PID:OFF_BC].astype(jnp.int32)
        tan_own = migrate_history_by_gid(old_pid, old_tan, new_partner[:C])
        tan_all0 = jnp.concatenate([tan_own, jnp.zeros((Hn, K, 3),
                                                       pos.dtype)])
        bc_own = extra[:, OFF_BC:].reshape(C, B, 3)
        bc_all0 = jnp.concatenate([bc_own, jnp.zeros((Hn, B, 3), pos.dtype)])

        own_row = jnp.arange(C + Hn) < C
        halo_ok = hvalid

        def substep(carry, _):
            ap, av, ao, tan, bc = carry
            f_pp, tau_pp, tan = particle_forces(
                dem_params, ap, av, ao, nbr.idx, pair_valid, tan)
            f_w, tau_w, bc, _ = wall_forces(
                dem_params, bcs_dev, ap, av, ao, bc)
            acc = f_pp / dem_params.mass + dem_params.gravity
            acc = acc + f_w / dem_params.mass
            alpha = (tau_pp + tau_w) / dem_params.inertia
            upd = own_row & all_valid
            av = jnp.where(upd[:, None], av + dem_params.dt * acc, av)
            ao = jnp.where(upd[:, None], ao + dem_params.dt * alpha, ao)
            ap = jnp.where(upd[:, None], ap + dem_params.dt * av, ap)
            # refresh halos with the neighbors' CURRENT state (same rows as
            # chosen at cycle start, so the neighbor list stays valid)
            hp, hv, ho = refresh_halos(spec, axis, halo_idx,
                                       ap[:C], av[:C], ao[:C])
            hp = jnp.where(halo_ok[:, None], hp, 1e30)
            ap = jnp.concatenate([ap[:C], hp])
            av = jnp.concatenate([av[:C], hv])
            ao = jnp.concatenate([ao[:C], ho])
            return (ap, av, ao, tan, bc), None

        (all_pos, all_vel, all_omega, tan_all, bc_all), _ = lax.scan(
            substep, (all_pos, all_vel, all_omega, tan_all0, bc_all0), None,
            length=dem_params.rebuild_every)

        extra2 = jnp.concatenate([
            all_omega[:C],
            extra[:, 3:4],
            tan_all[:C].reshape(C, 3 * K),
            new_partner[:C].astype(pos.dtype),
            bc_all[:C].reshape(C, 3 * B),
        ], axis=1)
        return (all_pos[None, :C], all_vel[None, :C], extra2[None],
                valid[None], overflow[None, None])

    sharded = shard_map(
        device_cycle, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
    )

    def init_extra(omega):
        """(D, C, F) initial payload from (D, C, 3) spin (ids enumerated)."""
        D = spec.n_slabs
        gid = (jnp.arange(D)[:, None] * C
               + jnp.arange(C)[None, :]).astype(jnp.float32)
        z_tan = jnp.zeros((D, C, 3 * K), omega.dtype)
        z_pid = jnp.full((D, C, K), -1.0, omega.dtype)
        z_bc = jnp.zeros((D, C, 3 * B), omega.dtype)
        return jnp.concatenate([omega, gid[..., None], z_tan, z_pid, z_bc],
                               axis=2)

    @functools.partial(jax.jit, static_argnums=4)
    def advance(pos, vel, omega, valid, n_cycles: int):
        extra = omega if omega.shape[-1] == F else init_extra(omega)

        def body(carry, _):
            p, v, x, m = carry
            p, v, x, m, ov = sharded(p, v, x, m)
            return (p, v, x, m), ov.max()

        (p, v, x, m), ovs = lax.scan(body, (pos, vel, extra, valid), None,
                                     length=n_cycles)
        return p, v, x[:, :, 0:3], m, ovs.max()

    return advance


def make_sharded_sph_advance(spec: SlabSpec, mesh: Mesh, sph_params, grid,
                             boundary_slabs, boundary_valid, axis: str = "dp"):
    """Sharded WCSPH advance over x-slabs: the FSI-side counterpart of
    :func:`make_sharded_dem_advance` (the reference has NO multi-GPU SPH —
    its activity domains are single-GPU windowing; this is the
    `jax.sharding` scale-out the survey prescribes).

    Fluid particles migrate between slabs with their density riding the
    exchange payload; halos carry (pos, vel, rho) and are refreshed every
    substep.  Boundary (BCE) markers are static: each device holds the
    markers inside its slab ± cutoff (``boundary_slabs`` (D, Bc, 3) +
    ``boundary_valid`` (D, Bc), host-precomputed via
    :func:`distribute_static`).
    """
    from chrono_tpu.fsi.sph import wcsph
    from chrono_tpu.fsi.sph.state import FLUID, BOUNDARY
    from chrono_tpu.dem.neighbors import build_neighbor_list

    exchange = make_exchange(spec, axis, n_halo_extra_cols=1)
    C = spec.capacity
    Hn = 2 * spec.halo_capacity
    Bc = boundary_slabs.shape[1]
    cutoff = spec.cutoff

    def device_cycle(pos, vel, extra, valid, bpos, bvalid, brho):
        out = exchange(pos, vel, extra, valid)
        (pos, vel, extra, valid, hpos, hvel, hextra, hvalid, halo_idx,
         overflow) = jax.tree_util.tree_map(lambda a: a[0], out)
        bpos, bvalid, brho = bpos[0], bvalid[0], brho[0]

        all_pos = jnp.concatenate([pos, hpos, jnp.where(
            bvalid[:, None], bpos, 1e30)])
        all_vel = jnp.concatenate([vel, hvel, jnp.zeros((Bc, 3), pos.dtype)])
        all_rho = jnp.concatenate([extra[:, 0], hextra[:, 0], brho])
        all_valid = jnp.concatenate([valid, hvalid, bvalid])
        kind = jnp.concatenate([
            jnp.full((C + Hn,), FLUID, jnp.int32),
            jnp.full((Bc,), BOUNDARY, jnp.int32)])

        nbr = build_neighbor_list(grid, all_pos, cutoff,
                                  sph_params.max_per_cell,
                                  sph_params.max_neighbors)
        pair_valid = nbr.valid & all_valid[:, None] \
            & all_valid[jnp.maximum(nbr.idx, 0)]
        own_fluid = (jnp.arange(C + Hn + Bc) < C) & all_valid
        halo_ok = hvalid
        h = sph_params.dt

        def substep(carry, _):
            ap, av, ar = carry
            _, dv = wcsph.wcsph_rhs(sph_params, grid, ap, av, ar, kind,
                                    nbr.idx, pair_valid)
            av2 = jnp.where(own_fluid[:, None], av + h * dv, av)
            drho = wcsph.continuity_rhs(sph_params, grid, ap, av2, ar, kind,
                                        nbr.idx, pair_valid)
            ar2 = jnp.where(own_fluid | (kind == BOUNDARY), ar + h * drho,
                            ar)
            vt = wcsph.xsph_velocity(sph_params, grid, ap, av2, ar2, kind,
                                     nbr.idx, pair_valid)
            ap2 = jnp.where(own_fluid[:, None], ap + h * vt, ap)
            hp, hv, hr = refresh_halos(spec, axis, halo_idx, ap2[:C],
                                       av2[:C], ar2[:C, None])
            hp = jnp.where(halo_ok[:, None], hp, 1e30)
            ap2 = jnp.concatenate([ap2[:C], hp, ap2[C + Hn:]])
            av2 = jnp.concatenate([av2[:C], hv, av2[C + Hn:]])
            ar2 = jnp.concatenate([ar2[:C], hr[:, 0], ar2[C + Hn:]])
            return (ap2, av2, ar2), None

        (all_pos, all_vel, all_rho), _ = lax.scan(
            substep, (all_pos, all_vel, all_rho), None,
            length=sph_params.rebuild_every)

        extra2 = all_rho[:C, None]
        return (all_pos[None, :C], all_vel[None, :C], extra2[None],
                valid[None], all_rho[None, C + Hn:], overflow[None, None])

    sharded = shard_map(
        device_cycle, mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=(P(axis),) * 6,
    )

    @functools.partial(jax.jit, static_argnums=4)
    def advance(pos, vel, rho, valid, n_cycles: int):
        extra = rho[..., None] if rho.ndim == 2 else rho
        brho0 = jnp.full(boundary_valid.shape, float(sph_params.rho0),
                         pos.dtype)

        def body(carry, _):
            p, v, x, m, br = carry
            p, v, x, m, br, ov = sharded(p, v, x, m, boundary_slabs,
                                         boundary_valid, br)
            return (p, v, x, m, br), ov.max()

        (p, v, x, m, br), ovs = lax.scan(
            body, (pos, vel, extra, valid, brho0), None, length=n_cycles)
        return p, v, x[..., 0], m, ovs.max()

    return advance


def distribute_static(spec: SlabSpec, pts, capacity):
    """Host-side: replicate static (boundary) points into per-slab buffers —
    every slab gets the points inside [lo − cutoff, hi + cutoff]."""
    pts = np.asarray(pts)
    D = spec.n_slabs
    out = np.full((D, capacity, 3), 1e30, np.float32)
    okm = np.zeros((D, capacity), bool)
    for d in range(D):
        lo = spec.x0 + d * spec.width - spec.cutoff
        hi = spec.x0 + (d + 1) * spec.width + spec.cutoff
        sel = pts[(pts[:, 0] >= lo) & (pts[:, 0] < hi)]
        n = min(len(sel), capacity)
        if len(sel) > capacity:
            raise ValueError(f"slab {d}: {len(sel)} static pts > {capacity}")
        out[d, :n] = sel[:n]
        okm[d, :n] = True
    return jnp.asarray(out), jnp.asarray(okm)
