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
    """Static decomposition along x: device d owns [x0 + d·w, x0 + (d+1)·w)."""

    x0: float = static_field(default=0.0)
    width: float = static_field(default=1.0)     # slab width
    n_slabs: int = static_field(default=1)
    capacity: int = static_field(default=1024)   # owned-particle slots/device
    halo_capacity: int = static_field(default=256)
    migrate_capacity: int = static_field(default=128)
    cutoff: float = static_field(default=0.1)    # halo width


class ShardedParticles(NamedTuple):
    """Per-device particle buffers (leading axis = device when outside
    shard_map; inside, each device sees its own (capacity, …) slice)."""

    pos: jnp.ndarray     # (D, C, 3)
    vel: jnp.ndarray     # (D, C, 3)
    valid: jnp.ndarray   # (D, C)


def distribute(spec: SlabSpec, pos, vel) -> ShardedParticles:
    """Host-side initial distribution of particles into slab buffers."""
    pos = np.asarray(pos)
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
        out_p[d, : len(idx)] = pos[idx]
        out_v[d, : len(idx)] = vel[idx]
        out_m[d, : len(idx)] = True
    return ShardedParticles(jnp.asarray(out_p), jnp.asarray(out_v),
                            jnp.asarray(out_m))


def _compact(pos, vel, extra, valid, capacity, fill=1e30):
    """Left-pack valid rows into a fixed-size buffer (per device, local)."""
    order = jnp.argsort(~valid)           # valid first, stable
    pos = pos[order][:capacity]
    vel = vel[order][:capacity]
    extra = extra[order][:capacity]
    valid = valid[order][:capacity]
    pos = jnp.where(valid[:, None], pos, fill)
    return pos, vel, extra, valid


def make_exchange(spec: SlabSpec, axis: str = "dp"):
    """Build the per-device migrate+halo exchange (call INSIDE shard_map).

    Returns ``exchange(pos, vel, extra, valid) -> (pos, vel, extra, valid,
    halo_pos, halo_vel, halo_valid, overflow)``; ``extra`` is an arbitrary
    per-particle (C, F) payload that migrates with its particle (spin,
    friction history, stress, ...).  Halos carry only pos/vel.
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
        lo = spec.x0 + d * spec.width
        hi = lo + spec.width

        # ---- migration (one slab hop per cycle) ----
        go_left = valid & (pos[:, 0] < lo) & (d > 0)
        go_right = valid & (pos[:, 0] >= hi) & (d < D - 1)
        stay = valid & ~go_left & ~go_right

        def pack(mask):
            idx = jnp.nonzero(mask, size=E, fill_value=C)[0]
            ok = idx < C
            idx = jnp.minimum(idx, C - 1)
            return pos[idx], vel[idx], extra[idx], ok & mask[idx]

        lp, lv, le, lm = pack(go_left)
        rp, rv, re_, rm = pack(go_right)
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

        def packh(mask):
            idx = jnp.nonzero(mask, size=H, fill_value=C)[0]
            ok = idx < C
            idx = jnp.minimum(idx, C - 1)
            return pos2[idx], vel2[idx], ok & mask[idx]

        hlp, hlv, hlm = packh(near_lo)   # → left neighbor's right halo
        hrp, hrv, hrm = packh(near_hi)   # → right neighbor's left halo
        halo_overflow = (jnp.maximum(jnp.sum(near_lo), jnp.sum(near_hi))
                         > H).astype(jnp.int32)

        h_from_left_p = lax.ppermute(hrp, axis, right_perm)
        h_from_left_v = lax.ppermute(hrv, axis, right_perm)
        h_from_left_m = lax.ppermute(hrm, axis, right_perm)
        h_from_right_p = lax.ppermute(hlp, axis, left_perm)
        h_from_right_v = lax.ppermute(hlv, axis, left_perm)
        h_from_right_m = lax.ppermute(hlm, axis, left_perm)

        halo_pos = jnp.concatenate([h_from_left_p, h_from_right_p])
        halo_vel = jnp.concatenate([h_from_left_v, h_from_right_v])
        halo_valid = jnp.concatenate([h_from_left_m, h_from_right_m])
        halo_pos = jnp.where(halo_valid[:, None], halo_pos, 1e30)

        overflow = jnp.maximum(jnp.maximum(mig_overflow, own_overflow),
                               halo_overflow)
        if squeeze:
            return (pos2[None], vel2[None], extra2[None], valid2[None],
                    halo_pos[None], halo_vel[None], halo_valid[None],
                    overflow[None])
        return (pos2, vel2, extra2, valid2,
                halo_pos, halo_vel, halo_valid, overflow)

    return exchange


def make_sharded_dem_advance(spec: SlabSpec, mesh: Mesh, dem_params,
                             boundaries, grid, axis: str = "dp"):
    """Sharded DEM advance: each cycle = exchange → local neighbor rebuild →
    ``rebuild_every`` local force/integrate substeps.

    A frictionless/single-step variant (pair history does not survive
    migration compaction yet — multi-step history needs identity-stable slot
    migration, planned in the domains roadmap).
    """
    from chrono_tpu.dem.neighbors import build_neighbor_list
    from chrono_tpu.dem.forces import particle_forces, wall_forces
    from chrono_tpu.dem.params import DEMParams

    if dem_params.friction_mode == "multi_step":
        dem_params = dem_params.replace(friction_mode="single_step")

    exchange = make_exchange(spec, axis)
    C = spec.capacity
    Hn = 2 * spec.halo_capacity
    cutoff = 2.0 * float(dem_params.radius) * (1.0 + dem_params.skin)

    def device_cycle(pos, vel, omega, valid):
        out = exchange(pos, vel, omega, valid)
        pos, vel, omega, valid, hpos, hvel, hvalid, overflow = (
            jax.tree_util.tree_map(lambda a: a[0], out))
        all_pos = jnp.concatenate([pos, hpos])
        all_vel = jnp.concatenate([vel, hvel])
        all_omega = jnp.concatenate([omega, jnp.zeros_like(hvel)])
        all_valid = jnp.concatenate([valid, hvalid])

        nbr = build_neighbor_list(grid, all_pos, cutoff,
                                  dem_params.max_per_cell,
                                  dem_params.max_neighbors)
        K = dem_params.max_neighbors
        tan0 = jnp.zeros((C + Hn, K, 3), pos.dtype)
        from chrono_tpu.dem.system import _n_walls
        bc0 = jnp.zeros((C + Hn, _n_walls(boundaries), 3), pos.dtype)

        def substep(carry, _):
            ap, av, ao = carry
            f_pp, tau_pp, _ = particle_forces(
                dem_params, ap, av, ao, nbr.idx,
                nbr.valid & all_valid[:, None], tan0)
            f_w, tau_w, _, _ = wall_forces(
                dem_params, boundaries, ap, av, ao, bc0)
            acc = (f_pp + f_w) / dem_params.mass + dem_params.gravity
            alpha = (tau_pp + tau_w) / dem_params.inertia
            own = jnp.arange(ap.shape[0]) < C
            upd = own & all_valid
            av = jnp.where(upd[:, None], av + dem_params.dt * acc, av)
            ao = jnp.where(upd[:, None], ao + dem_params.dt * alpha, ao)
            ap = jnp.where(upd[:, None], ap + dem_params.dt * av, ap)
            return (ap, av, ao), None

        (all_pos, all_vel, all_omega), _ = lax.scan(
            substep, (all_pos, all_vel, all_omega), None,
            length=dem_params.rebuild_every)
        return (all_pos[None, :C], all_vel[None, :C], all_omega[None, :C],
                valid[None], overflow[None, None])

    sharded = shard_map(
        device_cycle, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
    )

    @functools.partial(jax.jit, static_argnums=4)
    def advance(pos, vel, omega, valid, n_cycles: int):
        def body(carry, _):
            p, v, o, m = carry
            p, v, o, m, ov = sharded(p, v, o, m)
            return (p, v, o, m), ov.max()

        (p, v, o, m), ovs = lax.scan(body, (pos, vel, omega, valid), None,
                                     length=n_cycles)
        return p, v, o, m, ovs.max()

    return advance
