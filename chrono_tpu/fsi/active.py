"""Active domains + moving patch: spatial scaling for FSI/CRM.

TPU-native counterpart of the reference's activity machinery
(/root/reference/src/chrono_fsi/sph/physics/SphFluidDynamics.cu:171
UpdateActivityD — markers inside a box around each FSI solid are "active",
a slightly larger box marks "extended" neighbors; everything else is frozen)
and of the moving-patch particle relocator
(sph/SphParticleRelocator.cu, demo_VEH_CRMTerrain_MovingPatch.cpp).

On TPU, masking alone saves nothing — shapes are static — so activity becomes
GATHER-COMPACTION: the extended-active markers are gathered into a fixed
``capacity`` buffer (one argsort per rebuild cycle), the solver runs on the
compact buffer, and results scatter back.  Frozen-but-gathered markers keep
contributing as neighbors (kind=FROZEN) exactly like the reference's extended
set.  Compute cost per step scales with ``capacity`` instead of the full
marker count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.fsi.sph.state import FLUID, FROZEN, RIGID_BCE


@pytree_dataclass
class ActiveDomainSpec:
    """Static configuration of the per-body activity boxes.

    ``box``: (3,) half-extents of the strict active box around each anchor
    (the reference's bodyActiveDomain); ``margin``: extra half-width of the
    extended box (≥ kernel support radius so frozen neighbors fully pad the
    active set); ``capacity``: compact buffer size (static).
    """

    box: Array
    margin: Array
    capacity: int = static_field(default=4096)


class CompactSet(NamedTuple):
    idx: Array        # (capacity,) gathered marker indices (unique)
    strict: Array     # (capacity,) bool: integrate this marker
    count: Array      # () int32 — number of extended-active markers
    overflow: Array   # () int32 — max(count − capacity, 0)


def activity_masks(spec: ActiveDomainSpec, pos: Array, kind: Array,
                   anchors: Array):
    """(strict, extended) masks. ``anchors``: (B,3) FSI solid positions.

    Fluid/granular markers are boxed; RIGID_BCE markers are always active
    (they ride their bodies); fixed walls participate when inside the
    extended box (their support pads the active region).
    """
    det = jnp.abs(pos[:, None, :] - anchors[None, :, :])     # (N,B,3)
    in_strict = jnp.any(jnp.all(det <= spec.box[None, None, :], axis=-1),
                        axis=1)
    ext_box = spec.box + spec.margin
    in_ext = jnp.any(jnp.all(det <= ext_box[None, None, :], axis=-1), axis=1)
    is_rigid = kind == RIGID_BCE
    strict = (in_strict | is_rigid)
    ext = (in_ext | is_rigid)
    return strict, ext


def compact_indices(spec: ActiveDomainSpec, ext: Array) -> CompactSet:
    """Gather extended-active marker indices into the fixed buffer.

    Stable argsort puts extended-active first; trailing slots hold far-away
    markers which enter as FROZEN (harmless extra work, no physics change).
    """
    order = jnp.argsort(~ext, stable=True)
    idx = order[: spec.capacity]
    count = jnp.sum(ext).astype(jnp.int32)
    overflow = jnp.maximum(count - spec.capacity, 0).astype(jnp.int32)
    return idx, count, overflow


def gather_state(state, idx: Array, strict: Array):
    """Compact sub-state: leaves gathered on idx; non-strict granular markers
    re-typed FROZEN so the solver treats them as unintegrated neighbors."""
    sub = jax.tree_util.tree_map(
        lambda a: a[idx] if (hasattr(a, "ndim") and a.ndim >= 1
                             and a.shape[0] == strict.shape[0]) else a, state)
    strict_sub = strict[idx]
    new_kind = jnp.where((sub.kind == FLUID) & ~strict_sub, FROZEN, sub.kind)
    return sub.replace(kind=new_kind)


def scatter_state(full, sub, idx: Array):
    """Write the compact results back (kind keeps the full array's codes)."""
    n = full.pos.shape[0]

    def put(a_full, a_sub):
        if (hasattr(a_full, "ndim") and a_full.ndim >= 1
                and a_full.shape[0] == n and a_sub.shape[:1] == idx.shape):
            return a_full.at[idx].set(a_sub)
        return a_full

    out = jax.tree_util.tree_map(put, full, sub)
    # kind keeps the full codes (FROZEN was a sub-only view); the full
    # neighbor list is stale by construction and rebuilt before any use
    return out.replace(kind=full.kind, nbr=full.nbr, time=sub.time)


def relocate_patch_x(state, x_front: Array, patch_length: float,
                     surface_z: float, params, crm=None):
    """Moving-patch relocation along +x (reference SphParticleRelocator):
    granular markers that fell more than ``patch_length`` behind ``x_front``
    teleport forward by ``patch_length``, arriving at rest with lithostatic
    stress — the terrain bed endlessly recycles under a advancing vehicle.

    Returns (state, n_moved).
    """
    is_gran = state.kind == FLUID
    move = is_gran & (state.pos[:, 0] < x_front - patch_length)
    pos = state.pos.at[:, 0].add(jnp.where(move, patch_length, 0.0))
    vel = jnp.where(move[:, None], 0.0, state.vel)
    rho = jnp.where(move, params.rho0, state.rho)
    out = state.replace(pos=pos, vel=vel, rho=rho)
    if crm is not None and hasattr(state, "tau_d"):
        g = jnp.abs(params.gravity[2])
        depth = jnp.clip(surface_z - pos[:, 2], 0.0, None)
        szz = -params.rho0 * g * depth
        K0 = crm.poisson / (1.0 - crm.poisson)
        tau_new = jnp.stack([K0 * szz, K0 * szz, szz], axis=-1)
        out = out.replace(
            tau_d=jnp.where(move[:, None], tau_new, state.tau_d),
            tau_o=jnp.where(move[:, None], 0.0, state.tau_o))
    return out, jnp.sum(move).astype(jnp.int32)
