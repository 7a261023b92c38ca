"""FEA contact surfaces: node-cloud penalty contact.

Counterpart of the reference's ``ChContactSurfaceNodeCloud``
(/root/reference/src/chrono/fea/ChContactSurface.h, ChContactSurfaceNodeCloud):
every selected FEA node carries a contact sphere; contacts against analytic
primitives (planes / spheres / boxes, e.g. ground or tooling) produce smooth
penalty forces (SMC model, like the reference pairing FEA meshes with
ChSystemSMC) that enter the FEA steppers as external loads — a pure function
of (q, qd), so it composes with the implicit HHT/Newton machinery and its
autodiff tangent exactly like the internal elastic forces.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class NodeCloudContact:
    """Contact configuration for a node cloud.

    Primitives are world-fixed (tooling/ground).  ``kn/gn`` penalty normal
    stiffness/damping, ``mu`` Coulomb friction against a regularized tangent
    velocity (stick approximated by viscous slope ``v_reg``).
    """

    node_radius: Array                 # () contact sphere radius
    kn: Array
    gn: Array
    mu: Array = 0.0
    v_reg: Array = 1e-3
    # planes: x·n = d, n pointing into free space
    plane_n: Array = None              # (P, 3)
    plane_d: Array = None              # (P,)
    # spheres: world center/radius (obstacles)
    sph_c: Array = None                # (S, 3)
    sph_r: Array = None                # (S,)


def node_cloud_forces(cfg: NodeCloudContact, q: Array, qd: Array) -> Array:
    """Penalty contact forces on the (Nn, 6) node vector (positions in
    [:, 0:3]; rotation/director DOFs get zero moment)."""
    pos = q[:, 0:3]
    vel = qd[:, 0:3]
    f = jnp.zeros_like(pos)

    def friction(fn, n, vel):
        vt = vel - jnp.sum(vel * n, axis=-1, keepdims=True) * n
        vt_mag = jnp.sqrt(jnp.sum(vt * vt, axis=-1, keepdims=True) + 1e-18)
        scale = jnp.minimum(1.0, vt_mag / cfg.v_reg)
        return -cfg.mu * fn[..., None] * scale * vt / vt_mag

    if cfg.plane_n is not None:
        for k in range(cfg.plane_n.shape[0]):
            n = cfg.plane_n[k]
            gap = pos @ n - cfg.plane_d[k] - cfg.node_radius
            pen = jnp.maximum(-gap, 0.0)
            vn = vel @ n
            fn = jnp.maximum(cfg.kn * pen - cfg.gn * pen ** 0.5 * vn, 0.0)
            fn = jnp.where(pen > 0, fn, 0.0)
            f = f + fn[:, None] * n[None, :] + jnp.where(
                pen[:, None] > 0, friction(fn, n[None, :], vel), 0.0)

    if cfg.sph_c is not None:
        for k in range(cfg.sph_c.shape[0]):
            d = pos - cfg.sph_c[k]
            dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-18)
            n = d / dist[:, None]
            pen = jnp.maximum(cfg.sph_r[k] + cfg.node_radius - dist, 0.0)
            vn = jnp.sum(vel * n, axis=-1)
            fn = jnp.maximum(cfg.kn * pen - cfg.gn * pen ** 0.5 * vn, 0.0)
            fn = jnp.where(pen > 0, fn, 0.0)
            f = f + fn[:, None] * n + jnp.where(
                pen[:, None] > 0, friction(fn, n, vel), 0.0)

    out = jnp.zeros_like(q)
    return out.at[:, 0:3].set(f)


def make_contact_force_fn(cfg: NodeCloudContact):
    """Adapter: (q, qd) → (Nn, 6) loads, for use as the external-force hook
    of the FEA steppers."""
    return lambda q, qd: node_cloud_forces(cfg, q, qd)
