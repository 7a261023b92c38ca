"""FEA contact surfaces: node-cloud and mesh-face penalty contact.

Counterparts of the reference's contact-surface family
(/root/reference/src/chrono/fea/ChContactSurface.h):

* :class:`NodeCloudContact` / :func:`node_cloud_forces` — the
  ``ChContactSurfaceNodeCloud`` role: every selected FEA node carries a
  contact sphere against analytic primitives (planes / spheres / boxes).
* :func:`face_contact_forces` — the ``ChContactSurfaceMesh`` role
  (/root/reference/src/chrono/fea/ChContactSurfaceMesh.h): a triangle skin
  over the FEA mesh contacts THROUGH ITS FACES.  Each face is integrated
  with a 3-point barycentric quadrature; per-point penalty tractions are
  area-weighted and scattered back to the 3 corner nodes with their
  barycentric weights — so a shell can drape over a box edge between
  nodes and a tire footprint is a pressure patch, not a row of point
  springs.  The reference reaches the same behavior through Bullet
  triangle contactables + ChLoadContactSurfaceMesh force distribution;
  here it is one fused gather → vmapped point-force → segment-scatter,
  a pure function of (q, qd) that composes with the explicit and
  HHT/Newton steppers and their autodiff tangents like any other load.

Penalty model (SMC, like the reference pairing FEA meshes with
ChSystemSMC): fn = kn·pen − gn·√pen·vn, clamped ≥ 0; Coulomb friction with
a viscous-regularized stick slope ``v_reg``.  For the node cloud ``kn/gn``
are per-node [N/m]; through the face surface they are per-AREA tractions
[N/m³] multiplied by each quadrature point's area share, making the total
contact force stable under mesh refinement.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class NodeCloudContact:
    """Contact configuration against world-fixed analytic primitives.

    ``node_radius``: contact sphere radius (node cloud) / surface skin
    thickness (face surface).  ``kn/gn`` penalty normal stiffness/damping,
    ``mu`` Coulomb friction against a regularized tangent velocity (stick
    approximated by viscous slope ``v_reg``).
    """

    node_radius: Array                 # () contact sphere radius / skin
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
    # boxes: center / half-extents / optional unit quaternion (else AA)
    box_c: Array = None                # (B, 3)
    box_h: Array = None                # (B, 3)
    box_q: Array = None                # (B, 4) or None


def _friction(cfg: NodeCloudContact, fn, n, vel):
    """Regularized Coulomb force for per-point normal force ``fn`` (…,)."""
    vt = vel - jnp.sum(vel * n, axis=-1, keepdims=True) * n
    vt_mag = jnp.sqrt(jnp.sum(vt * vt, axis=-1, keepdims=True) + 1e-18)
    scale = jnp.minimum(1.0, vt_mag / cfg.v_reg)
    return -cfg.mu * fn[..., None] * scale * vt / vt_mag


def _box_sdf_normal(p, c, h, quat=None):
    """Signed distance (+ outside) and outward unit normal of a box.

    Standard box SDF; inside, the normal is the one-hot axis of the least
    penetration (so a point pressed past a face is pushed back out of that
    face — the behavior a draping shell needs at edges/corners).
    """
    d = p - c
    if quat is not None:
        from chrono_tpu.core.quaternion import qrotate, qconj
        d = qrotate(qconj(quat)[None, :], d)
    a = jnp.abs(d) - h                                    # (…,3)
    a_pos = jnp.maximum(a, 0.0)
    dist_out = jnp.sqrt(jnp.sum(a_pos * a_pos, axis=-1) + 1e-18)
    a_max = jnp.max(a, axis=-1)
    inside = a_max <= 0.0
    sdf = jnp.where(inside, a_max, dist_out)
    n_out = a_pos * jnp.sign(d) / dist_out[..., None]
    onehot = (a == a_max[..., None]).astype(p.dtype)
    onehot = onehot / jnp.sum(onehot, axis=-1, keepdims=True)
    n_in = onehot * jnp.sign(d + 1e-30)
    n = jnp.where(inside[..., None], n_in, n_out)
    if quat is not None:
        n = qrotate(quat[None, :], n)
    return sdf, n


def point_primitive_forces(cfg: NodeCloudContact, pos: Array, vel: Array,
                           radius=None) -> Array:
    """Penalty + friction forces (Npts, 3) of points of contact radius
    ``radius`` (default ``cfg.node_radius``) against every primitive."""
    r = cfg.node_radius if radius is None else radius
    f = jnp.zeros_like(pos)

    def add(pen, n, f):
        vn = jnp.sum(vel * n, axis=-1)
        fn = jnp.maximum(cfg.kn * pen - cfg.gn * pen ** 0.5 * vn, 0.0)
        fn = jnp.where(pen > 0, fn, 0.0)
        return f + fn[..., None] * n + jnp.where(
            pen[..., None] > 0, _friction(cfg, fn, n, vel), 0.0)

    if cfg.plane_n is not None:
        for k in range(cfg.plane_n.shape[0]):
            n = jnp.broadcast_to(cfg.plane_n[k], pos.shape)
            gap = pos @ cfg.plane_n[k] - cfg.plane_d[k] - r
            f = add(jnp.maximum(-gap, 0.0), n, f)

    if cfg.sph_c is not None:
        for k in range(cfg.sph_c.shape[0]):
            d = pos - cfg.sph_c[k]
            dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-18)
            n = d / dist[..., None]
            f = add(jnp.maximum(cfg.sph_r[k] + r - dist, 0.0), n, f)

    if cfg.box_c is not None:
        for k in range(cfg.box_c.shape[0]):
            sdf, n = _box_sdf_normal(
                pos, cfg.box_c[k], cfg.box_h[k],
                None if cfg.box_q is None else cfg.box_q[k])
            f = add(jnp.maximum(r - sdf, 0.0), n, f)

    return f


def node_cloud_forces(cfg: NodeCloudContact, q: Array, qd: Array) -> Array:
    """Penalty contact forces on the (Nn, 6) node vector (positions in
    [:, 0:3]; rotation/director DOFs get zero moment)."""
    f = point_primitive_forces(cfg, q[:, 0:3], qd[:, 0:3])
    out = jnp.zeros_like(q)
    return out.at[:, 0:3].set(f)


def make_contact_force_fn(cfg: NodeCloudContact):
    """Adapter: (q, qd) → (Nn, 6) loads, for use as the external-force hook
    of the FEA steppers."""
    return lambda q, qd: node_cloud_forces(cfg, q, qd)


# --------------------------------------------------------------------------
# Mesh-face (triangle) contact surface — ChContactSurfaceMesh role
# --------------------------------------------------------------------------

# 3-point midpoint rule on the triangle: exact for linear tractions,
# degree-2 accurate, and its points sit on the EDGES — the locations that
# first touch a box edge when a shell drapes over it.
_FACE_QUAD = (
    ((0.5, 0.5, 0.0), 1.0 / 3.0),
    ((0.0, 0.5, 0.5), 1.0 / 3.0),
    ((0.5, 0.0, 0.5), 1.0 / 3.0),
)


def face_contact_forces(cfg: NodeCloudContact, faces: Array,
                        pos: Array, vel: Array) -> Array:
    """Face-integrated penalty contact of a triangle skin.

    ``faces``: (F, 3) int node indices into ``pos``/``vel`` (Nn, 3).
    Returns (Nn, 3) nodal forces.  ``cfg.kn/gn`` are per-area tractions
    [N/m³ / N·s/m³]; ``cfg.node_radius`` acts as the surface skin (e.g.
    half the shell thickness).
    """
    va = pos[faces[:, 0]]
    vb = pos[faces[:, 1]]
    vc = pos[faces[:, 2]]
    ua = vel[faces[:, 0]]
    ub = vel[faces[:, 1]]
    uc = vel[faces[:, 2]]
    area = 0.5 * jnp.sqrt(jnp.sum(
        jnp.cross(vb - va, vc - va) ** 2, axis=-1) + 1e-30)   # (F,)

    out = jnp.zeros_like(pos)
    for (w0, w1, w2), wq in _FACE_QUAD:
        pq = w0 * va + w1 * vb + w2 * vc
        uq = w0 * ua + w1 * ub + w2 * uc
        fq = point_primitive_forces(cfg, pq, uq) * (wq * area)[:, None]
        out = (out.at[faces[:, 0]].add(w0 * fq)
                  .at[faces[:, 1]].add(w1 * fq)
                  .at[faces[:, 2]].add(w2 * fq))
    return out


def grid_surface_faces(nc: int, nw: int, wrap_i: bool = True):
    """Triangulate an (nc, nw+1) structured node grid (node id =
    i·(nw+1)+j) into (F, 3) faces — 2 triangles per quad; ``wrap_i``
    closes the i direction (surfaces of revolution, e.g. the ANCF tire).
    Returns a numpy int32 array (static mesh topology).
    """
    import numpy as np
    faces = []
    ilim = nc if wrap_i else nc - 1
    for i in range(ilim):
        i1 = (i + 1) % nc
        for j in range(nw):
            a = i * (nw + 1) + j
            b = i1 * (nw + 1) + j
            c = i1 * (nw + 1) + j + 1
            d = i * (nw + 1) + j + 1
            faces.append((a, b, c))
            faces.append((a, c, d))
    return np.asarray(faces, np.int32)
