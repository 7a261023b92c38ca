"""BST rotation-free thin-shell triangles (positions only, no directors).

Counterpart of the reference's ChElementShellBST
(/root/reference/src/chrono/fea/ChElementShellBST.h — the Oñate/Flores
"basic shell triangle": Kirchhoff bending evaluated from the patch of a
triangle plus its 3 edge neighbors, membrane from the CST field, no
rotation DOFs).  Same patch idea, TPU-shaped construction:

* BUILD TIME (numpy): for every triangle, collect the 6-point patch
  (3 vertices + the 3 opposite vertices of its edge neighbors), compute
  their 2-D coordinates in the reference triangle plane, and precompute a
  least-squares QUADRATIC-FIT operator K_e (3, 6): heights z of the patch
  above the triangle plane → curvature tensor (κxx, κyy, κxy).  Missing
  neighbors (free edges) get zero weight — the fit is Tikhonov-regularized,
  which leaves the unconstrained curvature direction soft (a free edge).
* RUN TIME (jit): corotate (current triangle frame), take the CURRENT
  patch heights, κ = K_e @ z, Koiter bending energy with the full ν
  coupling; membrane = Green strain of the reference→current triangle map
  (plane stress).  Internal forces and the consistent tangent come from
  autodiff of the total energy, like every chrono_tpu element.

Nodes live in the shared (Nn, 6) vector; the rotation slots are inert
(masked by fea.dynamics like the solid elements).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class BSTMesh:
    tris: Array      # (F, 3) vertex ids
    patch: Array     # (F, 6) patch ids (v0, v1, v2, o0, o1, o2); missing→v0
    pmask: Array     # (F, 6) 1.0 for present patch points
    gmask: Array     # (F, 6) 1.0 where the patch point is a CLAMPED-edge
    #                  mirror ghost: its runtime position is the source
    #                  vertex reflected across the fixed plane (edge line ×
    #                  support normal) — even extension ⇒ zero slope
    gpu: Array       # (F, 6, 3) a point on the mirror plane (edge vertex)
    gm: Array        # (F, 6, 3) mirror-plane unit normal
    K: Array         # (F, 3, 6) curvature-fit operators (reference geom)
    Dref_inv: Array  # (F, 2, 2) inverse reference in-plane edge matrix
    area0: Array     # (F,) reference area
    kappa0: Array    # (F, 3) reference curvature (κxx, κyy, κxy)
    t: Array         # thickness (F,)
    E: Array
    nu: Array
    rho: Array
    damping: Array
    fixed: Array     # (Nn,) bool
    q0: Array        # (Nn, 6)

    @property
    def n_elems(self) -> int:
        return self.tris.shape[0]


def _tri_frame(p0, p1, p2):
    e1 = p1 - p0
    n = jnp.cross(e1, p2 - p0)
    nz = n / jnp.sqrt(jnp.sum(n * n) + 1e-24)
    ex = e1 / jnp.sqrt(jnp.sum(e1 * e1) + 1e-24)
    ey = jnp.cross(nz, ex)
    return ex, ey, nz


def build_bst_mesh(points, tris, t, E, nu, rho, damping=0.01, fixed=None,
                   dtype=jnp.float32):
    """points (Nn, 3), tris (F, 3) → (BSTMesh, q0 (Nn, 6))."""
    pts = np.asarray(points, float)
    tris = np.asarray(tris, np.int64)
    nn = len(pts)
    F = len(tris)

    # edge → (tri, opposite-vertex) map
    edge_map = {}
    for f, (a, b, c) in enumerate(tris):
        for (u, v, o) in ((a, b, c), (b, c, a), (c, a, b)):
            edge_map.setdefault((min(u, v), max(u, v)), []).append((f, o))

    if fixed is None:
        fixed_np = np.zeros((nn,), bool)
    else:
        fixed_np = np.asarray(fixed, bool)

    patch = np.zeros((F, 6), np.int64)
    pmask = np.zeros((F, 6))
    gmask = np.zeros((F, 6))
    gpu = np.zeros((F, 6, 3))
    gm = np.zeros((F, 6, 3))
    K = np.zeros((F, 3, 6))
    Dinv = np.zeros((F, 2, 2))
    area0 = np.zeros(F)
    for f, (a, b, c) in enumerate(tris):
        patch[f, 0:3] = (a, b, c)
        pmask[f, 0:3] = 1.0
        mirror = {}          # patch slot -> reflected reference position
        # opposite vertices across edges (b,c), (c,a), (a,b)
        for k, ((u, v), o_self) in enumerate((((b, c), a), ((c, a), b),
                                              (((a, b)), c))):
            cands = edge_map[(min(u, v), max(u, v))]
            opp = [o for (ff, o) in cands if ff != f]
            if opp:
                patch[f, 3 + k] = opp[0]
                pmask[f, 3 + k] = 1.0
            elif fixed_np[u] and fixed_np[v]:
                # CLAMPED boundary edge: ghost = the triangle's own
                # opposite vertex reflected across the FIXED mirror plane
                # spanned by the edge line and the support normal (even
                # extension ⇒ zero slope across the edge — the
                # rotation-free clamped condition, ChElementShellBST
                # boundary handling role).  The reflection is applied to
                # the source's WORLD position at runtime: a rigid root
                # rotation then bends the fitted patch, producing the
                # restoring moment (a corotated-frame-height ghost reads
                # zero curvature under rigid rotation — measured: the
                # strip fell over).
                patch[f, 3 + k] = o_self
                pmask[f, 3 + k] = 1.0
                gmask[f, 3 + k] = 1.0
                pu, pv, po = pts[u], pts[v], pts[o_self]
                e = pv - pu
                e = e / (np.linalg.norm(e) + 1e-30)
                n0 = np.cross(pts[b] - pts[a], pts[c] - pts[a])
                n0 /= np.linalg.norm(n0) + 1e-30
                m = np.cross(e, n0)
                m /= np.linalg.norm(m) + 1e-30
                gpu[f, 3 + k] = pu
                gm[f, 3 + k] = m
                d = po - pu
                mirror[3 + k] = po - 2.0 * (d @ m) * m
            else:
                patch[f, 3 + k] = a          # free edge: weight 0
        p0, p1, p2 = pts[a], pts[b], pts[c]
        e1 = p1 - p0
        nrm = np.cross(e1, p2 - p0)
        area0[f] = 0.5 * np.linalg.norm(nrm)
        nz = nrm / (np.linalg.norm(nrm) + 1e-30)
        ex = e1 / (np.linalg.norm(e1) + 1e-30)
        ey = np.cross(nz, ex)
        # reference 2-D coordinates of the patch (relative to centroid)
        cen = (p0 + p1 + p2) / 3.0
        XY = np.stack([[(mirror.get(j, pts[patch[f, j]]) - cen) @ ex,
                        (mirror.get(j, pts[patch[f, j]]) - cen) @ ey]
                       for j in range(6)])
        # quadratic fit z ≈ a + b x + c y + ½κxx x² + ½κyy y² + κxy xy
        Afit = np.stack([np.ones(6), XY[:, 0], XY[:, 1],
                         0.5 * XY[:, 0] ** 2, 0.5 * XY[:, 1] ** 2,
                         XY[:, 0] * XY[:, 1]], axis=1)     # (6, 6)
        Wf = np.diag(pmask[f])
        h = np.sqrt(area0[f])
        # regularize the quadratic block only, at ~1e-6 of its own scale
        # (entries ~ h^4/4): keeps M invertible at free edges (5-point
        # patches under-determine one curvature direction -> soft free
        # edge) without biasing interior fits
        reg = np.diag([0.0, 0, 0, 1, 1, 1]) * 1e-6 * max(h ** 4, 1e-30)
        M = Afit.T @ Wf @ Afit + reg
        Kfull = np.linalg.solve(M, Afit.T @ Wf)            # (6, 6)
        K[f] = Kfull[3:6]                                  # κ rows
        D2 = np.stack([[(p1 - p0) @ ex, (p2 - p0) @ ex],
                       [(p1 - p0) @ ey, (p2 - p0) @ ey]])
        Dinv[f] = np.linalg.inv(D2)

    dt = dtype
    q0 = np.zeros((nn, 6), np.float32)
    q0[:, 0:3] = pts
    if fixed is None:
        fixed = np.zeros((nn,), bool)

    def asdt(x):
        return jnp.asarray(np.broadcast_to(np.asarray(x, float), (F,)), dt)

    mesh = BSTMesh(
        tris=jnp.asarray(tris, jnp.int32),
        patch=jnp.asarray(patch, jnp.int32),
        pmask=jnp.asarray(pmask, dt),
        gmask=jnp.asarray(gmask, dt), gpu=jnp.asarray(gpu, dt),
        gm=jnp.asarray(gm, dt), K=jnp.asarray(K, dt),
        Dref_inv=jnp.asarray(Dinv, dt), area0=jnp.asarray(area0, dt),
        kappa0=jnp.zeros((F, 3), dt),
        t=asdt(t), E=asdt(E), nu=asdt(nu), rho=asdt(rho),
        damping=asdt(damping),
        fixed=jnp.asarray(fixed), q0=jnp.asarray(q0, dt))
    # reference curvature from the reference geometry itself (flat → 0;
    # curved initial surfaces get their built-in κ0 so they start at rest)
    kap0 = _curvatures(mesh, jnp.asarray(q0, dt))
    mesh = BSTMesh(**{**{k: getattr(mesh, k) for k in (
        "tris", "patch", "pmask", "gmask", "gpu", "gm", "K", "Dref_inv",
        "area0", "t", "E", "nu", "rho", "damping", "fixed", "q0")},
        "kappa0": kap0})
    return mesh, jnp.asarray(q0, dt)


def _curvatures(mesh: BSTMesh, q: Array) -> Array:
    """(F, 3) corotated curvature fits at the current configuration."""
    pos = q[:, 0:3]

    def one(tri, patch, pmask, gmask, gpu, gm, K):
        p0, p1, p2 = pos[tri[0]], pos[tri[1]], pos[tri[2]]
        ex, ey, nz = _tri_frame(p0, p1, p2)
        cen = (p0 + p1 + p2) / 3.0

        def height(j):
            pj = pos[patch[j]]
            # clamped-edge mirror ghost: reflect the source vertex across
            # the FIXED mirror plane (even extension -> zero slope)
            d = jnp.sum((pj - gpu[j]) * gm[j])
            pj = pj - gmask[j] * 2.0 * d * gm[j]
            return (pj - cen) @ nz * pmask[j]

        z = jnp.stack([height(j) for j in range(6)])
        return K @ z

    return jax.vmap(one)(mesh.tris, mesh.patch, mesh.pmask, mesh.gmask,
                         mesh.gpu, mesh.gm, mesh.K)


def total_energy(mesh: BSTMesh, q: Array) -> Array:
    pos = q[:, 0:3]
    kap = _curvatures(mesh, q) - mesh.kappa0

    def membrane(tri, Dinv, area0, t, E, nu):
        p0, p1, p2 = pos[tri[0]], pos[tri[1]], pos[tri[2]]
        d = jnp.stack([p1 - p0, p2 - p0], axis=1)          # (3, 2)
        Fm = d @ Dinv                                       # (3, 2)
        C = Fm.T @ Fm
        Exx = 0.5 * (C[0, 0] - 1.0)
        Eyy = 0.5 * (C[1, 1] - 1.0)
        Exy = 0.5 * C[0, 1]
        Cm = E * t / (1.0 - nu * nu)
        return 0.5 * Cm * (Exx ** 2 + Eyy ** 2 + 2 * nu * Exx * Eyy
                           + 2.0 * (1 - nu) * Exy ** 2) * area0

    U_m = jnp.sum(jax.vmap(membrane)(
        mesh.tris, mesh.Dref_inv, mesh.area0, mesh.t, mesh.E, mesh.nu))

    Db = mesh.E * mesh.t ** 3 / (12.0 * (1.0 - mesh.nu ** 2))
    kx, ky, kxy = kap[:, 0], kap[:, 1], kap[:, 2]
    U_b = jnp.sum(0.5 * Db * (kx ** 2 + ky ** 2 + 2 * mesh.nu * kx * ky
                              + 2.0 * (1 - mesh.nu) * kxy ** 2)
                  * mesh.area0)
    return U_m + U_b


def internal_forces(mesh: BSTMesh, q: Array) -> Array:
    return -jax.grad(lambda qq: total_energy(mesh, qq))(q)


def mass_matrix(mesh: BSTMesh, n_nodes: int) -> Array:
    m_el = mesh.rho * mesh.t * mesh.area0 / 3.0
    w = jnp.zeros((n_nodes,))
    for k in range(3):
        w = w.at[mesh.tris[:, k]].add(m_el)
    # rotation slots are inert: unit dummy inertia keeps M invertible;
    # fea.dynamics masks those DOFs like the solid elements
    diag = jnp.stack([w, w, w, jnp.ones_like(w), jnp.ones_like(w),
                      jnp.ones_like(w)], axis=1).reshape(-1)
    return jnp.diag(diag)


def gravity_loads(mesh: BSTMesh, n_nodes: int, g) -> Array:
    m_el = mesh.rho * mesh.t * mesh.area0 / 3.0
    w = jnp.zeros((n_nodes,))
    for k in range(3):
        w = w.at[mesh.tris[:, k]].add(m_el)
    f = jnp.zeros((n_nodes, 6))
    return f.at[:, 0:3].set(w[:, None] * jnp.asarray(g)[None, :])


def grid_tri_mesh(nx, ny, Lx, Ly, origin=(0.0, 0.0, 0.0)):
    """Structured triangulated plate; returns (points, tris, ids grid)."""
    o = np.asarray(origin, float)
    ids = np.arange((nx + 1) * (ny + 1)).reshape(nx + 1, ny + 1)
    pts = np.zeros(((nx + 1) * (ny + 1), 3))
    for i in range(nx + 1):
        for j in range(ny + 1):
            pts[ids[i, j]] = o + [i * Lx / nx, j * Ly / ny, 0.0]
    tris = []
    for i in range(nx):
        for j in range(ny):
            a, b = ids[i, j], ids[i + 1, j]
            c, d = ids[i + 1, j + 1], ids[i, j + 1]
            tris.append((a, b, c))
            tris.append((a, c, d))
    return pts, np.asarray(tris, np.int64), ids
