"""Reissner–Mindlin 4-node shell with rotation DOFs (6 DOF/node).

Counterpart of the reference's ChElementShellReissner4
(/root/reference/src/chrono/fea/ChElementShellReissner4.h — 4-node
geometrically exact Reissner shell on ChNodeFEAxyzrot nodes, ANS shear
treatment, drilling stiffness).  Deliberately different construction: a
corotational energy formulation — element frame fit to the current
geometry, local node displacements/rotations extracted, then

    U = membrane (plane stress, 2x2 Gauss)
      + bending   (curvature = local rotation gradient, 2x2 Gauss)
      + shear     (gamma = grad w + theta x n, 1-POINT reduced
                   integration — the classic shear-locking cure standing
                   in for the reference's ANS interpolation)
      + drilling  (small penalty on the in-plane rotation, as the
                   reference's drilling stiffness)

and internal forces + consistent tangent come from autodiff.  Node layout
[pos (3), rotation vector theta (3)] in the shared (Nn, 6) FEA vector, so
the static/HHT machinery in fea.dynamics drives it unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass

_G2 = np.array([-1.0, 1.0]) / np.sqrt(3.0)


@pytree_dataclass
class ReissnerProps:
    a: Array        # (E,) element x-size (local ξ direction)
    b: Array        # (E,) element y-size
    t: Array        # thickness
    E: Array
    nu: Array
    rho: Array
    damping: Array
    drill: Array    # drilling penalty scale (fraction of G·t)
    R0: Array       # (E, 3, 3) reference element frame


@pytree_dataclass
class ReissnerMesh:
    elems: Array    # (E, 4) node ids, CCW
    props: ReissnerProps
    fixed: Array
    q0: Array       # (Nn, 6)

    @property
    def n_elems(self) -> int:
        return self.elems.shape[0]


def _rotvec_to_matrix(th):
    from chrono_tpu.core import quaternion as Q
    return Q.q_to_matrix(Q.qexp_half(th))


def _N(xi, eta):
    return 0.25 * jnp.array([(1 - xi) * (1 - eta), (1 + xi) * (1 - eta),
                             (1 + xi) * (1 + eta), (1 - xi) * (1 + eta)])


def _dN(xi, eta):
    dxi = 0.25 * jnp.array([-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)])
    det = 0.25 * jnp.array([-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)])
    return dxi, det


def element_energy(q_elem, q0_elem, a, b, t, E, nu, damping, drill, R0):
    del damping
    p = q_elem[:, 0:3]                      # (4, 3) current positions
    th = q_elem[:, 3:6]
    p0 = q0_elem[:, 0:3]

    # corotated frame: ez from the diagonals, ex along the ξ edge mean
    d1 = p[2] - p[0]
    d2 = p[3] - p[1]
    ez = jnp.cross(d1, d2)
    ez = ez / jnp.sqrt(jnp.sum(ez * ez) + 1e-24)
    ex_raw = 0.5 * (p[1] + p[2] - p[0] - p[3])
    ex = ex_raw - jnp.sum(ex_raw * ez) * ez
    ex = ex / jnp.sqrt(jnp.sum(ex * ex) + 1e-24)
    ey = jnp.cross(ez, ex)
    Rc = jnp.stack([ex, ey, ez], axis=1)    # world→local = Rc.T

    c = jnp.mean(p, axis=0)
    c0 = jnp.mean(p0, axis=0)
    xl = (p - c) @ Rc                       # (4, 3) local positions
    xl0 = (p0 - c0) @ R0                    # reference locals
    u = xl - xl0                            # local displacements

    # local node rotations: R_local = Rc.T · exp(θ) · R0, skew part
    def loc_rot(thi):
        A = Rc.T @ (_rotvec_to_matrix(thi) @ R0)
        return 0.5 * jnp.array([A[2, 1] - A[1, 2], A[0, 2] - A[2, 0],
                                A[1, 0] - A[0, 1]])

    tl = jax.vmap(loc_rot)(th)              # (4, 3) local rotations

    G = E / (2.0 * (1.0 + nu))
    Cm = E * t / (1.0 - nu * nu)            # membrane stiffness scale
    Db = E * t ** 3 / (12.0 * (1.0 - nu * nu))
    kGt = (5.0 / 6.0) * G * t

    ja, jb = 2.0 / a, 2.0 / b               # dξ/dx etc.

    def gp_membrane_bending(xi, eta):
        dxi, det = _dN(xi, eta)
        # in-plane displacement gradients (local)
        dux = (dxi @ u[:, 0]) * ja
        duy = (det @ u[:, 0]) * jb
        dvx = (dxi @ u[:, 1]) * ja
        dvy = (det @ u[:, 1]) * jb
        exx, eyy, gxy = dux, dvy, duy + dvx
        U_m = 0.5 * Cm * (exx ** 2 + eyy ** 2 + 2 * nu * exx * eyy
                          + 0.5 * (1 - nu) * gxy ** 2)
        # curvatures from rotation gradients: κx = ∂θy/∂x, κy = −∂θx/∂y,
        # κxy = ∂θy/∂y − ∂θx/∂x
        kx = (dxi @ tl[:, 1]) * ja
        ky = -(det @ tl[:, 0]) * jb
        kxy = (det @ tl[:, 1]) * jb - (dxi @ tl[:, 0]) * ja
        U_b = 0.5 * Db * (kx ** 2 + ky ** 2 + 2 * nu * kx * ky
                          + 0.5 * (1 - nu) * kxy ** 2)
        # drilling penalty: local z rotation vs in-plane displacement spin
        spin = 0.5 * (dvx - duy)
        thz = _N(xi, eta) @ tl[:, 2]
        U_d = 0.5 * drill * G * t * (thz - spin) ** 2
        return U_m + U_b + U_d

    U = 0.0
    for xi in _G2:
        for eta in _G2:
            U = U + gp_membrane_bending(xi, eta) * (a * b / 4.0)

    # transverse shear, one-point reduced integration at the center
    dxi, det = _dN(0.0, 0.0)
    dwx = (dxi @ u[:, 2]) * ja
    dwy = (det @ u[:, 2]) * jb
    thx = jnp.mean(tl[:, 0])
    thy = jnp.mean(tl[:, 1])
    gxz = dwx + thy                         # γ = ∇w + θ×n conventions
    gyz = dwy - thx
    U_s = 0.5 * kGt * (gxz ** 2 + gyz ** 2) * (a * b)
    return U + U_s


def total_energy(mesh: ReissnerMesh, q: Array) -> Array:
    qe = q[mesh.elems]
    q0e = mesh.q0[mesh.elems]
    pr = mesh.props
    return jnp.sum(jax.vmap(element_energy)(
        qe, q0e, pr.a, pr.b, pr.t, pr.E, pr.nu, pr.damping, pr.drill,
        pr.R0))


def internal_forces(mesh: ReissnerMesh, q: Array) -> Array:
    return -jax.grad(lambda qq: total_energy(mesh, qq))(q)


def mass_matrix(mesh: ReissnerMesh, n_nodes: int) -> Array:
    pr = mesh.props
    m_el = pr.rho * pr.t * pr.a * pr.b / 4.0
    j_el = m_el * (pr.a ** 2 + pr.b ** 2 + pr.t ** 2) / 12.0
    w = jnp.zeros((n_nodes,))
    jw = jnp.zeros((n_nodes,))
    for k in range(4):
        w = w.at[mesh.elems[:, k]].add(m_el)
        jw = jw.at[mesh.elems[:, k]].add(j_el)
    diag = jnp.stack([w, w, w, jw, jw, jw], axis=1).reshape(-1)
    return jnp.diag(diag)


def gravity_loads(mesh: ReissnerMesh, n_nodes: int, g) -> Array:
    pr = mesh.props
    m_el = pr.rho * pr.t * pr.a * pr.b / 4.0
    w = jnp.zeros((n_nodes,))
    for k in range(4):
        w = w.at[mesh.elems[:, k]].add(m_el)
    f = jnp.zeros((n_nodes, 6))
    return f.at[:, 0:3].set(w[:, None] * jnp.asarray(g)[None, :])


class ReissnerBuilder:
    """Rectangular Reissner-shell plates (ChElementShellReissner4 role)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.nodes = []
        self.elems = []
        self.props = []

    def add_node(self, pos, fixed=False) -> int:
        self.nodes.append((np.asarray(pos, float), bool(fixed)))
        return len(self.nodes) - 1

    def add_element(self, n0, n1, n2, n3, a, b, t, E, nu, rho,
                    damping=0.01, drill=1e-3):
        self.elems.append((n0, n1, n2, n3))
        self.props.append((a, b, t, E, nu, rho, damping, drill))

    def add_plate(self, origin, nx, ny, Lx, Ly, t, E, nu, rho,
                  damping=0.01, fix_edge_x0=False):
        """x-y plate grid; returns the (nx+1)x(ny+1) node-id array."""
        o = np.asarray(origin, float)
        ids = np.zeros((nx + 1, ny + 1), int)
        for i in range(nx + 1):
            for j in range(ny + 1):
                fixed = fix_edge_x0 and i == 0
                ids[i, j] = self.add_node(
                    o + [i * Lx / nx, j * Ly / ny, 0.0], fixed=fixed)
        for i in range(nx):
            for j in range(ny):
                self.add_element(ids[i, j], ids[i + 1, j],
                                 ids[i + 1, j + 1], ids[i, j + 1],
                                 Lx / nx, Ly / ny, t, E, nu, rho, damping)
        return ids

    def finalize(self):
        dt = self.dtype
        pts = np.stack([p for p, _ in self.nodes])
        elems = np.asarray(self.elems, np.int32)
        pr = np.asarray(self.props, float)
        ne = len(elems)
        R0 = np.zeros((ne, 3, 3))
        for e, (n0, n1, n2, n3) in enumerate(elems):
            d1 = pts[n2] - pts[n0]
            d2 = pts[n3] - pts[n1]
            ez = np.cross(d1, d2)
            ez /= np.linalg.norm(ez)
            ex = 0.5 * (pts[n1] + pts[n2] - pts[n0] - pts[n3])
            ex -= ex @ ez * ez
            ex /= np.linalg.norm(ex)
            ey = np.cross(ez, ex)
            R0[e] = np.stack([ex, ey, ez], axis=1)
        q0 = np.zeros((len(pts), 6), np.float32)
        q0[:, 0:3] = pts
        props = ReissnerProps(
            a=jnp.asarray(pr[:, 0], dt), b=jnp.asarray(pr[:, 1], dt),
            t=jnp.asarray(pr[:, 2], dt), E=jnp.asarray(pr[:, 3], dt),
            nu=jnp.asarray(pr[:, 4], dt), rho=jnp.asarray(pr[:, 5], dt),
            damping=jnp.asarray(pr[:, 6], dt),
            drill=jnp.asarray(pr[:, 7], dt), R0=jnp.asarray(R0, dt))
        mesh = ReissnerMesh(
            elems=jnp.asarray(elems), props=props,
            fixed=jnp.asarray([f for _, f in self.nodes]),
            q0=jnp.asarray(q0, dt))
        return mesh, jnp.asarray(q0, dt)
