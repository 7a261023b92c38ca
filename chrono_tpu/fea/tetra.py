"""4-node tetrahedral solid elements (linear, SVK material).

Counterpart of the reference's tetrahedral family
(/root/reference/src/chrono/fea: ChElementTetraCorot_4, ChElementTetraANCF):
linear displacement interpolation (constant deformation gradient → one-point
quadrature is exact for the energy density), Green–Lagrange /
St.Venant–Kirchhoff strain energy, internal forces and tangent stiffness by
autodiff — the same strain-energy-only element definition as the hexa
(fea/solid.py).  Unlike the regular-brick hexa, tets handle UNSTRUCTURED
meshes: the reference inverse edge matrix is stored per element.

Nodes carry translations in the shared (Nn, 6) layout (director slots inert).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class TetraProps:
    E: Array         # (E,)
    nu: Array
    rho: Array
    damping: Array
    vol: Array       # (E,) reference volume
    Dm_inv: Array    # (E, 3, 3) inverse reference edge matrix


@pytree_dataclass
class TetraMesh:
    elems: Array     # (E, 4) node indices
    props: TetraProps
    fixed: Array     # (Nn,) bool
    q0: Array        # (Nn, 6) reference coords

    @property
    def n_elems(self) -> int:
        return self.elems.shape[0]


def element_energy(q_elem, q0_elem, Dm_inv, vol, E, nu):
    """SVK energy of one tet; q_elem (4, 6), positions in [:, 0:3].

    F = Ds·Dm⁻¹ with Ds the deformed edge matrix; built from displacement
    deltas for fp32 robustness (H = F − I directly, no cancellation)."""
    u = q_elem[:, 0:3] - q0_elem[:, 0:3]
    dU = jnp.stack([u[1] - u[0], u[2] - u[0], u[3] - u[0]], axis=1)  # (3,3)
    H = dU @ Dm_inv                       # displacement gradient
    Egl = 0.5 * (H + H.T + H.T @ H)
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    tr = jnp.trace(Egl)
    return vol * (0.5 * lam * tr * tr + mu * jnp.sum(Egl * Egl))


def total_energy(mesh: TetraMesh, q: Array) -> Array:
    qe = q[mesh.elems]
    q0e = mesh.q0[mesh.elems]
    p = mesh.props
    return jnp.sum(jax.vmap(element_energy)(qe, q0e, p.Dm_inv, p.vol,
                                            p.E, p.nu))


def internal_forces(mesh: TetraMesh, q: Array) -> Array:
    return -jax.grad(lambda qq: total_energy(mesh, qq))(q)


def _lumped_node_mass(mesh: TetraMesh, n_nodes: int) -> Array:
    m_el = mesh.props.rho * mesh.props.vol / 4.0
    w = jnp.zeros((n_nodes,))
    for k in range(4):
        w = w.at[mesh.elems[:, k]].add(m_el)
    return w


def mass_matrix(mesh: TetraMesh, n_nodes: int) -> Array:
    w = _lumped_node_mass(mesh, n_nodes)
    diag = jnp.stack([w, w, w, jnp.ones_like(w), jnp.ones_like(w),
                      jnp.ones_like(w)], axis=1).reshape(-1)
    return jnp.diag(diag)


def gravity_loads(mesh: TetraMesh, n_nodes: int, g) -> Array:
    w = _lumped_node_mass(mesh, n_nodes)
    f = jnp.zeros((n_nodes, 6))
    return f.at[:, 0:3].set(w[:, None] * jnp.asarray(g)[None, :])


# 5-tet decomposition of a cube given its 8 corner ids in solid.py order
_CUBE_TO_TETS = [(0, 1, 2, 5), (0, 2, 3, 7), (0, 5, 2, 7), (0, 5, 7, 4),
                 (2, 7, 5, 6)]


class TetraBuilder:
    """Unstructured tet meshes + a brick-lattice convenience (5 tets/cube)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.nodes = []      # (pos, fixed)
        self.elems = []
        self.props = []      # (E, nu, rho, damping)

    def add_node(self, pos, fixed=False) -> int:
        self.nodes.append((np.asarray(pos, float), bool(fixed)))
        return len(self.nodes) - 1

    def add_element(self, n0, n1, n2, n3, E, nu, rho, damping=0.02):
        self.elems.append((n0, n1, n2, n3))
        self.props.append((E, nu, rho, damping))

    def add_block(self, origin, nx, ny, nz, Lx, Ly, Lz, E, nu, rho,
                  damping=0.02, fix_face=None):
        """nx×ny×nz cube lattice, each cube split into 5 tets."""
        ox, oy, oz = origin
        dx, dy, dz = Lx / nx, Ly / ny, Lz / nz
        ids = np.zeros((nx + 1, ny + 1, nz + 1), int)
        for i in range(nx + 1):
            for j in range(ny + 1):
                for k in range(nz + 1):
                    fixed = ((fix_face == "x0" and i == 0)
                             or (fix_face == "x1" and i == nx)
                             or (fix_face == "y0" and j == 0)
                             or (fix_face == "y1" and j == ny)
                             or (fix_face == "z0" and k == 0)
                             or (fix_face == "z1" and k == nz))
                    ids[i, j, k] = self.add_node(
                        [ox + i * dx, oy + j * dy, oz + k * dz], fixed)
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    c = [ids[i, j, k], ids[i + 1, j, k],
                         ids[i + 1, j + 1, k], ids[i, j + 1, k],
                         ids[i, j, k + 1], ids[i + 1, j, k + 1],
                         ids[i + 1, j + 1, k + 1], ids[i, j + 1, k + 1]]
                    for t in _CUBE_TO_TETS:
                        self.add_element(c[t[0]], c[t[1]], c[t[2]], c[t[3]],
                                         E, nu, rho, damping)
        return ids

    def finalize(self):
        dt = self.dtype
        pts = np.stack([p for p, _ in self.nodes])
        elems = np.asarray(self.elems, np.int32)
        pr = np.asarray(self.props, float)
        # reference edge matrices
        p0 = pts[elems[:, 0]]
        Dm = np.stack([pts[elems[:, 1]] - p0, pts[elems[:, 2]] - p0,
                       pts[elems[:, 3]] - p0], axis=2)     # (E, 3, 3)
        vol = np.abs(np.linalg.det(Dm)) / 6.0
        if (vol < 1e-14).any():
            raise ValueError("degenerate tetrahedron in mesh")
        Dm_inv = np.linalg.inv(Dm)
        q = np.zeros((len(pts), 6), np.float32)
        q[:, 0:3] = pts
        props = TetraProps(
            E=jnp.asarray(pr[:, 0], dt), nu=jnp.asarray(pr[:, 1], dt),
            rho=jnp.asarray(pr[:, 2], dt), damping=jnp.asarray(pr[:, 3], dt),
            vol=jnp.asarray(vol, dt), Dm_inv=jnp.asarray(Dm_inv, dt))
        mesh = TetraMesh(elems=jnp.asarray(elems), props=props,
                         fixed=jnp.asarray([f for _, f in self.nodes]),
                         q0=jnp.asarray(q, dt))
        return mesh, jnp.asarray(q, dt)
