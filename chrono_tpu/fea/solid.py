"""8-node hexahedral solid elements (trilinear, SVK material).

Counterpart of the reference's solid-element families
(/root/reference/src/chrono/fea: ChElementHexaCorot_8, ChElementHexaANCF_3813
— 8-node bricks): trilinear displacement interpolation, Green–Lagrange /
St.Venant–Kirchhoff strain energy, 2×2×2 Gauss quadrature, internal forces
and tangent stiffness by autodiff over the energy functional (the same
pattern as the cable/shell elements; the reference hand-derives corotational
stiffness).

Nodes carry only translations; the (Nn, 6) layout keeps the directors unused
(zero) so the shared HHT/statics machinery in chrono_tpu.fea.dynamics works
unchanged (director DOFs are masked fixed).

fp32 note: strain is built from nodal DISPLACEMENT deltas against the stored
reference configuration (see fea/shell.py for why).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass

_G2 = np.array([-1.0, 1.0]) / np.sqrt(3.0)

# node order: (ξ,η,ζ) corners of the unit cube, gray-code order
_CORNERS = np.array([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
                     [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], float)


@pytree_dataclass
class SolidProps:
    a: Array      # (E,) element size along x
    b: Array
    c: Array
    E: Array
    nu: Array
    rho: Array
    damping: Array


@pytree_dataclass
class SolidMesh:
    elems: Array      # (E, 8) node indices (corner order above)
    props: SolidProps
    fixed: Array      # (Nn,) bool
    q0: Array         # (Nn, 6) reference coords (directors zero)

    @property
    def n_elems(self) -> int:
        return self.elems.shape[0]


def _N(xi, eta, zeta):
    c = jnp.asarray(_CORNERS)
    return 0.125 * (1 + c[:, 0] * xi) * (1 + c[:, 1] * eta) \
        * (1 + c[:, 2] * zeta)


def _dN(xi, eta, zeta):
    c = jnp.asarray(_CORNERS)
    dxi = 0.125 * c[:, 0] * (1 + c[:, 1] * eta) * (1 + c[:, 2] * zeta)
    deta = 0.125 * c[:, 1] * (1 + c[:, 0] * xi) * (1 + c[:, 2] * zeta)
    dzeta = 0.125 * c[:, 2] * (1 + c[:, 0] * xi) * (1 + c[:, 1] * eta)
    return dxi, deta, dzeta


def element_energy(q_elem, q0_elem, a, b, c, E, nu):
    """SVK strain energy; q_elem (8, 6), positions in [:, 0:3]."""
    u = q_elem[:, 0:3] - q0_elem[:, 0:3]
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))

    def density(xi, eta, zeta):
        dxi, deta, dzeta = _dN(xi, eta, zeta)
        # reference jacobian diag(a,b,c)/2
        hx = (dxi[:, None] * u).sum(0) * (2.0 / a)
        hy = (deta[:, None] * u).sum(0) * (2.0 / b)
        hz = (dzeta[:, None] * u).sum(0) * (2.0 / c)
        H = jnp.stack([hx, hy, hz], axis=1)
        Egl = 0.5 * (H + H.T + H.T @ H)
        tr = jnp.trace(Egl)
        return 0.5 * lam * tr * tr + mu * jnp.sum(Egl * Egl)

    U = 0.0
    for gx in _G2:
        for gy in _G2:
            for gz in _G2:
                U = U + density(gx, gy, gz)
    return U * (a / 2) * (b / 2) * (c / 2)


def total_energy(mesh: SolidMesh, q: Array) -> Array:
    qe = q[mesh.elems]
    q0e = mesh.q0[mesh.elems]
    p = mesh.props
    return jnp.sum(jax.vmap(element_energy)(qe, q0e, p.a, p.b, p.c,
                                            p.E, p.nu))


def internal_forces(mesh: SolidMesh, q: Array) -> Array:
    return -jax.grad(lambda qq: total_energy(mesh, qq))(q)


def mass_matrix(mesh: SolidMesh, n_nodes: int) -> Array:
    """Lumped mass on translation DOFs; director DOFs get unit placeholder
    mass (they are masked fixed by the mesh builder)."""
    p = mesh.props
    m_el = p.rho * p.a * p.b * p.c / 8.0
    w = jnp.zeros((n_nodes,))
    for k in range(8):
        w = w.at[mesh.elems[:, k]].add(m_el)
    diag = jnp.stack([w, w, w, jnp.ones_like(w), jnp.ones_like(w),
                      jnp.ones_like(w)], axis=1).reshape(-1)
    return jnp.diag(diag)


def gravity_loads(mesh: SolidMesh, n_nodes: int, g) -> Array:
    p = mesh.props
    m_el = p.rho * p.a * p.b * p.c / 8.0
    w = jnp.zeros((n_nodes,))
    for k in range(8):
        w = w.at[mesh.elems[:, k]].add(m_el)
    f = jnp.zeros((n_nodes, 6))
    return f.at[:, 0:3].set(w[:, None] * jnp.asarray(g)[None, :])


class SolidBuilder:
    """Regular brick lattices (ChBuilder role for hexa solids)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.nodes = []
        self.elems = []
        self.props = []

    def add_block(self, origin, nx, ny, nz, Lx, Ly, Lz, E, nu, rho,
                  damping=0.02, fix_face=None):
        """nx×ny×nz element block; ``fix_face`` ∈ {None,x0,x1,y0,y1,z0,z1}."""
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
                    ids[i, j, k] = len(self.nodes)
                    self.nodes.append((np.array([ox + i * dx, oy + j * dy,
                                                 oz + k * dz]), fixed))
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    n = [ids[i, j, k], ids[i + 1, j, k], ids[i + 1, j + 1, k],
                         ids[i, j + 1, k], ids[i, j, k + 1],
                         ids[i + 1, j, k + 1], ids[i + 1, j + 1, k + 1],
                         ids[i, j + 1, k + 1]]
                    self.elems.append(n)
                    self.props.append((dx, dy, dz, E, nu, rho, damping))
        return ids

    def finalize(self):
        dt = self.dtype
        pts = np.stack([p for p, _ in self.nodes])
        q = np.zeros((len(pts), 6), np.float32)
        q[:, 0:3] = pts
        q = jnp.asarray(q, dt)
        fixed = jnp.asarray([f for _, f in self.nodes])
        pr = np.asarray(self.props, float)
        props = SolidProps(
            a=jnp.asarray(pr[:, 0], dt), b=jnp.asarray(pr[:, 1], dt),
            c=jnp.asarray(pr[:, 2], dt), E=jnp.asarray(pr[:, 3], dt),
            nu=jnp.asarray(pr[:, 4], dt), rho=jnp.asarray(pr[:, 5], dt),
            damping=jnp.asarray(pr[:, 6], dt))
        mesh = SolidMesh(elems=jnp.asarray(self.elems, jnp.int32),
                         props=props, fixed=fixed, q0=q)
        return mesh, q
