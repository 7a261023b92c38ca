"""ANCF shell elements (4-node, position + transverse-gradient nodes).

TPU-native counterpart of the reference's ``ChElementShellANCF_3423``
(/root/reference/src/chrono/fea/ChElementShellANCF_3423.h — bilinear ANCF
shell, 4 nodes × [position r, transverse gradient ∂r/∂z] = 24 DOF, laminated
continuum formulation with EAS/ANS locking control).  Same kinematics here:

    r(ξ,η,ζ) = Σᵢ Nᵢ(ξ,η) rᵢ + (t ζ / 2) Σᵢ Nᵢ(ξ,η) dᵢ        ξ,η,ζ ∈ [-1,1]

but the constitutive treatment is the TPU-idiomatic one: the element is
defined ONLY by a strain-energy functional (split into plane-stress membrane/
bending, transverse shear with a 5/6 correction factor, and transverse normal
stiffness — the standard shell split that avoids the Poisson thickness locking
the reference counters with EAS), and internal forces/Jacobians come from
autodiff instead of the reference's hand-derived ~3k-line evaluators.
Validated against thin-plate theory (tests/test_shell.py).

Node layout matches the cable module: q (Nn, 6) = [r (3), director d (3)],
so the HHT/Newton machinery in chrono_tpu.fea.dynamics drives both.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass

# 2-point Gauss on [-1, 1]
_G2 = np.array([-1.0, 1.0]) / np.sqrt(3.0)
_W2 = np.array([1.0, 1.0])


@pytree_dataclass
class ShellProps:
    """Per-element geometry/material (isotropic single layer)."""

    a: Array          # (E,) element length along ξ (reference x)
    b: Array          # (E,) element length along η (reference y)
    t: Array          # (E,) thickness
    E: Array          # (E,) Young's modulus
    nu: Array         # (E,)
    rho: Array        # (E,) density
    damping: Array    # (E,) Rayleigh β_K


@pytree_dataclass
class ShellMesh:
    elems: Array      # (E, 4) node indices, CCW: (0,0),(a,0),(a,b),(0,b)
    props: ShellProps
    fixed: Array      # (Nn,) bool
    q0: Array         # (Nn, 6) reference nodal coordinates
    R0: Array         # (E, 3, 3) element frame (columns = local axes, world)

    @property
    def n_elems(self) -> int:
        return self.elems.shape[0]


def _N(xi, eta):
    """Bilinear shape functions at (ξ, η) ∈ [-1,1]²; node order CCW."""
    return 0.25 * jnp.stack([(1 - xi) * (1 - eta), (1 + xi) * (1 - eta),
                             (1 + xi) * (1 + eta), (1 - xi) * (1 + eta)])


def _dN(xi, eta):
    """(∂N/∂ξ, ∂N/∂η) each (4,)."""
    dxi = 0.25 * jnp.stack([-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)])
    deta = 0.25 * jnp.stack([-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)])
    return dxi, deta


def element_energy(q_elem: Array, q0_elem: Array, R0: Array,
                   a, b, t, E, nu) -> Array:
    """Strain energy of one element; q_elem (4, 6) = [r, d] per node.

    Green–Lagrange strain in the element reference frame (flat rectangular
    reference config), split shell energy:
      membrane/bending : plane-stress stiffness on (Exx, Eyy, Exy)
      transverse shear : κ G (Exz², Eyz²), κ = 5/6
      transverse normal: E Ezz² / 2  (uncoupled — avoids thickness locking)
    Integrated 2×2×2 Gauss.

    fp32-critical detail: the deformation gradient is assembled as
    F = I + H with H built from nodal DELTAS (u = q − q0 rotated into the
    element frame), never from absolute positions — otherwise the C − I
    cancellation turns coordinate roundoff into strain noise of the same
    order as real working strains.
    """
    u = (q_elem[:, 0:3] - q0_elem[:, 0:3]) @ R0        # (4,3) local disp
    dd = (q_elem[:, 3:6] - q0_elem[:, 3:6]) @ R0       # (4,3) director delta
    G = E / (2.0 * (1.0 + nu))
    C11 = E / (1.0 - nu * nu)            # plane-stress
    kappa = 5.0 / 6.0
    eye = jnp.eye(3, dtype=q_elem.dtype)

    def strain(xi, eta, zeta):
        dxi, deta = _dN(xi, eta)
        z_half = 0.5 * t * zeta
        # H columns: ∂u/∂X (local frame; reference jacobian diag(a,b,t)/2,
        # reference director = local e_z exactly)
        h_x = (dxi[:, None] * (u + z_half * dd)).sum(0) * (2.0 / a)
        h_y = (deta[:, None] * (u + z_half * dd)).sum(0) * (2.0 / b)
        h_z = (_N(xi, eta)[:, None] * dd).sum(0)
        H = jnp.stack([h_x, h_y, h_z], axis=1)
        return 0.5 * (H + H.T + H.T @ H)

    def u_inplane(xi, eta, zeta):
        Egl = strain(xi, eta, zeta)
        exx, eyy, ezz = Egl[0, 0], Egl[1, 1], Egl[2, 2]
        exy = Egl[0, 1]
        return (0.5 * C11 * (exx * exx + eyy * eyy + 2 * nu * exx * eyy)
                + 2.0 * G * exy * exy + 0.5 * E * ezz * ezz)

    def u_shear(xi, eta, zeta):
        Egl = strain(xi, eta, zeta)
        return 2.0 * kappa * G * (Egl[0, 2] ** 2 + Egl[1, 2] ** 2)

    # selective reduced integration: full 2×2 in-plane quadrature for the
    # membrane/bending/normal terms, 1-point (center) for transverse shear —
    # the classic cure for the shear locking the reference's 3423 element
    # addresses with ANS (ChElementShellANCF_3423.cpp)
    U = 0.0
    detJ = (a / 2) * (b / 2) * (t / 2)
    for gz, wz in zip(_G2, _W2):
        for gx, wx in zip(_G2, _W2):
            for gy, wy in zip(_G2, _W2):
                U = U + wx * wy * wz * u_inplane(gx, gy, gz)
        U = U + 4.0 * wz * u_shear(0.0, 0.0, gz)
    return U * detJ


def gather_elem_q(q: Array, elems: Array) -> Array:
    return q[elems]                                   # (E, 4, 6)


def total_energy(mesh: ShellMesh, q: Array) -> Array:
    qe = gather_elem_q(q, mesh.elems)
    q0e = gather_elem_q(mesh.q0, mesh.elems)
    p = mesh.props
    return jnp.sum(jax.vmap(element_energy)(qe, q0e, mesh.R0,
                                            p.a, p.b, p.t, p.E, p.nu))


def internal_forces(mesh: ShellMesh, q: Array) -> Array:
    """−∂U/∂q, scattered to nodes (Nn, 6)."""
    return -jax.grad(lambda qq: total_energy(mesh, qq))(q)


def element_mass(a, b, t, rho, dtype=jnp.float32) -> Array:
    """Consistent 24×24 element mass matrix (exact 2×2×2 Gauss — the shape
    functions are bilinear×linear).  DOF order: node-major [r, d]."""
    M = jnp.zeros((24, 24), dtype)
    detJ = (a / 2) * (b / 2) * (t / 2)
    for gx, wx in zip(_G2, _W2):
        for gy, wy in zip(_G2, _W2):
            for gz, wz in zip(_G2, _W2):
                N = _N(gx, gy)
                z_half = 0.5 * t * gz
                # S maps q (24,) to r(ξ): position block N_i, director z/2·N_i
                s = jnp.concatenate([jnp.stack([N[i] * jnp.ones(()),
                                                z_half * N[i]])
                                     for i in range(4)])   # (8,) blocks
                Sb = s[:, None] * s[None, :]                # (8, 8)
                M = M + (wx * wy * wz * rho) * jnp.kron(Sb, jnp.eye(3, dtype=dtype))
    return M * detJ


def mass_matrix(mesh: ShellMesh, n_nodes: int) -> Array:
    """Assembled dense (6Nn, 6Nn) mass matrix."""
    p = mesh.props
    Me = jax.vmap(lambda a, b, t, r: element_mass(a, b, t, r))(
        p.a, p.b, p.t, p.rho)                          # (E, 24, 24)
    nd = 6 * n_nodes
    M = jnp.zeros((nd, nd))

    def dof(nodes):
        # (4,) node ids -> (24,) dof ids, node-major [r(3), d(3)]
        return (6 * nodes[:, None] + jnp.arange(6)[None, :]).reshape(-1)

    dofs = jax.vmap(dof)(mesh.elems)                   # (E, 24)
    E_ = mesh.n_elems
    ii = jnp.repeat(dofs, 24, axis=1).reshape(E_, 24, 24)
    jj = jnp.tile(dofs[:, None, :], (1, 24, 1))
    M = M.at[ii.reshape(-1), jj.reshape(-1)].add(Me.reshape(-1))
    return M


def mass_diag_lumped(mesh: ShellMesh, n_nodes: int) -> Array:
    """HRZ-lumped diagonal mass (6Nn,) — never materializes the (6Nn)²
    consistent matrix, which is what unlocks 10k+-DOF dynamics (the
    reference keeps M sparse for the same reason,
    /root/reference/src/chrono/fea/ChMesh.cpp mass assembly).  Per element:
    take diag(Me), scale so the translational diagonal carries the exact
    element mass (Hinton-Rock-Zienkiewicz)."""
    p = mesh.props
    Me = jax.vmap(lambda a, b, t, r: element_mass(a, b, t, r))(
        p.a, p.b, p.t, p.rho)
    d = jnp.diagonal(Me, axis1=1, axis2=2)               # (E, 24)
    tr = jnp.tile(jnp.concatenate([jnp.ones(3), jnp.zeros(3)]), 4)
    m_el = p.rho * p.a * p.b * p.t                        # element mass
    s = 3.0 * m_el / jnp.maximum(jnp.sum(d * tr[None, :], axis=1), 1e-30)
    d = d * s[:, None]
    dofs = (6 * mesh.elems[:, :, None]
            + jnp.arange(6)[None, None, :]).reshape(mesh.n_elems, 24)
    out = jnp.zeros((6 * n_nodes,))
    return out.at[dofs.reshape(-1)].add(d.reshape(-1))


def gravity_loads(mesh: ShellMesh, n_nodes: int, g) -> Array:
    """Lumped gravity (position DOFs): each element spreads ρ·a·b·t/4 per node."""
    p = mesh.props
    w_el = p.rho * p.a * p.b * p.t * 0.25
    w = jnp.zeros((n_nodes,))
    for k in range(4):
        w = w.at[mesh.elems[:, k]].add(w_el)
    f = jnp.zeros((n_nodes, 6))
    return f.at[:, 0:3].set(w[:, None] * jnp.asarray(g)[None, :])


class ShellBuilder:
    """Assemble rectangular shell meshes (the reference's shell ChBuilder
    role)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.nodes = []        # (pos, director, fixed)
        self.elems = []
        self.props = []

    def add_node(self, pos, director=(0, 0, 1), fixed=False) -> int:
        self.nodes.append((np.asarray(pos, float),
                           np.asarray(director, float), bool(fixed)))
        return len(self.nodes) - 1

    def add_element(self, n0, n1, n2, n3, a, b, t, E, nu, rho, damping=0.01):
        self.elems.append((n0, n1, n2, n3))
        self.props.append((a, b, t, E, nu, rho, damping))

    def add_plate(self, origin, nx, ny, Lx, Ly, t, E, nu, rho,
                  damping=0.01, fix_edge=None):
        """Regular nx×ny element plate in the local xy plane at ``origin``.

        ``fix_edge``: one of None/"x0"/"x1"/"y0"/"y1" — clamp that edge.
        Returns the (nx+1, ny+1) node-index grid.
        """
        ox, oy, oz = origin
        dx, dy = Lx / nx, Ly / ny
        ids = np.zeros((nx + 1, ny + 1), int)
        for i in range(nx + 1):
            for j in range(ny + 1):
                fixed = ((fix_edge == "x0" and i == 0)
                         or (fix_edge == "x1" and i == nx)
                         or (fix_edge == "y0" and j == 0)
                         or (fix_edge == "y1" and j == ny))
                ids[i, j] = self.add_node((ox + i * dx, oy + j * dy, oz),
                                          fixed=fixed)
        for i in range(nx):
            for j in range(ny):
                self.add_element(ids[i, j], ids[i + 1, j], ids[i + 1, j + 1],
                                 ids[i, j + 1], dx, dy, t, E, nu, rho,
                                 damping)
        return ids

    def finalize(self):
        dt = self.dtype
        q = jnp.asarray(np.concatenate(
            [np.concatenate([p, d])[None] for p, d, _ in self.nodes]), dt)
        fixed = jnp.asarray([f for _, _, f in self.nodes])
        pr = np.asarray(self.props, float)
        props = ShellProps(
            a=jnp.asarray(pr[:, 0], dt), b=jnp.asarray(pr[:, 1], dt),
            t=jnp.asarray(pr[:, 2], dt), E=jnp.asarray(pr[:, 3], dt),
            nu=jnp.asarray(pr[:, 4], dt), rho=jnp.asarray(pr[:, 5], dt),
            damping=jnp.asarray(pr[:, 6], dt))
        elems = np.asarray(self.elems, np.int32)
        # element frames from the reference geometry (flat elements):
        # local x along node0→node1, z normal, y = z × x
        pts = np.stack([p for p, _, _ in self.nodes])
        R0 = np.zeros((len(elems), 3, 3))
        for k, (n0, n1, n2, n3) in enumerate(elems):
            ex = pts[n1] - pts[n0]
            ex = ex / np.linalg.norm(ex)
            ez = np.cross(ex, pts[n3] - pts[n0])
            ez = ez / np.linalg.norm(ez)
            ey = np.cross(ez, ex)
            R0[k] = np.stack([ex, ey, ez], axis=1)
        mesh = ShellMesh(elems=jnp.asarray(elems), props=props, fixed=fixed,
                         q0=q, R0=jnp.asarray(R0, dt))
        return mesh, q
