"""ANCF gradient-deficient cable elements (batched, autodiff elastic forces).

TPU-native counterpart of the reference's ``ChElementCableANCF``
(/root/reference/src/chrono/fea/ChElementCableANCF.h, Gerstmayr–Shabana
formulation): 2 nodes × (position + slope) = 12 DOF per element, cubic
interpolation, axial (EA) + bending (EI) strain energy.

The reference hand-derives generalized internal forces and Jacobians; here the
element is defined ONLY by its strain-energy functional and forces come from
``jax.grad`` — exact, and the implicit integrators get exact tangent stiffness
via forward-over-reverse autodiff.  All elements evaluate batched under vmap.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field

# 3-point Gauss quadrature on [0, 1]
_GAUSS_X = np.array([0.1127016653792583, 0.5, 0.8872983346207417])
_GAUSS_W = np.array([5.0 / 18.0, 8.0 / 18.0, 5.0 / 18.0])
# 5-point for bending (higher curvature variation)
_G5_X = (np.polynomial.legendre.leggauss(5)[0] + 1) / 2
_G5_W = np.polynomial.legendre.leggauss(5)[1] / 2


@pytree_dataclass
class CableProps:
    """Per-element section properties."""

    L: Array       # (E,) undeformed length
    EA: Array      # (E,) axial rigidity
    EI: Array      # (E,) bending rigidity
    rhoA: Array    # (E,) mass/length
    damping: Array  # (E,) Rayleigh stiffness-proportional coefficient (β_K)


@pytree_dataclass
class CableMesh:
    """The FEA mesh: nodal coordinates e = (r, r_x) per node.

    q layout: (Nn, 6) = [position (3), slope dr/dξ·(1/L ref) (3)].
    """

    elems: Array          # (E, 2) node indices
    props: CableProps
    fixed: Array          # (Nn,) bool — fully fixed nodes (ground clamps)

    @property
    def n_elems(self) -> int:
        return self.elems.shape[0]


def _shape_funs(xi):
    """Cubic Hermite shape functions and derivatives at ξ∈[0,1].

    Returns (S (4,), S' (4,), S'' (4,)) with slope DOFs scaled by L at the
    caller (standard ANCF normalization).
    """
    s1 = 1 - 3 * xi**2 + 2 * xi**3
    s2 = xi - 2 * xi**2 + xi**3
    s3 = 3 * xi**2 - 2 * xi**3
    s4 = -(xi**2) + xi**3
    d1 = -6 * xi + 6 * xi**2
    d2 = 1 - 4 * xi + 3 * xi**2
    d3 = 6 * xi - 6 * xi**2
    d4 = -2 * xi + 3 * xi**2
    dd1 = -6 + 12 * xi
    dd2 = -4 + 6 * xi
    dd3 = 6 - 12 * xi
    dd4 = -2 + 6 * xi
    return (np.array([s1, s2, s3, s4]), np.array([d1, d2, d3, d4]),
            np.array([dd1, dd2, dd3, dd4]))


def element_energy(q_elem: Array, L, EA, EI) -> Array:
    """Strain energy of one element; q_elem (4,3) = [r0, r0', r1, r1']
    with slopes already scaled by L (i.e. dr/dξ = L·dr/dx at ξ-param)."""
    U = 0.0
    for xi, w in zip(_G5_X, _G5_W):
        _, dS, ddS = _shape_funs(xi)
        r_xi = jnp.einsum("i,ij->j", jnp.asarray(dS, q_elem.dtype), q_elem)
        r_xixi = jnp.einsum("i,ij->j", jnp.asarray(ddS, q_elem.dtype), q_elem)
        r_x = r_xi / L                     # d r / d arclength (reference)
        r_xx = r_xixi / (L * L)
        # axial Green strain of the centerline
        eps = 0.5 * (jnp.dot(r_x, r_x) - 1.0)
        # bending: |r' × r''|² / |r'|^... use the Gerstmayr small-strain form
        cross = jnp.cross(r_x, r_xx)
        denom = jnp.maximum(jnp.dot(r_x, r_x), 1e-9)
        kappa2 = jnp.dot(cross, cross) / (denom**3)
        U = U + w * L * (0.5 * EA * eps * eps + 0.5 * EI * kappa2)
    return U


# batched energy and exact generalized force (−∇U) via autodiff
_elem_energy_batched = jax.vmap(element_energy, in_axes=(0, 0, 0, 0))
_elem_force = jax.vmap(jax.grad(element_energy), in_axes=(0, 0, 0, 0))


def gather_elem_q(q: Array, elems: Array, L: Array) -> Array:
    """(Nn,6) nodal coords → (E,4,3) element coordinate matrices.

    Node slope DOFs store dr/dx (arclength); the ξ-parameterized element uses
    dr/dξ = L·dr/dx.
    """
    n0 = elems[:, 0]
    n1 = elems[:, 1]
    r0 = q[n0, 0:3]
    t0 = q[n0, 3:6] * L[:, None]
    r1 = q[n1, 0:3]
    t1 = q[n1, 3:6] * L[:, None]
    return jnp.stack([r0, t0, r1, t1], axis=1)


def total_energy(mesh: CableMesh, q: Array) -> Array:
    qe = gather_elem_q(q, mesh.elems, mesh.props.L)
    return jnp.sum(_elem_energy_batched(qe, mesh.props.L, mesh.props.EA,
                                        mesh.props.EI))


def internal_forces(mesh: CableMesh, q: Array) -> Array:
    """Generalized elastic forces −dU/dq, scattered to (Nn, 6)."""
    L = mesh.props.L
    qe = gather_elem_q(q, mesh.elems, L)
    fe = _elem_force(qe, L, mesh.props.EA, mesh.props.EI)  # (E,4,3) = dU/dqe
    out = jnp.zeros_like(q)
    n0, n1 = mesh.elems[:, 0], mesh.elems[:, 1]
    out = out.at[n0, 0:3].add(fe[:, 0])
    out = out.at[n0, 3:6].add(fe[:, 1] * L[:, None])  # chain rule: dξ-slope
    out = out.at[n1, 0:3].add(fe[:, 2])
    out = out.at[n1, 3:6].add(fe[:, 3] * L[:, None])
    return -out


def mass_matrix(mesh: CableMesh, n_nodes: int) -> Array:
    """Assembled constant ANCF mass matrix, dense (6Nn, 6Nn).

    M_e = ∫ ρA Sᵀ S dx (constant — the ANCF hallmark); assembled once at
    build, factorized inside the implicit steppers.
    """
    # 4x4 Hermite mass integral on ξ∈[0,1] (unit)
    m44 = np.zeros((4, 4))
    for xi, w in zip(_G5_X, _G5_W):
        S, _, _ = _shape_funs(xi)
        m44 += w * np.outer(S, S)
    m44 = jnp.asarray(m44)

    E = mesh.n_elems
    L = mesh.props.L
    # per-element 12x12 in [r0, t0(ξ), r1, t1(ξ)] blocks ⊗ I3, scaled rhoA·L
    nd = n_nodes * 6
    M = jnp.zeros((nd, nd))
    n0, n1 = mesh.elems[:, 0], mesh.elems[:, 1]
    # dof index helper: node n slot k (0..5)
    def dof(n, base):
        return n * 6 + base

    eye3 = jnp.eye(3)
    # slope-dof scaling: ξ-slope = L·x-slope → mass wrt x-slope gets L factors
    scale = [jnp.ones(E), L, jnp.ones(E), L]
    nodes = [n0, n0, n1, n1]
    offs = [0, 3, 0, 3]
    for a in range(4):
        for b in range(4):
            coeff = mesh.props.rhoA * L * m44[a, b] * scale[a] * scale[b]
            for ax in range(3):
                ia = nodes[a] * 6 + offs[a] + ax
                ib = nodes[b] * 6 + offs[b] + ax
                M = M.at[ia, ib].add(coeff)
    return M


class CableBuilder:
    """Host-side mesh construction (the reference's ChBuilderBeamANCF role)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.nodes = []      # (pos, slope)
        self.elems = []
        self.props = []
        self.fixed = []

    def add_node(self, pos, slope, fixed=False) -> int:
        self.nodes.append((np.asarray(pos, float), np.asarray(slope, float)))
        self.fixed.append(bool(fixed))
        return len(self.nodes) - 1

    def add_element(self, n0, n1, EA, EI, rhoA, damping=0.01):
        L = float(np.linalg.norm(self.nodes[n1][0] - self.nodes[n0][0]))
        self.elems.append((n0, n1))
        self.props.append((L, EA, EI, rhoA, damping))

    def add_straight_cable(self, p0, p1, n_elems, EA, EI, rhoA,
                           damping=0.01, fix_first=False):
        """Convenience: uniformly-divided straight cable; returns node ids."""
        p0 = np.asarray(p0, float)
        p1 = np.asarray(p1, float)
        d = (p1 - p0) / np.linalg.norm(p1 - p0)
        ids = []
        for k in range(n_elems + 1):
            p = p0 + (p1 - p0) * k / n_elems
            ids.append(self.add_node(p, d, fixed=(k == 0 and fix_first)))
        for k in range(n_elems):
            self.add_element(ids[k], ids[k + 1], EA, EI, rhoA, damping)
        return ids

    def finalize(self):
        dt = self.dtype
        q = jnp.asarray(
            np.concatenate([np.concatenate([p, s])[None]
                            for p, s in self.nodes]), dt)
        mesh = CableMesh(
            elems=jnp.asarray(self.elems, jnp.int32),
            props=CableProps(
                L=jnp.asarray([p[0] for p in self.props], dt),
                EA=jnp.asarray([p[1] for p in self.props], dt),
                EI=jnp.asarray([p[2] for p in self.props], dt),
                rhoA=jnp.asarray([p[3] for p in self.props], dt),
                damping=jnp.asarray([p[4] for p in self.props], dt),
            ),
            fixed=jnp.asarray(self.fixed),
        )
        qd = jnp.zeros_like(q)
        return mesh, q, qd
