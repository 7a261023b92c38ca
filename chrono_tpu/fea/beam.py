"""3-D corotational Euler–Bernoulli beam elements (2 nodes × 6 DOF).

Counterpart of the reference's rotation-DOF beam family
(/root/reference/src/chrono/fea/ChElementBeamEuler.h, built on
ChNodeFEAxyzrot): axial EA, torsion GJ, bending EIy/EIz with cubic Hermite
transverse interpolation.  The reference hand-derives the corotational
stiffness and its geometric terms; here the element is (like every
chrono_tpu element) defined ONLY by its strain energy in the corotated
frame and differentiated — the corotation enters the energy through the
element frame built from the current node positions/rotations, so autodiff
produces the full consistent tangent including geometric stiffness.

Node layout reuses the shared (Nn, 6) FEA vector: [position (3),
rotation vector θ (3)] — the exponential-map chart of each node's rotation
relative to ITS REFERENCE orientation.  Valid for arbitrarily large global
displacement with per-node rotations within the chart (|θ| < π), the same
regime the corotational reference element targets.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class BeamProps:
    L: Array       # (E,) reference length
    EA: Array
    GJ: Array
    EIy: Array
    EIz: Array
    rhoA: Array    # mass / length
    damping: Array
    R0: Array      # (E, 3, 3) reference element frame (x along the axis)
    GAy: Array = None   # shear rigidity κ·G·A (set → Timoshenko elements)
    GAz: Array = None


@pytree_dataclass
class BeamMesh:
    elems: Array   # (E, 2) node indices
    props: BeamProps
    fixed: Array   # (Nn,) bool
    q0: Array      # (Nn, 6) reference coords (θ = 0)

    @property
    def n_elems(self) -> int:
        return self.elems.shape[0]


def _rotvec_to_matrix(th):
    """Exp map via the differentiation-safe quaternion path (second-order
    autodiff of the energy needs smooth behavior at θ = 0; see
    chrono_tpu.core.quaternion.qexp_half)."""
    from chrono_tpu.core import quaternion as Q

    return Q.q_to_matrix(Q.qexp_half(th))


def element_energy(q_elem, q0_elem, L, EA, GJ, EIy, EIz, R0):
    """Corotational strain energy of one beam element.

    Local frame: x from node-0 toward node-1 (current chord); y/z from the
    average node rotation applied to the reference cross-section axes,
    re-orthogonalized against the chord.  Local deformation DOFs:
      axial stretch u, torsion twist φ, end bending rotations
      (θy1, θz1, θy2, θz2) — the classic 6-DOF natural beam modes.
    Energy = ½ EA u²/L + ½ GJ φ²/L + Hermite bending with end rotations
      U_bend(θ1, θ2) = (EI/L)·(2θ1² + 2θ2² + 2θ1θ2)  per bending plane
    (transverse end offsets vanish in the chord frame by construction).
    """
    p1, th1 = q_elem[0, 0:3], q_elem[0, 3:6]
    p2, th2 = q_elem[1, 0:3], q_elem[1, 3:6]
    Rn1 = _rotvec_to_matrix(th1) @ R0
    Rn2 = _rotvec_to_matrix(th2) @ R0

    d = p2 - p1
    ln = jnp.sqrt(jnp.sum(d * d) + 1e-24)
    ex = d / ln
    # mean section frame → corotated y axis, orthogonalized to the chord
    ey_m = 0.5 * (Rn1[:, 1] + Rn2[:, 1])
    ez = jnp.cross(ex, ey_m)
    ez = ez / jnp.sqrt(jnp.sum(ez * ez) + 1e-24)
    ey = jnp.cross(ez, ex)
    Rc = jnp.stack([ex, ey, ez], axis=1)      # corotated element frame

    # local node rotations relative to the corotated frame
    A1 = Rc.T @ Rn1
    A2 = Rc.T @ Rn2
    # small local rotations: extract via the skew part (exact to 2nd order)
    th_l1 = 0.5 * jnp.array([A1[2, 1] - A1[1, 2], A1[0, 2] - A1[2, 0],
                             A1[1, 0] - A1[0, 1]])
    th_l2 = 0.5 * jnp.array([A2[2, 1] - A2[1, 2], A2[0, 2] - A2[2, 0],
                             A2[1, 0] - A2[0, 1]])

    u = ln - L                                 # axial stretch
    phi = th_l2[0] - th_l1[0]                  # torsion twist
    # bending: end rotations about local y and z
    U_ax = 0.5 * EA / L * u * u
    U_to = 0.5 * GJ / L * phi * phi

    def bend(EI, t1, t2):
        return (EI / L) * (2.0 * t1 * t1 + 2.0 * t2 * t2 + 2.0 * t1 * t2)

    U_by = bend(EIy, th_l1[1], th_l2[1])
    U_bz = bend(EIz, th_l1[2], th_l2[2])
    return U_ax + U_to + U_by + U_bz


def element_energy_timoshenko(q_elem, q0_elem, L, EA, GJ, EIy, EIz, R0,
                              GAy, GAz):
    """Shear-flexible (Timoshenko) corotational element energy.

    Counterpart of the reference's tapered-Timoshenko family
    (/root/reference/src/chrono/fea/ChElementBeamTaperedTimoshenko.h) at
    uniform section: same corotated-frame kinematics as
    :func:`element_energy`, but with linear rotation interpolation and the
    transverse SHEAR strain kept:
      κ = (θ2 − θ1)/L           (constant curvature)
      γ = −(θ1 + θ2)/2          (one-point reduced integration — the
                                 classic shear-locking cure: the chord
                                 frame zeroes end deflections, so dw/dx
                                 integrates to 0 and γ_mid = −θ̄)
    Energy/plane = ½·EI·L·κ² + ½·GA_s·L·γ², GA_s = shear area × G
    (pass kappa·G·A — the shear correction factor lives in GA_s like the
    reference's Ks_y/Ks_z section parameters)."""
    p1, th1 = q_elem[0, 0:3], q_elem[0, 3:6]
    p2, th2 = q_elem[1, 0:3], q_elem[1, 3:6]
    Rn1 = _rotvec_to_matrix(th1) @ R0
    Rn2 = _rotvec_to_matrix(th2) @ R0

    d = p2 - p1
    ln = jnp.sqrt(jnp.sum(d * d) + 1e-24)
    ex = d / ln
    ey_m = 0.5 * (Rn1[:, 1] + Rn2[:, 1])
    ez = jnp.cross(ex, ey_m)
    ez = ez / jnp.sqrt(jnp.sum(ez * ez) + 1e-24)
    ey = jnp.cross(ez, ex)
    Rc = jnp.stack([ex, ey, ez], axis=1)

    A1 = Rc.T @ Rn1
    A2 = Rc.T @ Rn2
    th_l1 = 0.5 * jnp.array([A1[2, 1] - A1[1, 2], A1[0, 2] - A1[2, 0],
                             A1[1, 0] - A1[0, 1]])
    th_l2 = 0.5 * jnp.array([A2[2, 1] - A2[1, 2], A2[0, 2] - A2[2, 0],
                             A2[1, 0] - A2[0, 1]])

    u = ln - L
    phi = th_l2[0] - th_l1[0]
    U_ax = 0.5 * EA / L * u * u
    U_to = 0.5 * GJ / L * phi * phi

    def plane(EI, GAs, t1, t2, sgn):
        # sgn: rotation about +y bends in −z, about +z bends in +y
        kap = (t2 - t1) / L
        gam = sgn * 0.5 * (t1 + t2)
        return 0.5 * EI * L * kap * kap + 0.5 * GAs * L * gam * gam

    U_y = plane(EIy, GAz, th_l1[1], th_l2[1], -1.0)
    U_z = plane(EIz, GAy, th_l1[2], th_l2[2], +1.0)
    return U_ax + U_to + U_y + U_z


def total_energy(mesh: BeamMesh, q: Array) -> Array:
    qe = q[mesh.elems]
    q0e = mesh.q0[mesh.elems]
    p = mesh.props
    if getattr(p, "GAy", None) is not None:
        return jnp.sum(jax.vmap(element_energy_timoshenko)(
            qe, q0e, p.L, p.EA, p.GJ, p.EIy, p.EIz, p.R0, p.GAy, p.GAz))
    return jnp.sum(jax.vmap(element_energy)(
        qe, q0e, p.L, p.EA, p.GJ, p.EIy, p.EIz, p.R0))


def internal_forces(mesh: BeamMesh, q: Array) -> Array:
    return -jax.grad(lambda qq: total_energy(mesh, qq))(q)


def mass_matrix(mesh: BeamMesh, n_nodes: int) -> Array:
    """Lumped: translational m = ρA·L/2 per node; rotary inertia lump
    ρA·L³/24 (half-segment about its own center) keeps the rotation DOFs
    dynamically regular without changing the beam-theory modes measurably."""
    p = mesh.props
    m_el = p.rhoA * p.L / 2.0
    j_el = p.rhoA * p.L ** 3 / 24.0
    w = jnp.zeros((n_nodes,))
    jw = jnp.zeros((n_nodes,))
    for k in range(2):
        w = w.at[mesh.elems[:, k]].add(m_el)
        jw = jw.at[mesh.elems[:, k]].add(j_el)
    diag = jnp.stack([w, w, w, jw, jw, jw], axis=1).reshape(-1)
    return jnp.diag(diag)


def gravity_loads(mesh: BeamMesh, n_nodes: int, g) -> Array:
    p = mesh.props
    m_el = p.rhoA * p.L / 2.0
    w = jnp.zeros((n_nodes,))
    for k in range(2):
        w = w.at[mesh.elems[:, k]].add(m_el)
    f = jnp.zeros((n_nodes, 6))
    return f.at[:, 0:3].set(w[:, None] * jnp.asarray(g)[None, :])


class BeamBuilder:
    """Straight beam runs (ChBuilderBeamEuler role)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.nodes = []     # (pos, fixed)
        self.elems = []
        self.props = []     # (EA, GJ, EIy, EIz, rhoA, damping, GAy, GAz)
        self._shear = False

    def add_node(self, pos, fixed=False) -> int:
        self.nodes.append((np.asarray(pos, float), bool(fixed)))
        return len(self.nodes) - 1

    def add_element(self, n0, n1, EA, GJ, EIy, EIz, rhoA, damping=0.01,
                    GAy=None, GAz=None):
        self.elems.append((n0, n1))
        self.props.append((EA, GJ, EIy, EIz, rhoA, damping,
                           0.0 if GAy is None else GAy,
                           0.0 if GAz is None else GAz))
        self._shear = self._shear or GAy is not None

    def add_straight_beam(self, p0, p1, n_elems, EA, GJ, EIy, EIz, rhoA,
                          damping=0.01, fix_start=False, GAy=None, GAz=None):
        """``GAy/GAz`` (shear rigidities κGA): set → the run is meshed with
        shear-flexible Timoshenko elements (ChElementBeamTaperedTimoshenko
        role) instead of Euler–Bernoulli."""
        p0 = np.asarray(p0, float)
        p1 = np.asarray(p1, float)
        ids = []
        for k in range(n_elems + 1):
            ids.append(self.add_node(p0 + (p1 - p0) * k / n_elems,
                                     fixed=(fix_start and k == 0)))
        for k in range(n_elems):
            self.add_element(ids[k], ids[k + 1], EA, GJ, EIy, EIz, rhoA,
                             damping, GAy=GAy, GAz=GAz)
        return ids

    def finalize(self):
        dt = self.dtype
        pts = np.stack([p for p, _ in self.nodes])
        elems = np.asarray(self.elems, np.int32)
        pr = np.asarray(self.props, float)
        d = pts[elems[:, 1]] - pts[elems[:, 0]]
        L = np.linalg.norm(d, axis=1)
        ex = d / L[:, None]
        # reference section frame: y ⟂ axis, from the most-orthogonal world
        # axis (same convention as the reference's beam section default)
        up = np.where(np.abs(ex[:, 2:3]) < 0.9,
                      np.tile([0.0, 0.0, 1.0], (len(L), 1)),
                      np.tile([1.0, 0.0, 0.0], (len(L), 1)))
        ez = np.cross(ex, up)
        ez /= np.linalg.norm(ez, axis=1, keepdims=True)
        ey = np.cross(ez, ex)
        R0 = np.stack([ex, ey, ez], axis=2)
        q = np.zeros((len(pts), 6), np.float32)
        q[:, 0:3] = pts
        props = BeamProps(
            L=jnp.asarray(L, dt), EA=jnp.asarray(pr[:, 0], dt),
            GJ=jnp.asarray(pr[:, 1], dt), EIy=jnp.asarray(pr[:, 2], dt),
            EIz=jnp.asarray(pr[:, 3], dt), rhoA=jnp.asarray(pr[:, 4], dt),
            damping=jnp.asarray(pr[:, 5], dt), R0=jnp.asarray(R0, dt),
            GAy=jnp.asarray(pr[:, 6], dt) if self._shear else None,
            GAz=jnp.asarray(pr[:, 7], dt) if self._shear else None)
        mesh = BeamMesh(elems=jnp.asarray(elems), props=props,
                        fixed=jnp.asarray([f for _, f in self.nodes]),
                        q0=jnp.asarray(q, dt))
        return mesh, jnp.asarray(q, dt)
