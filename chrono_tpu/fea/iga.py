"""Isogeometric (IGA) beam: geometrically exact Cosserat rod on B-splines.

Counterpart of the reference's ChElementBeamIGA
(/root/reference/src/chrono/fea/ChElementBeamIGA.h) — a B-spline-basis
Timoshenko/geometrically-exact beam whose "nodes" are spline CONTROL
POINTS.  Deliberately different construction: the reference assembles
per-element tangent matrices from hand-coded strain-displacement operators
over each knot span; here the WHOLE rod's strain energy is one batched
quadrature sum over Gauss points (basis matrices precomputed at build
time, static shapes) and internal forces/tangents come from autodiff —
the same pattern as every chrono_tpu element.

Kinematics (Simo–Reissner):
    r(s)  = Σ N_i(s) p_i                     centerline from control points
    θ(s)  = Σ N_i(s) θ_i                     rotation-vector field
    R(s)  = exp(θ(s)) R0
    Γ     = Rᵀ r′/J0 − e₁                    axial (Γ₁) + shear (Γ₂, Γ₃)
    Ω     = Rᵀ T(θ) θ′ / J0                  torsion (Ω₁) + bending (Ω₂,Ω₃)
    U     = ½∫ EA Γ₁² + GAy Γ₂² + GAz Γ₃² + GJ Ω₁² + EIy Ω₂² + EIz Ω₃²
with T(θ) the exp-map tangent (dR/ds Rᵀ = skew(T(θ)θ′)).

Control points live in the shared (Nn, 6) FEA vector ([pos, θ]), so the
rod composes with the static/HHT steppers and node-frame couplings
unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


def bspline_basis(knots: np.ndarray, p: int, s: float):
    """All basis values and first derivatives at parameter ``s`` (numpy,
    build-time only).  Cox–de Boor over the full control-point set."""
    n = len(knots) - p - 1
    N = np.zeros((p + 1, n))
    # degree 0
    for i in range(n):
        if knots[i] <= s < knots[i + 1] or (
                s >= knots[-1] - 1e-12 and knots[i] < knots[i + 1]
                and knots[i + 1] >= knots[-1] - 1e-12):
            N[0, i] = 1.0
    for k in range(1, p + 1):
        for i in range(n):
            a = 0.0
            if knots[i + k] > knots[i]:
                a = (s - knots[i]) / (knots[i + k] - knots[i]) * N[k - 1, i]
            b = 0.0
            if i + 1 < n and knots[i + k + 1] > knots[i + 1]:
                b = ((knots[i + k + 1] - s)
                     / (knots[i + k + 1] - knots[i + 1]) * N[k - 1, i + 1])
            N[k, i] = a + b
    # derivative of degree-p basis from degree-(p-1)
    dN = np.zeros(n)
    for i in range(n):
        a = 0.0
        if knots[i + p] > knots[i]:
            a = p / (knots[i + p] - knots[i]) * N[p - 1, i]
        b = 0.0
        if i + 1 < n and knots[i + p + 1] > knots[i + 1]:
            b = p / (knots[i + p + 1] - knots[i + 1]) * N[p - 1, i + 1]
        dN[i] = a - b
    return N[p], dN


@pytree_dataclass
class IGABeamMesh:
    B: Array        # (G, Nn) basis values at Gauss points
    dB: Array       # (G, Nn) basis parametric derivatives
    wJ: Array       # (G,) quadrature weight × reference jacobian
    J0: Array       # (G,) reference jacobian |dr0/ds|
    R0: Array       # (3, 3) reference section frame (x along the rod)
    EA: Array
    GAy: Array
    GAz: Array
    GJ: Array
    EIy: Array
    EIz: Array
    rhoA: Array
    fixed: Array    # (Nn,) bool
    q0: Array       # (Nn, 6) reference control coords
    damping: Array = 0.01   # Rayleigh stiffness-proportional coefficient


def _tangent_map(th):
    """T(θ): ω = T(θ)·θ̇ for R = exp(θ).  Smooth at θ = 0.

    NaN-safe under autodiff: the guard must be applied to the INPUT of the
    singular expressions (``jnp.where`` alone still differentiates the
    untaken branch), and the series branch must cover the whole fp32
    cancellation region — (t − sin t)/t³ second derivatives overflow fp32
    already at t ~ 1e-6, so the crossover sits at t = 0.1 where the
    4th-order series is accurate to ~1e-9 relative and differentiates
    exactly (polynomial)."""
    t2 = jnp.sum(th * th)
    small = t2 < 1e-2                        # t < 0.1
    t2s = jnp.where(small, 1.0, t2)          # safe denominator
    t = jnp.sqrt(t2s)
    s_ser = 0.5 - t2 / 24.0 + t2 * t2 / 720.0
    c_ser = 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0
    s = jnp.where(small, s_ser, (1.0 - jnp.cos(t)) / t2s)
    c = jnp.where(small, c_ser, (t - jnp.sin(t)) / (t2s * t))
    K = jnp.array([[0.0, -th[2], th[1]],
                   [th[2], 0.0, -th[0]],
                   [-th[1], th[0], 0.0]])
    return jnp.eye(3) + s * K + c * (K @ K)


def _rotvec_to_matrix(th):
    from chrono_tpu.core import quaternion as Q
    return Q.q_to_matrix(Q.qexp_half(th))


def build_iga_beam(p0, p1, n_ctrl: int, order: int, EA, GAy, GAz, GJ,
                   EIy, EIz, rhoA, gauss_per_span: int = None,
                   fix_start: bool = False, damping: float = 0.01,
                   dtype=jnp.float32):
    """Straight IGA rod from ``p0`` to ``p1`` with ``n_ctrl`` control
    points of B-spline ``order`` (ChBuilderBeamIGA role).  Returns
    (IGABeamMesh, q0)."""
    p0 = np.asarray(p0, float)
    p1 = np.asarray(p1, float)
    p = int(order)
    n = int(n_ctrl)
    if n <= p:
        raise ValueError("n_ctrl must exceed the order")
    # open uniform knot vector on [0, 1]
    n_spans = n - p
    knots = np.concatenate([np.zeros(p), np.linspace(0, 1, n_spans + 1),
                            np.ones(p)])
    # Greville abscissae → control points on the line (exact linear fit)
    grev = np.array([np.mean(knots[i + 1:i + p + 1]) for i in range(n)])
    pts = p0[None, :] + grev[:, None] * (p1 - p0)[None, :]

    ngs = gauss_per_span or (p + 1)
    gx, gw = np.polynomial.legendre.leggauss(ngs)
    Bs, dBs, wJs, J0s = [], [], [], []
    for k in range(n_spans):
        a, b = knots[p + k], knots[p + k + 1]
        for x, w in zip(gx, gw):
            s = 0.5 * (a + b) + 0.5 * (b - a) * x
            N, dN = bspline_basis(knots, p, s)
            dr0 = dN @ pts
            J0 = np.linalg.norm(dr0)
            Bs.append(N)
            dBs.append(dN)
            wJs.append(w * 0.5 * (b - a) * J0)
            J0s.append(J0)

    # reference frame: x along the rod
    ex = (p1 - p0) / np.linalg.norm(p1 - p0)
    up = np.array([0.0, 0.0, 1.0]) if abs(ex[2]) < 0.9 else \
        np.array([1.0, 0.0, 0.0])
    ez = np.cross(ex, up)
    ez /= np.linalg.norm(ez)
    ey = np.cross(ez, ex)
    R0 = np.stack([ex, ey, ez], axis=1)

    q0 = np.zeros((n, 6), np.float32)
    q0[:, 0:3] = pts
    # per-DOF fixing: a clamp needs position+tangent at s=0 = CP0 (all 6)
    # + CP1's POSITION only — fixing whole extra control points shortens
    # the rod by the Greville offset (measured: 29% stiff cantilever)
    fixed = np.zeros((n, 6), bool)
    if fix_start:
        fixed[0, :] = True
        fixed[1, 0:3] = True

    dt = dtype
    mesh = IGABeamMesh(
        B=jnp.asarray(np.stack(Bs), dt), dB=jnp.asarray(np.stack(dBs), dt),
        wJ=jnp.asarray(wJs, dt), J0=jnp.asarray(J0s, dt),
        R0=jnp.asarray(R0, dt),
        EA=jnp.asarray(EA, dt), GAy=jnp.asarray(GAy, dt),
        GAz=jnp.asarray(GAz, dt), GJ=jnp.asarray(GJ, dt),
        EIy=jnp.asarray(EIy, dt), EIz=jnp.asarray(EIz, dt),
        rhoA=jnp.asarray(rhoA, dt), fixed=jnp.asarray(fixed),
        q0=jnp.asarray(q0, dt), damping=jnp.asarray(damping, dt))
    return mesh, jnp.asarray(q0, dt)


def total_energy(mesh: IGABeamMesh, q: Array) -> Array:
    pos = q[:, 0:3]
    th = q[:, 3:6]
    r_p = mesh.dB @ pos                 # (G, 3) centerline derivative
    th_g = mesh.B @ th                  # (G, 3) rotation field
    th_p = mesh.dB @ th                 # (G, 3) its derivative

    def gp_energy(rp, tg, tp, J0, wJ):
        R = _rotvec_to_matrix(tg) @ mesh.R0
        Gam = R.T @ (rp / J0) - jnp.array([1.0, 0.0, 0.0])
        omega = _tangent_map(tg) @ tp
        Om = R.T @ omega / J0
        u = (mesh.EA * Gam[0] ** 2 + mesh.GAy * Gam[1] ** 2
             + mesh.GAz * Gam[2] ** 2 + mesh.GJ * Om[0] ** 2
             + mesh.EIy * Om[1] ** 2 + mesh.EIz * Om[2] ** 2)
        return 0.5 * u * wJ

    return jnp.sum(jax.vmap(gp_energy)(r_p, th_g, th_p, mesh.J0, mesh.wJ))


def internal_forces(mesh: IGABeamMesh, q: Array) -> Array:
    return -jax.grad(lambda qq: total_energy(mesh, qq))(q)


def lumped_mass(mesh: IGABeamMesh) -> Array:
    """(Nn,) translational lumps ∫ρA N_i ds (row-sum = exact total mass)."""
    return mesh.rhoA * (mesh.wJ / mesh.J0) @ mesh.B


def mass_matrix(mesh: IGABeamMesh, n_nodes: int) -> Array:
    w = lumped_mass(mesh)
    tot = jnp.sum(w)
    # rotary lump: slender-rod heuristic consistent with beam.mass_matrix
    L = jnp.sum(mesh.wJ / mesh.J0) * jnp.mean(mesh.J0)
    jw = w * (L / n_nodes) ** 2 / 12.0 + 1e-12 * tot
    diag = jnp.stack([w, w, w, jw, jw, jw], axis=1).reshape(-1)
    return jnp.diag(diag)


def gravity_loads(mesh: IGABeamMesh, n_nodes: int, g) -> Array:
    w = lumped_mass(mesh)
    f = jnp.zeros((n_nodes, 6))
    return f.at[:, 0:3].set(w[:, None] * jnp.asarray(g)[None, :])
