"""Corotational Euler–Bernoulli beam elements vs beam theory
(role of the reference's utest_FEA_beams / ChElementBeamEuler checks)."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.fea.beam import (
    BeamBuilder, total_energy, internal_forces, gravity_loads,
)
from chrono_tpu.fea.dynamics import static_solve, make_hht_step

E_ = 2.0e9
G_ = 0.8e9
W = 0.02                      # square section
A = W * W
I = W**4 / 12.0
J = 0.141 * W**4              # square-section torsion constant
RHO = 2700.0


def _cantilever(n_elems=10, L=1.0):
    b = BeamBuilder()
    ids = b.add_straight_beam((0, 0, 0), (L, 0, 0), n_elems,
                              EA=E_ * A, GJ=G_ * J, EIy=E_ * I, EIz=E_ * I,
                              rhoA=RHO * A, fix_start=True)
    mesh, q = b.finalize()
    return mesh, q, ids


def test_zero_energy_at_reference():
    mesh, q, _ = _cantilever()
    assert float(total_energy(mesh, q)) < 1e-6
    assert float(jnp.abs(internal_forces(mesh, q)).max()) < 1.0  # EA/L * fp32 eps


def test_cantilever_tip_force_deflection():
    """w = P L³ / 3EI, θ_tip = P L² / 2EI (small deflection: w/L = 1%)."""
    L, P = 1.0, 0.8
    mesh, q, ids = _cantilever(10, L)
    f = jnp.zeros_like(q).at[ids[-1], 2].set(P)
    q_eq = static_solve(mesh, q, f, n_load_steps=2, newton_iters=25,
                        tol=1e-5)
    w_tip = float(q_eq[ids[-1], 2] - q[ids[-1], 2])
    w_ref = P * L**3 / (3 * E_ * I)
    np.testing.assert_allclose(w_tip, w_ref, rtol=2e-2)
    th_tip = float(q_eq[ids[-1], 4])                 # rotation about y
    np.testing.assert_allclose(abs(th_tip), P * L**2 / (2 * E_ * I),
                               rtol=2e-2)


def test_torsion_rod():
    """Tip twisting moment: φ = T L / GJ."""
    L, T = 1.0, 5.0
    mesh, q, ids = _cantilever(6, L)
    f = jnp.zeros_like(q).at[ids[-1], 3].set(T)      # moment about x
    q_eq = static_solve(mesh, q, f, n_load_steps=1, newton_iters=25,
                        tol=1e-6)
    phi = float(q_eq[ids[-1], 3])
    np.testing.assert_allclose(phi, T * L / (G_ * J), rtol=2e-2)


def test_axial_stretch():
    L, P = 1.0, 1000.0
    mesh, q, ids = _cantilever(4, L)
    f = jnp.zeros_like(q).at[ids[-1], 0].set(P)
    q_eq = static_solve(mesh, q, f, n_load_steps=1, newton_iters=25,
                        tol=1e-5)
    u = float(q_eq[ids[-1], 0] - q[ids[-1], 0])
    np.testing.assert_allclose(u, P * L / (E_ * A), rtol=1e-2)


def test_large_deflection_nonlinearity():
    """A heavy tip load bends the beam ~30% of its length: the corotational
    response must be visibly SOFTer in rotation coordinates than linear
    theory but preserve the beam length (inextensible to EA tolerance)."""
    L = 1.0
    mesh, q, ids = _cantilever(12, L)
    w_lin_target = 0.3 * L
    P = w_lin_target * 3 * E_ * I / L**3
    f = jnp.zeros_like(q).at[ids[-1], 2].set(P)
    q_eq = static_solve(mesh, q, f, n_load_steps=6, newton_iters=30,
                        tol=1e-5)
    w = float(q_eq[ids[-1], 2])
    x = float(q_eq[ids[-1], 0])
    # large-deflection: tip deflects less than linear prediction AND the tip
    # pulls inward (foreshortening) — both corotational signatures
    assert 0.6 * w_lin_target < w < 0.98 * w_lin_target, w
    assert x < 0.995 * L, x
    # arc length approximately preserved
    pts = np.asarray(q_eq[np.asarray(ids), 0:3])
    arc = np.linalg.norm(np.diff(pts, axis=0), axis=1).sum()
    np.testing.assert_allclose(arc, L, rtol=5e-3)


def test_cantilever_first_eigenfrequency_dynamic():
    """Ring the cantilever with a tip impulse and check the period of the
    fundamental mode: f₁ = (1.875² / 2π) √(EI / ρA L⁴).

    Uses a CHUNKY section (W = L/8): a very thin beam's rotary-inertia modes
    sit ~6 decades above f₁ and the fp32 Newton matrix can't resolve that
    spread (the reference integrates such meshes in double precision)."""
    L = 0.5
    Wb = L / 8.0
    Ab, Ib = Wb * Wb, Wb**4 / 12.0
    b = BeamBuilder()
    ids = b.add_straight_beam((0, 0, 0), (L, 0, 0), 5,
                              EA=E_ * Ab, GJ=G_ * 0.141 * Wb**4,
                              EIy=E_ * Ib, EIz=E_ * Ib, rhoA=RHO * Ab,
                              damping=1e-4, fix_start=True)
    mesh, q = b.finalize()
    f1 = (1.875**2 / (2 * np.pi)) * np.sqrt(E_ * Ib / (RHO * Ab * L**4))
    T1 = 1.0 / f1
    h = T1 / 80.0
    step = make_hht_step(mesh, q.shape[0], h=h, newton_iters=5, tol=1e-4)
    qd = jnp.zeros_like(q).at[ids[-1], 2].set(0.1)
    qdd = jnp.zeros_like(q)
    zs = []
    st = q
    for _ in range(160):                 # two periods
        out = step(st, qd, qdd, jnp.zeros_like(q))
        st, qd, qdd = out.q, out.qd, out.qdd
        zs.append(float(st[ids[-1], 2]))
    zs = np.asarray(zs)
    # count zero crossings → period estimate
    s = np.signbit(zs)
    crossings = np.nonzero(s[1:] != s[:-1])[0]
    assert len(crossings) >= 3, "tip never oscillated"
    period = 2.0 * np.mean(np.diff(crossings)) * h
    np.testing.assert_allclose(period, T1, rtol=0.08)


def test_timoshenko_shear_deflection():
    """Shear-flexible cantilever: w = PL^3/3EI + PL/(kGA) — for a SHORT
    deep beam the shear term is a large fraction of the total, which the
    Euler-Bernoulli element cannot produce (ChElementBeamTaperedTimoshenko
    role, /root/reference/src/chrono/fea/ChElementBeamTaperedTimoshenko.h)."""
    L, P = 0.2, 0.8                     # L/W = 10: shear term ~3% of total
    kappa = 5.0 / 6.0
    GA = kappa * G_ * A
    b = BeamBuilder()
    ids = b.add_straight_beam((0, 0, 0), (L, 0, 0), 10,
                              EA=E_ * A, GJ=G_ * J, EIy=E_ * I, EIz=E_ * I,
                              rhoA=RHO * A, fix_start=True, GAy=GA, GAz=GA)
    mesh, q = b.finalize()
    f = jnp.zeros_like(q).at[ids[-1], 2].set(P)
    q_eq = static_solve(mesh, q, f, n_load_steps=2, newton_iters=25,
                        tol=1e-6)
    w_tip = float(q_eq[ids[-1], 2] - q[ids[-1], 2])
    w_bend = P * L**3 / (3 * E_ * I)
    w_shear = P * L / GA
    np.testing.assert_allclose(w_tip, w_bend + w_shear, rtol=2e-2)
    # and the Euler-Bernoulli element misses the shear part
    b2 = BeamBuilder()
    ids2 = b2.add_straight_beam((0, 0, 0), (L, 0, 0), 10,
                                EA=E_ * A, GJ=G_ * J, EIy=E_ * I,
                                EIz=E_ * I, rhoA=RHO * A, fix_start=True)
    mesh2, q2 = b2.finalize()
    q2_eq = static_solve(mesh2, q2, f, n_load_steps=2, newton_iters=25,
                         tol=1e-6)
    w2 = float(q2_eq[ids2[-1], 2] - q2[ids2[-1], 2])
    np.testing.assert_allclose(w2, w_bend, rtol=2e-2)
    assert w_tip > w2 + 0.5 * w_shear
