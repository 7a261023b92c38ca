"""IGA (B-spline) geometrically exact beam vs beam theory
(ChElementBeamIGA role, /root/reference/src/chrono/fea/ChElementBeamIGA.h)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.fea.iga import (
    build_iga_beam, total_energy, internal_forces, bspline_basis,
    lumped_mass)
from chrono_tpu.fea.dynamics import static_solve

E_ = 2.0e9
G_ = 0.8e9
W = 0.02
A = W * W
I = W**4 / 12.0
J = 0.141 * W**4
KAPPA = 5.0 / 6.0


def _rod(n_ctrl=10, order=3, L=1.0):
    return build_iga_beam(
        (0, 0, 0), (L, 0, 0), n_ctrl, order,
        EA=E_ * A, GAy=KAPPA * G_ * A, GAz=KAPPA * G_ * A,
        GJ=G_ * J, EIy=E_ * I, EIz=E_ * I, rhoA=2700.0 * A,
        fix_start=True)


def test_basis_partition_of_unity():
    n, p = 8, 3
    knots = np.concatenate([np.zeros(p), np.linspace(0, 1, n - p + 1),
                            np.ones(p)])
    for s in (0.0, 0.13, 0.5, 0.77, 1.0):
        N, dN = bspline_basis(knots, p, s)
        assert np.sum(N) == pytest.approx(1.0, abs=1e-12)
        assert np.sum(dN) == pytest.approx(0.0, abs=1e-9)


def test_zero_energy_at_reference():
    mesh, q = _rod()
    assert float(total_energy(mesh, q)) < 1e-6   # fp32 noise floor
    assert float(jnp.abs(internal_forces(mesh, q)).max()) < 1.0


def test_total_mass():
    mesh, q = _rod(L=1.0)
    assert float(jnp.sum(lumped_mass(mesh))) == pytest.approx(
        2700.0 * A, rel=1e-5)


def test_cantilever_tip_deflection():
    """w = PL^3/3EI + PL/(kGA) (the Timoshenko solution — the IGA rod is
    shear-flexible)."""
    L, P = 1.0, 0.8
    mesh, q = _rod(12, 3, L)
    f = jnp.zeros_like(q).at[-1, 2].set(P)
    q_eq = static_solve(mesh, q, f, n_load_steps=2, newton_iters=30,
                        tol=1e-6)
    w_tip = float(q_eq[-1, 2] - q[-1, 2])
    w_ref = P * L**3 / (3 * E_ * I) + P * L / (KAPPA * G_ * A)
    np.testing.assert_allclose(w_tip, w_ref, rtol=3e-2)


def test_torsion():
    L, T = 1.0, 5.0
    mesh, q = _rod(10, 3, L)
    f = jnp.zeros_like(q).at[-1, 3].set(T)
    q_eq = static_solve(mesh, q, f, n_load_steps=1, newton_iters=30,
                        tol=1e-6)
    phi = float(q_eq[-1, 3])
    np.testing.assert_allclose(phi, T * L / (G_ * J), rtol=3e-2)
