"""BST rotation-free thin-shell triangles vs Kirchhoff plate theory
(ChElementShellBST role, /root/reference/src/chrono/fea/ChElementShellBST.h)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.fea.bst import (
    build_bst_mesh, grid_tri_mesh, total_energy, internal_forces,
    _curvatures, mass_matrix)
from chrono_tpu.fea.dynamics import static_solve

E_ = 2.0e8
NU = 0.3
RHO = 1200.0


def _strip(nx=12, ny=2, L=1.0, b=0.2, t=0.01):
    pts, tris, ids = grid_tri_mesh(nx, ny, L, b)
    fixed = np.zeros(len(pts), bool)
    fixed[ids[0]] = True     # ONE clamped column: the clamped-edge mirror
    #                          ghosts enforce zero rotation there
    mesh, q = build_bst_mesh(pts, tris, t, E_, NU, RHO, fixed=fixed)
    return mesh, q, ids


def test_zero_energy_and_curvature_at_reference():
    mesh, q, _ = _strip()
    assert float(total_energy(mesh, q)) < 1e-6
    assert float(jnp.abs(internal_forces(mesh, q)).max()) < 1.0


def test_curvature_fit_exact_on_quadratic():
    """Bending the plate into z = ½κx² must be read back as κxx = κ."""
    mesh, q, ids = _strip(8, 4, 1.0, 0.5)
    kappa = 0.4
    pos = np.asarray(q[:, 0:3]).copy()
    pos[:, 2] = 0.5 * kappa * pos[:, 0] ** 2
    q2 = jnp.asarray(np.concatenate([pos, np.zeros_like(pos)], axis=1),
                     jnp.float32)
    kap = np.asarray(_curvatures(mesh, q2))
    # curvatures are reported in each ELEMENT's local frame (upper-split
    # triangles have their x axis on the quad diagonal), so compare the
    # rotation-invariant trace: tr kappa = 0.4 for cylindrical bending,
    # and the Gaussian determinant ~ 0.  Interior (full-patch) triangles
    # only — boundary patches under-determine one direction (soft free
    # edge, by design)
    full = np.asarray(mesh.pmask).min(axis=1) > 0.5
    assert full.sum() > 20
    tr = kap[full, 0] + kap[full, 1]
    det = kap[full, 0] * kap[full, 1] - kap[full, 2] ** 2
    assert np.median(tr) == pytest.approx(kappa, rel=5e-2)
    assert np.abs(np.median(det)) < 0.05 * kappa ** 2


def test_cantilever_strip_deflection():
    """Tip-loaded thin cantilever strip: w = PL^3/(3 D' b) (Kirchhoff —
    the BST element has no shear term, correct in the thin limit)."""
    L, b, t, P = 1.0, 0.2, 0.01, 1.0
    nx, ny = 16, 2
    mesh, q, ids = _strip(nx, ny, L, b, t)
    f = jnp.zeros_like(q)
    tip = ids[-1]
    for nid in tip:
        f = f.at[int(nid), 2].add(P / len(tip))
    q_eq = static_solve(mesh, q, f, n_load_steps=3, newton_iters=30,
                        tol=1e-5)
    w_tip = float(jnp.mean(q_eq[jnp.asarray(tip), 2]))
    Dp = E_ * t**3 / (12 * (1 - NU**2))
    w_ref = P * L**3 / (3 * Dp * b)
    np.testing.assert_allclose(w_tip, w_ref, rtol=8e-2)


def test_membrane_stretch():
    L, b, t, P = 1.0, 0.2, 0.01, 500.0
    mesh, q, ids = _strip(8, 2, L, b, t)
    f = jnp.zeros_like(q)
    tip = ids[-1]
    for nid in tip:
        f = f.at[int(nid), 0].add(P / len(tip))
    q_eq = static_solve(mesh, q, f, n_load_steps=1, newton_iters=20,
                        tol=1e-5)
    u_tip = float(jnp.mean(q_eq[jnp.asarray(tip), 0])) - L
    # narrow strip, free lateral edges: uniaxial modulus E
    u_ref = P * L / (E_ * t * b)
    np.testing.assert_allclose(u_tip, u_ref, rtol=8e-2)


def test_mass_total():
    L, b, t = 1.0, 0.2, 0.01
    mesh, q, _ = _strip(6, 2, L, b, t)
    M = mass_matrix(mesh, q.shape[0])
    m_tot = float(jnp.sum(jnp.diag(M)[0::6]))
    assert m_tot == pytest.approx(RHO * L * b * t, rel=1e-5)
