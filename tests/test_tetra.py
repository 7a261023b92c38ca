"""Tetrahedral solid elements (role of the reference's utest_FEA tetra
coverage, ChElementTetraCorot_4): stretch modulus, cantilever statics on an
unstructured 5-tet-per-cube lattice, transient stability."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.fea.tetra import (
    TetraBuilder, total_energy, internal_forces, gravity_loads,
)
from chrono_tpu.fea.dynamics import static_solve, make_hht_step


def test_zero_energy_at_reference():
    b = TetraBuilder()
    b.add_block((0, 0, 0), 3, 1, 1, 0.3, 0.1, 0.1, 1e8, 0.3, 1000.0)
    mesh, q = b.finalize()
    assert mesh.n_elems == 15
    assert float(total_energy(mesh, q)) < 1e-8
    assert float(jnp.abs(internal_forces(mesh, q)).max()) < 1e-3
    # volumes of the 5-tet split tile the cube exactly
    np.testing.assert_allclose(float(mesh.props.vol.sum()), 0.3 * 0.1 * 0.1,
                               rtol=1e-5)


def test_uniaxial_stretch_modulus():
    E_, nu = 1e8, 0.3
    b = TetraBuilder()
    b.add_block((0, 0, 0), 2, 1, 1, 0.2, 0.1, 0.1, E_, nu, 1000.0)
    mesh, q = b.finalize()
    eps = 1e-3
    q2 = np.asarray(q).copy()
    q2[:, 0] *= (1 + eps)
    U = float(total_energy(mesh, jnp.asarray(q2)))
    lam = E_ * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E_ / (2 * (1 + nu))
    vol = 0.2 * 0.1 * 0.1
    U_ref = 0.5 * (lam + 2 * mu) * eps**2 * vol
    # constant-strain tets represent homogeneous strain exactly
    np.testing.assert_allclose(U, U_ref, rtol=1e-2)


def test_cantilever_tet_beam():
    """Clamped tet-lattice beam under gravity vs w = q L⁴/(8 E I); linear
    tets lock harder than bricks → accept a wider stiff-side band."""
    E_, nu, rho = 5e7, 0.0, 1000.0
    Lx, Ly, Lz = 0.6, 0.1, 0.1
    b = TetraBuilder()
    ids = b.add_block((0, 0, 0), 12, 2, 2, Lx, Ly, Lz, E_, nu, rho,
                      fix_face="x0")
    mesh, q = b.finalize()
    f = gravity_loads(mesh, q.shape[0], (0, 0, -9.81))
    q_eq = static_solve(mesh, q, f, n_load_steps=3, newton_iters=20,
                        tol=1e-3)
    tip_ids = np.asarray(ids[-1, :, :]).ravel()
    w_tip = -(np.asarray(q_eq)[tip_ids, 2] - np.asarray(q)[tip_ids, 2]).mean()
    I = Ly * Lz**3 / 12
    q_line = rho * Ly * Lz * 9.81
    w_ref = q_line * Lx**4 / (8 * E_ * I)
    assert 0.4 * w_ref < w_tip < 1.1 * w_ref, (w_tip, w_ref)


def test_tet_dynamics_stable():
    b = TetraBuilder()
    b.add_block((0, 0, 0), 4, 1, 1, 0.2, 0.05, 0.05, 1e7, 0.3, 1000.0,
                fix_face="x0")
    mesh, q = b.finalize()
    f = gravity_loads(mesh, q.shape[0], (0, 0, -9.81))
    step = make_hht_step(mesh, q.shape[0], h=1e-3, newton_iters=6, tol=1e-3)
    qd = jnp.zeros_like(q)
    qdd = jnp.zeros_like(q)
    for _ in range(80):
        out = step(q, qd, qdd, f)
        q, qd, qdd = out.q, out.qd, out.qdd
    assert np.isfinite(np.asarray(q)).all()
    assert float(q[:, 2].min()) > -0.2
