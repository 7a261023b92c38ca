"""FEA tests: ANCF cable statics/dynamics vs beam theory (mirrors the
reference's unit_tests/fea element fixtures)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.fea import (
    CableBuilder, static_solve, make_hht_step, gravity_loads,
    total_energy, mass_matrix,
)


def cantilever(n_elems=8, L=1.0, EA=1e7, EI=50.0, rhoA=1.0):
    b = CableBuilder()
    b.add_straight_cable((0, 0, 0), (L, 0, 0), n_elems, EA=EA, EI=EI,
                         rhoA=rhoA, damping=0.02, fix_first=True)
    return b.finalize()


class TestCableStatics:
    def test_tip_load_deflection(self):
        # small-deflection cantilever: delta = P L^3 / (3 EI)
        L, EI = 1.0, 50.0
        mesh, q, qd = cantilever(L=L, EI=EI)
        P = 10.0   # -> delta = 10/(150) = 0.0667 (6.7% of L, near-linear)
        f = jnp.zeros_like(q)
        f = f.at[-1, 2].set(-P)
        q_eq = static_solve(mesh, q, f, n_load_steps=4)
        tip = float(q_eq[-1, 2])
        delta_expect = P * L**3 / (3 * EI)
        np.testing.assert_allclose(-tip, delta_expect, rtol=0.05)

    def test_axial_stretch(self):
        L, EA = 1.0, 1e5
        mesh, q, qd = cantilever(L=L, EA=EA, EI=50.0)
        P = 100.0  # strain = P/EA = 1e-3
        f = jnp.zeros_like(q).at[-1, 0].set(P)
        q_eq = static_solve(mesh, q, f, n_load_steps=2)
        stretch = float(q_eq[-1, 0]) - L
        np.testing.assert_allclose(stretch, P / EA * L, rtol=0.05)

    def test_energy_zero_at_reference(self):
        mesh, q, qd = cantilever()
        assert abs(float(total_energy(mesh, q))) < 1e-5  # fp32 roundoff at EA=1e7


class TestCableDynamics:
    def test_gravity_sag_settles(self):
        # clamped cable sags under gravity and settles to the static shape
        b_ = None
        mesh, q, qd = cantilever(n_elems=6, EI=20.0, rhoA=2.0)
        # raise Rayleigh damping so the transient settles quickly
        mesh = mesh.replace(props=mesh.props.replace(
            damping=mesh.props.damping * 0 + 0.1))
        f_g = gravity_loads(mesh, q.shape[0], (0, 0, -9.81))
        step = make_hht_step(mesh, q.shape[0], h=2e-3, alpha=-0.2)
        qdd = jnp.zeros_like(q)
        for _ in range(1200):
            out = step(q, qd, qdd, f_g)
            q, qd, qdd = out.q, out.qd, out.qdd
        # static reference
        q_static = static_solve(mesh, cantilever(n_elems=6, EI=20.0,
                                                 rhoA=2.0)[1], f_g)
        np.testing.assert_allclose(float(q[-1, 2]), float(q_static[-1, 2]),
                                   atol=0.02)
        # velocities decayed
        assert float(jnp.abs(qd).max()) < 0.2

    def test_first_frequency(self):
        # linearized eigenfrequency of a cantilever: f1 = (1.875^2/2pi) sqrt(EI/(rhoA L^4))
        import jax.numpy as jnp
        from chrono_tpu.fea import make_force_fn
        mesh, q, qd = cantilever(n_elems=8, EI=50.0, rhoA=2.0, L=1.0)
        n = q.shape[0]
        force = make_force_fn(mesh, n)
        K = -jax.jacfwd(lambda qf: force(qf, jnp.zeros_like(qf)))(q.reshape(-1))
        M = mass_matrix(mesh, n)
        free = ~jnp.repeat(mesh.fixed, 6)
        idx = np.where(np.asarray(free))[0]
        Kf = np.asarray(K)[np.ix_(idx, idx)]
        Mf = np.asarray(M)[np.ix_(idx, idx)]
        from scipy.linalg import eigh
        w2 = eigh(Kf, Mf, eigvals_only=True)
        w2 = np.sort(w2[w2 > 1e-6])
        f1 = np.sqrt(w2[0]) / (2 * np.pi)
        f1_expect = (1.8751**2 / (2 * np.pi)) * np.sqrt(50.0 / (2.0 * 1.0**4))
        np.testing.assert_allclose(f1, f1_expect, rtol=0.03)


def test_hht_matrix_free_krylov_matches_dense():
    """HHT with the matrix-free CG linear solver reproduces the dense-LU
    trajectory (the large-FEA path: JVP operator, no Jacobian assembly)."""
    import numpy as np
    import jax.numpy as jnp
    from chrono_tpu.fea import CableBuilder, make_hht_step, gravity_loads

    mesh, q0, qd0 = cantilever(n_elems=8)
    n = q0.shape[0]
    fe = gravity_loads(mesh, n, (0.0, 0.0, -9.81))
    qdd0 = jnp.zeros_like(q0)
    h = 2e-3
    step_d = make_hht_step(mesh, n, h)
    step_k = make_hht_step(mesh, n, h, linear_solver="cg",
                           krylov_iters=400, krylov_tol=1e-9)
    qd_, qk_ = (q0, qd0, qdd0), (q0, qd0, qdd0)
    for _ in range(25):
        od = step_d(*qd_, fe)
        ok = step_k(*qk_, fe)
        qd_ = (od.q, od.qd, od.qdd)
        qk_ = (ok.q, ok.qd, ok.qdd)
    assert np.isfinite(np.asarray(ok.q)).all()
    np.testing.assert_allclose(np.asarray(ok.q), np.asarray(od.q),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(ok.qd), np.asarray(od.qd),
                               atol=5e-3)
