"""Krylov linear solvers vs dense ground truth.

Mirrors the role of the reference's iterative-LS engines
(src/chrono/solver/ChIterativeSolverLS.h) exercised against known systems.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.solver.krylov import (
    solve_cg, solve_bicgstab, solve_minres, solve_gmres,
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return A.astype(np.float32), b.astype(np.float32)


def _nonsym(n, seed=1):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)
    return A.astype(np.float32), b.astype(np.float32)


def _sym_indef(n, seed=2):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.concatenate([np.linspace(1, 10, n // 2),
                        -np.linspace(1, 10, n - n // 2)])
    A = (Q * d) @ Q.T
    b = rng.standard_normal(n)
    return A.astype(np.float32), b.astype(np.float32)


def test_cg_spd():
    A, b = _spd(64)
    x_ref = np.linalg.solve(A, b)
    op = lambda v: jnp.asarray(A) @ v
    sol = solve_cg(op, jnp.asarray(b), max_iter=300, tol=1e-6)
    assert np.allclose(np.asarray(sol.x), x_ref, atol=5e-4)
    assert float(sol.residual) < 1e-5


def test_cg_jacobi_preconditioned_converges_faster():
    A, b = _spd(64, seed=3)
    A += np.diag(np.linspace(0, 100, 64)).astype(np.float32)  # bad scaling
    op = lambda v: jnp.asarray(A) @ v
    d = jnp.asarray(1.0 / np.diag(A))
    plain = solve_cg(op, jnp.asarray(b), max_iter=500, tol=1e-6)
    prec = solve_cg(op, jnp.asarray(b), Minv=lambda r: d * r,
                    max_iter=500, tol=1e-6)
    assert int(prec.iterations) <= int(plain.iterations)
    assert float(prec.residual) < 1e-5


def test_bicgstab_nonsymmetric():
    A, b = _nonsym(48)
    x_ref = np.linalg.solve(A, b)
    op = lambda v: jnp.asarray(A) @ v
    sol = solve_bicgstab(op, jnp.asarray(b), max_iter=300, tol=1e-7)
    assert np.allclose(np.asarray(sol.x), x_ref, atol=5e-4)


def test_minres_symmetric_indefinite():
    A, b = _sym_indef(40)
    x_ref = np.linalg.solve(A, b)
    op = lambda v: jnp.asarray(A) @ v
    sol = solve_minres(op, jnp.asarray(b), max_iter=400, tol=1e-7)
    assert np.allclose(np.asarray(sol.x), x_ref, atol=2e-3)


@pytest.mark.parametrize("maker", [_spd, _nonsym])
def test_gmres(maker):
    A, b = maker(40)
    x_ref = np.linalg.solve(A, b)
    op = lambda v: jnp.asarray(A) @ v
    sol = solve_gmres(op, jnp.asarray(b), restart=20, max_restarts=10,
                      tol=1e-6)
    assert np.allclose(np.asarray(sol.x), x_ref, atol=2e-3)
    assert float(sol.residual) < 1e-4


def test_gmres_early_convergence_masking():
    # identity system converges in one Arnoldi step; masked steps must not
    # corrupt the solution
    n = 16
    op = lambda v: v
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    jnp.float32)
    sol = solve_gmres(op, b, restart=8, max_restarts=4, tol=1e-6)
    assert np.allclose(np.asarray(sol.x), np.asarray(b), atol=1e-5)
