"""Constrained generalized eigensolvers (the chrono_modal solver menu).

Role-equivalents of the reference's ChSymGenEigenvalueSolver /
ChUnsymGenEigenvalueSolver / ChModalSolverUndamped / ChModalSolverDamped
(/root/reference/src/chrono_modal/ChGeneralizedEigenvalueSolver.h:178
BuildUndampedSystem, :235 BuildDampedSystem) in a dense TPU-framework
design: instead of bordered sparse pencils handed to Krylov–Schur/Spectra,
constraints are eliminated exactly through an SVD null-space basis of Cq and
the reduced dense problem is solved directly — at modal-analysis sizes
(10²–10⁴ DOF after reduction) dense LAPACK is faster than a Krylov loop, and
the null-space form is better conditioned than the bordered form (no zero
B-block, no Cq scaling heuristic needed).

Host-side numpy/scipy: modal analysis is offline setup work (the reference's
is likewise CPU-only), not the jitted simulation path.

Eigenvalue conventions match the reference pencils:
  undamped  A x = λ B x with A=[[-K,-Cqᵀ],[-Cq,0]], B=[[M,0],[0,0]]
            → finite λ = −ω²  (returned as-is for golden comparison)
  damped    quadratic (λ² M + λ R + K) v = 0 on ker(Cq) → complex λ
"""

from __future__ import annotations

import numpy as np
import scipy.linalg


def nullspace(Cq, rtol=1e-10):
    """Orthonormal basis of ker(Cq) via SVD ((n, n−rank) dense)."""
    Cq = np.atleast_2d(np.asarray(Cq, float))
    if Cq.size == 0 or Cq.shape[0] == 0:
        return np.eye(Cq.shape[1] if Cq.ndim == 2 else 0)
    u, s, vh = np.linalg.svd(Cq, full_matrices=True)
    rank = int(np.sum(s > rtol * (s[0] if s.size else 1.0)))
    return vh[rank:].T


def _closest(vals, vecs, n, sigma):
    order = np.argsort(np.abs(vals - sigma))[:n]
    # deterministic presentation: ascending by real part, then imag
    sub = order[np.lexsort((np.imag(vals[order]), np.real(vals[order])))]
    return vals[sub], vecs[:, sub]


def sym_pencil_eigs(A, B, n, sigma=0.0):
    """n eigenpairs of the symmetric pencil A x = λ B x closest to sigma
    (B possibly singular — QZ, infinite eigenvalues discarded)."""
    A = np.asarray(A, float)
    B = np.asarray(B, float)
    vals, vecs = scipy.linalg.eig(A, B)
    finite = np.isfinite(vals) & (np.abs(vals) < 1e12)
    return _closest(vals[finite], vecs[:, finite], n, sigma)


def undamped_modes(K, M, Cq=None, n=6, sigma=0.0):
    """Constrained undamped modes: finite eigenvalues λ = −ω² of the
    reference's bordered pencil, computed on ker(Cq).

    Returns (λ (n,), modes (n_vars, n) in the FULL coordinate set)."""
    K = np.asarray(K, float)
    M = np.asarray(M, float)
    if Cq is None or np.size(Cq) == 0:
        Z = np.eye(K.shape[0])
    else:
        Z = nullspace(Cq)
    Kr = Z.T @ K @ Z
    Mr = Z.T @ M @ Z
    # reduced symmetric-definite problem: −K̃ v = λ M̃ v
    vals, vecs = scipy.linalg.eigh(-(Kr + Kr.T) / 2, (Mr + Mr.T) / 2)
    vals, vecs = _closest(vals.astype(complex), vecs.astype(complex), n, sigma)
    return vals, Z @ vecs


def damped_modes(K, R, M, Cq=None, n=6, sigma=0.0):
    """Constrained damped modes: complex eigenvalues of the quadratic
    problem (λ²M + λR + K)v = 0 restricted to ker(Cq) (the reference's
    ChModalSolverDamped role).  Returns (λ complex (n,), modes)."""
    K = np.asarray(K, float)
    R = np.asarray(R, float)
    M = np.asarray(M, float)
    if Cq is None or np.size(Cq) == 0:
        Z = np.eye(K.shape[0])
    else:
        Z = nullspace(Cq)
    Kr, Rr, Mr = Z.T @ K @ Z, Z.T @ R @ Z, Z.T @ M @ Z
    m = Kr.shape[0]
    # generalized companion pencil (M̃ may be singular — massless DOFs):
    # [0 I; −K̃ −R̃] x = λ [I 0; 0 M̃] x, infinite eigenvalues discarded by QZ
    A_l = np.block([[np.zeros((m, m)), np.eye(m)], [-Kr, -Rr]])
    B_l = np.block([[np.eye(m), np.zeros((m, m))],
                    [np.zeros((m, m)), Mr]])
    vals, vecs = scipy.linalg.eig(A_l, B_l)
    finite = np.isfinite(vals) & (np.abs(vals) < 1e12)
    vals, vecs = _closest(vals[finite], vecs[:, finite], n, sigma)
    return vals, Z @ vecs[:m]


def natural_frequencies(K, M, Cq=None, n=6):
    """ω/2π [Hz] of the n lowest constrained modes (convenience)."""
    vals, _ = undamped_modes(K, M, Cq, n=n, sigma=0.0)
    return np.sqrt(np.maximum(-np.real(vals), 0.0)) / (2 * np.pi)
