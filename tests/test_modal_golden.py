"""Eigensolver menu vs the reference's recorded golden data
(/root/reference/data/testing/modal/eigensolver/*, written by
utest_MOD_eigensolver.cpp and cross-checked there against MATLAB's eigs):

 * SymAB / UnsymAB — generalized pencils A x = λ B x (B singular);
 * SymKMCq — constrained undamped K/M/Cq (λ = −ω² convention of
   BuildUndampedSystem, ChGeneralizedEigenvalueSolver.h:178);
 * KRMCq / UnsymKRMCq — constrained damped quadratic (complex λ).

Same acceptance as the reference: max |Δλ| ≤ 1e-3 against the MATLAB
values (imaginary parts compared by magnitude, conjugate-pair order free).
"""

import os

import numpy as np
import pytest
import scipy.io

REF = "/root/reference/data/testing/modal/eigensolver"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference golden data not available")

TOL = 1e-3


def load(case, name):
    path = os.path.join(REF, case, f"{case}_{name}.txt")
    m = scipy.io.mmread(path)
    if hasattr(m, "toarray"):
        m = m.toarray()
    return np.asarray(m)


def load_meta(case):
    sigma = np.asarray(load(case, "sigma")).ravel()[0]
    reqeigs = int(np.asarray(load(case, "reqeigs")).ravel()[0])
    eigvals = np.asarray(load(case, "eigvals_MATLAB")).ravel()
    return sigma, reqeigs, eigvals


def _match_complex(got, want):
    """Reference comparator (utest_MOD_eigensolver.cpp
    GetEigenvaluesMaxDiff): reals directly, imaginaries by magnitude, after
    sorting both consistently."""
    def key(v):
        return np.lexsort((np.abs(np.imag(v)), np.real(v)))
    g = got[key(got)]
    w = want[key(want)]
    return max(float(np.max(np.abs(np.real(g) - np.real(w)))),
               float(np.max(np.abs(np.abs(np.imag(g)) - np.abs(np.imag(w))))))


def test_sym_pencil():
    from chrono_tpu.fea.eig import sym_pencil_eigs
    sigma, n, want = load_meta("SymAB")
    vals, _ = sym_pencil_eigs(load("SymAB", "A"), load("SymAB", "B"),
                              n, sigma)
    assert _match_complex(vals, want.astype(complex)) < TOL


def test_unsym_pencil():
    from chrono_tpu.fea.eig import sym_pencil_eigs
    sigma, n, want = load_meta("UnsymAB")
    vals, _ = sym_pencil_eigs(load("UnsymAB", "A"), load("UnsymAB", "B"),
                              n, complex(sigma))
    assert _match_complex(vals, want.astype(complex)) < TOL


def test_undamped_constrained_KMCq():
    from chrono_tpu.fea.eig import undamped_modes
    sigma, n, want = load_meta("SymKMCq")
    vals, modes = undamped_modes(load("SymKMCq", "K"), load("SymKMCq", "M"),
                                 load("SymKMCq", "Cq"), n=n, sigma=sigma)
    assert _match_complex(vals, want.astype(complex)) < TOL
    # modes satisfy the constraint
    Cq = load("SymKMCq", "Cq")
    assert np.max(np.abs(Cq @ np.real(modes))) < 1e-6 * max(
        1.0, np.abs(modes).max())


def test_damped_constrained_KRMCq():
    from chrono_tpu.fea.eig import damped_modes
    sigma, n, want = load_meta("KRMCq")
    vals, _ = damped_modes(load("KRMCq", "K"), load("KRMCq", "R"),
                           load("KRMCq", "M"), load("KRMCq", "Cq"),
                           n=n, sigma=complex(sigma))
    assert _match_complex(vals, want.astype(complex)) < TOL


def test_damped_constrained_unsym():
    from chrono_tpu.fea.eig import damped_modes
    sigma, n, want = load_meta("UnsymKRMCq")
    vals, _ = damped_modes(load("UnsymKRMCq", "K"), load("UnsymKRMCq", "R"),
                           load("UnsymKRMCq", "M"), load("UnsymKRMCq", "Cq"),
                           n=n, sigma=complex(sigma))
    assert _match_complex(vals, want.astype(complex)) < TOL
