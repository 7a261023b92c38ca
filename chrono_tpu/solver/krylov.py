"""Matrix-free Krylov linear solvers: CG, BiCGStab, MINRES, GMRES(m).

TPU-native counterpart of the reference's iterative linear-solver menu —
Eigen GMRES/MINRES/BiCGSTAB engines driven through a matrix-free SPMV wrapper
(/root/reference/src/chrono/solver/ChIterativeSolverLS.h:108-124 ChMatrixSPMV
→ descriptor SystemProduct) and the SPH module's in-house BiCGStab/GMRES
(/root/reference/src/chrono_fsi/sph/math/SphLinearSolverBiCGStab.cpp,
SphLinearSolverGMRES.cpp).  Everything here is a pure ``lax.while_loop`` over
a user-supplied operator ``A: (n,) -> (n,)`` so the whole solve fuses into the
surrounding XLA program (ISPH pressure projection, FEA statics, implicit MBS).

All solvers support an optional (left, diagonal-style) preconditioner given as
``Minv: (n,) -> (n,)`` applying M⁻¹.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
from jax import lax, Array


class LSSolution(NamedTuple):
    x: Array
    iterations: Array   # () int32
    residual: Array     # () float — final ‖r‖ / ‖b‖ (relative)


def _nrm(x):
    return jnp.sqrt(jnp.sum(x * x))


def _ident(x):
    return x


def _safe_div(num, den, eps=1e-30):
    """num/den with a sign-preserving breakdown guard (dots can be negative)."""
    safe = jnp.where(jnp.abs(den) > eps, den,
                     jnp.where(den < 0, -eps, eps))
    return num / safe


def solve_cg(A: Callable, b: Array, x0: Optional[Array] = None,
             Minv: Callable = _ident, max_iter: int = 200,
             tol: float = 1e-8) -> LSSolution:
    """Preconditioned conjugate gradient (SPD operators)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    z = Minv(r)
    p = z
    rz = jnp.dot(r, z)
    bnorm = jnp.maximum(_nrm(b), 1e-30)

    def cond(s):
        x, r, z, p, rz, k = s
        return (k < max_iter) & (_nrm(r) / bnorm > tol)

    def body(s):
        x, r, z, p, rz, k = s
        Ap = A(p)
        alpha = _safe_div(rz, jnp.dot(p, Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv(r)
        rz_new = jnp.dot(r, z)
        beta = _safe_div(rz_new, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = lax.while_loop(cond, body, (x, r, z, p, rz,
                                                   jnp.zeros((), jnp.int32)))
    return LSSolution(x=x, iterations=k, residual=_nrm(r) / bnorm)


def solve_bicgstab(A: Callable, b: Array, x0: Optional[Array] = None,
                   Minv: Callable = _ident, max_iter: int = 200,
                   tol: float = 1e-8) -> LSSolution:
    """Preconditioned BiCGStab for general (non-symmetric) operators."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    rhat = r
    rho = jnp.ones((), b.dtype)
    alpha = jnp.ones((), b.dtype)
    omega = jnp.ones((), b.dtype)
    v = jnp.zeros_like(b)
    p = jnp.zeros_like(b)
    bnorm = jnp.maximum(_nrm(b), 1e-30)

    def cond(s):
        x, r, rho, alpha, omega, v, p, k = s
        return (k < max_iter) & (_nrm(r) / bnorm > tol)

    def body(s):
        x, r, rho, alpha, omega, v, p, k = s
        rho_new = jnp.dot(rhat, r)
        beta = _safe_div(rho_new, rho) * _safe_div(alpha, omega)
        p = r + beta * (p - omega * v)
        phat = Minv(p)
        v = A(phat)
        alpha = _safe_div(rho_new, jnp.dot(rhat, v))
        s_vec = r - alpha * v
        shat = Minv(s_vec)
        t = A(shat)
        omega = _safe_div(jnp.dot(t, s_vec), jnp.dot(t, t))
        x = x + alpha * phat + omega * shat
        r = s_vec - omega * t
        return (x, r, rho_new, alpha, omega, v, p, k + 1)

    x, r, _, _, _, _, _, k = lax.while_loop(
        cond, body,
        (x, r, rho, alpha, omega, v, p, jnp.zeros((), jnp.int32)))
    return LSSolution(x=x, iterations=k, residual=_nrm(r) / bnorm)


def solve_minres(A: Callable, b: Array, x0: Optional[Array] = None,
                 max_iter: int = 200, tol: float = 1e-8) -> LSSolution:
    """MINRES for symmetric (possibly indefinite) operators — the saddle-point
    workhorse (the reference exposes Eigen MINRES for FEA/KRM systems)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - A(x)
    bnorm = jnp.maximum(_nrm(b), 1e-30)
    beta1 = _nrm(r0)

    # Lanczos + Givens recurrences (standard MINRES, Paige & Saunders)
    class S(NamedTuple):
        x: Array
        v_prev: Array
        v: Array
        w: Array        # direction recurrences
        w_prev: Array
        beta: Array
        c: Array
        s: Array
        c_prev: Array
        s_prev: Array
        eta: Array      # current residual-driving scalar
        res: Array
        k: Array

    v = r0 / jnp.maximum(beta1, 1e-30)
    init = S(x=x, v_prev=jnp.zeros_like(b), v=v,
             w=jnp.zeros_like(b), w_prev=jnp.zeros_like(b),
             beta=beta1,
             c=jnp.ones((), b.dtype), s=jnp.zeros((), b.dtype),
             c_prev=jnp.ones((), b.dtype), s_prev=jnp.zeros((), b.dtype),
             eta=beta1, res=beta1 / bnorm, k=jnp.zeros((), jnp.int32))

    def cond(st: S):
        return (st.k < max_iter) & (st.res > tol)

    def body(st: S):
        Av = A(st.v)
        alpha = jnp.dot(st.v, Av)
        v_next = Av - alpha * st.v - st.beta * st.v_prev
        beta_next = _nrm(v_next)
        v_next = v_next / jnp.maximum(beta_next, 1e-30)

        # apply previous two Givens rotations to the new tridiagonal column
        delta = st.c * alpha - st.c_prev * st.s * st.beta
        rho2 = st.s * alpha + st.c_prev * st.c * st.beta
        rho3 = st.s_prev * st.beta
        # new rotation annihilating beta_next
        rho1 = jnp.sqrt(delta * delta + beta_next * beta_next)
        rho1 = jnp.maximum(rho1, 1e-30)
        c_new = delta / rho1
        s_new = beta_next / rho1

        w_next = (st.v - rho2 * st.w - rho3 * st.w_prev) / rho1
        x = st.x + c_new * st.eta * w_next
        eta = -s_new * st.eta
        return S(x=x, v_prev=st.v, v=v_next, w=w_next, w_prev=st.w,
                 beta=beta_next, c=c_new, s=s_new, c_prev=st.c,
                 s_prev=st.s, eta=eta,
                 res=jnp.abs(eta) / bnorm, k=st.k + 1)

    out = lax.while_loop(cond, body, init)
    return LSSolution(x=out.x, iterations=out.k, residual=out.res)


def solve_gmres(A: Callable, b: Array, x0: Optional[Array] = None,
                Minv: Callable = _ident, restart: int = 30,
                max_restarts: int = 10, tol: float = 1e-8) -> LSSolution:
    """Restarted GMRES(m) with Arnoldi + Givens QR, all in lax control flow.

    The Krylov basis is a fixed (m+1, n) buffer; iterations inside a cycle are
    masked once converged, so the program shape is static.
    """
    n = b.shape[0]
    m = restart
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(_nrm(b), 1e-30)

    def one_cycle(carry):
        x, _, outer = carry
        r = Minv(b - A(x))
        beta = _nrm(r)

        V = jnp.zeros((m + 1, n), b.dtype).at[0].set(
            r / jnp.maximum(beta, 1e-30))
        H = jnp.zeros((m + 1, m), b.dtype)
        cs = jnp.zeros((m,), b.dtype)
        sn = jnp.zeros((m,), b.dtype)
        g = jnp.zeros((m + 1,), b.dtype).at[0].set(beta)

        def arnoldi_step(j, st):
            V, H, cs, sn, g, done = st
            w = Minv(A(V[j]))
            # modified Gram-Schmidt against all basis vectors (masked > j)
            idx = jnp.arange(m + 1)
            mask = (idx <= j)[:, None]
            hcol = jnp.sum(jnp.where(mask, V, 0.0) * w[None, :], axis=1)
            w = w - jnp.sum(jnp.where(mask, V, 0.0) * hcol[:, None], axis=0)
            hj1 = _nrm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, 1e-30))
            hcol = hcol.at[j + 1].set(hj1)

            # apply existing Givens rotations to the new column
            def rot(i, hc):
                hi, hi1 = hc[i], hc[i + 1]
                return hc.at[i].set(cs[i] * hi + sn[i] * hi1) \
                         .at[i + 1].set(-sn[i] * hi + cs[i] * hi1)

            hcol = lax.fori_loop(0, j, rot, hcol)
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            denom = jnp.maximum(denom, 1e-30)
            c_j = hcol[j] / denom
            s_j = hcol[j + 1] / denom
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            cs = cs.at[j].set(c_j)
            sn = sn.at[j].set(s_j)
            g = g.at[j + 1].set(-s_j * g[j])
            g = g.at[j].set(c_j * g[j])
            H = H.at[:, j].set(hcol)
            done = done | (jnp.abs(g[j + 1]) / bnorm < tol)
            return (V, H, cs, sn, g, done)

        # run all m steps (masking after convergence costs extra matvecs but
        # keeps shapes static; restart m is small)
        V, H, cs, sn, g, _ = lax.fori_loop(
            0, m, lambda j, st: lax.cond(st[5], lambda s: s,
                                         lambda s: arnoldi_step(j, s), st),
            (V, H, cs, sn, g, jnp.zeros((), bool)))

        # back-substitution on the m×m upper-triangular H (masked full solve)
        def back(i_rev, y):
            i = m - 1 - i_rev
            rhs = g[i] - jnp.dot(H[i, :], y)
            yi = rhs / jnp.where(jnp.abs(H[i, i]) > 1e-30, H[i, i], 1.0)
            return y.at[i].set(jnp.where(jnp.abs(H[i, i]) > 1e-30, yi, 0.0))

        y = lax.fori_loop(0, m, back, jnp.zeros((m,), b.dtype))
        x = x + V[:m].T @ y
        res = _nrm(b - A(x)) / bnorm
        return (x, res, outer + 1)

    def cond(carry):
        _, res, outer = carry
        return (outer < max_restarts) & (res > tol)

    x, res, outer = lax.while_loop(
        cond, one_cycle, (x, jnp.ones((), b.dtype), jnp.zeros((), jnp.int32)))
    return LSSolution(x=x, iterations=outer * m, residual=res)
