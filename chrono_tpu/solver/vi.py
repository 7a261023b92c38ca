"""Matrix-free cone-complementarity (VI) solvers.

TPU-native counterparts of the reference's iterative VI solver family
(/root/reference/src/chrono/solver/ChSolverAPGD.cpp, ChSolverBB.cpp,
ChSolverPSOR.cpp): written as pure fixed-point loops under ``lax.while_loop`` so
the entire Newton/contact solve stays inside one XLA program — no host round
trips per iteration.  All operate on a generic SPD operator ``Nop`` (the Schur
complement, see descriptor.py) and a projector onto the feasible cone.

Problem: minimize ``q(γ) = ½ γᵀNγ + rᵀγ``  s.t. ``γ ∈ K``  (K = ℝ^mb × ∏ cones).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field


class VISolution(NamedTuple):
    gamma: Array
    iterations: Array   # () int32
    residual: Array     # () float


def _norm(x):
    return jnp.sqrt(jnp.sum(x * x))


def solve_apgd(
    Nop: Callable[[Array], Array],
    r: Array,
    project: Callable[[Array], Array],
    gamma0: Array,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> VISolution:
    """Accelerated projected gradient descent (Nesterov) with adaptive Lipschitz
    estimate, backtracking and gradient-based restart.

    Functional re-design of the APGD scheme used by the reference
    (ChSolverAPGD.cpp:30-180 — Mazhar/Heyn/Negrut variant): same algorithmic
    ingredients, expressed as a single ``lax.while_loop`` whose body costs
    1 + (backtracks) Schur products.
    """
    dtype = r.dtype
    gamma = project(gamma0)
    ones = jnp.ones_like(gamma)
    dg0 = _norm(ones - gamma)
    L0 = jnp.where(
        dg0 > 0, _norm(Nop(ones) - Nop(gamma)) / jnp.maximum(dg0, 1e-30), 1.0
    )
    L0 = jnp.maximum(L0, 1e-10)

    def q_val(g, Ng):
        return 0.5 * jnp.dot(g, Ng) + jnp.dot(g, r)

    class S(NamedTuple):
        k: Array
        gamma: Array
        y: Array
        theta: Array
        L: Array
        res: Array
        g_best: Array
        res_best: Array

    def cond(s: S):
        return (s.k < max_iter) & (s.res_best > tol)

    def body(s: S):
        Ny = Nop(s.y)
        grad_y = Ny + r
        qy = q_val(s.y, Ny)

        # backtracking: find L s.t. q(g+) <= q(y) + grad·d + L/2 |d|^2
        def bt_cond(c):
            L, g_new, Ng_new, tries = c
            d = g_new - s.y
            ub = qy + jnp.dot(grad_y, d) + 0.5 * L * jnp.sum(d * d)
            return (q_val(g_new, Ng_new) > ub + 1e-12) & (tries < 12)

        def bt_body(c):
            L, _, _, tries = c
            L2 = 2.0 * L
            g2 = project(s.y - grad_y / L2)
            return (L2, g2, Nop(g2), tries + 1)

        g1 = project(s.y - grad_y / s.L)
        L, g_new, Ng_new, _ = lax.while_loop(
            bt_cond, bt_body, (s.L, g1, Nop(g1), jnp.zeros((), jnp.int32))
        )

        # Nesterov momentum
        th = s.theta
        th_new = 0.5 * (-th * th + th * jnp.sqrt(th * th + 4.0))
        beta = th * (1.0 - th) / (th * th + th_new)
        y_new = g_new + beta * (g_new - s.gamma)

        # restart on non-descent
        restart = jnp.dot(grad_y, g_new - s.gamma) > 0
        y_new = jnp.where(restart, g_new, y_new)
        th_new = jnp.where(restart, 1.0, th_new)

        # natural-map residual at g_new (uses Ng_new from backtracking)
        res = _norm(g_new - project(g_new - (Ng_new + r))) / jnp.maximum(
            jnp.asarray(1.0, dtype), _norm(g_new)
        )
        better = res < s.res_best
        g_best = jnp.where(better, g_new, s.g_best)
        res_best = jnp.where(better, res, s.res_best)

        return S(s.k + 1, g_new, y_new, th_new, 0.9 * L, res, g_best, res_best)

    init = S(
        jnp.zeros((), jnp.int32), gamma, gamma,
        jnp.ones((), dtype), L0.astype(dtype),
        jnp.asarray(jnp.inf, dtype), gamma, jnp.asarray(jnp.inf, dtype),
    )
    out = lax.while_loop(cond, body, init)
    return VISolution(out.g_best, out.k, out.res_best)


def solve_bb(
    Nop: Callable[[Array], Array],
    r: Array,
    project: Callable[[Array], Array],
    gamma0: Array,
    max_iter: int = 100,
    tol: float = 1e-6,
    history: int = 10,
) -> VISolution:
    """Projected Barzilai–Borwein spectral gradient with nonmonotone
    (Grippo-style) line search — the reference's other workhorse VI solver
    (ChSolverBB.cpp:33-110), re-expressed as a lax loop.
    """
    dtype = r.dtype
    gamma = project(gamma0)

    def q_and_grad(g):
        Ng = Nop(g)
        return 0.5 * jnp.dot(g, Ng) + jnp.dot(g, r), Ng + r

    class S(NamedTuple):
        k: Array
        gamma: Array
        grad: Array
        alpha: Array
        fhist: Array  # (history,) recent objective values
        res: Array
        g_best: Array
        res_best: Array

    q0, grad0 = q_and_grad(gamma)
    fhist0 = jnp.full((history,), -jnp.inf, dtype).at[0].set(q0)

    def cond(s: S):
        return (s.k < max_iter) & (s.res_best > tol)

    def body(s: S):
        f_ref = jnp.max(s.fhist)

        # projected step along spectral step length, halving until the
        # nonmonotone Armijo condition holds
        def ls_cond(c):
            lam, g_new, q_new, tries = c
            d = g_new - s.gamma
            return (q_new > f_ref + 1e-4 * jnp.dot(s.grad, d)) & (tries < 10)

        def ls_body(c):
            lam, _, _, tries = c
            lam2 = 0.5 * lam
            g2 = project(s.gamma - lam2 * s.alpha * s.grad)
            q2, _ = q_and_grad(g2)
            return (lam2, g2, q2, tries + 1)

        g1 = project(s.gamma - s.alpha * s.grad)
        q1, _ = q_and_grad(g1)
        lam, g_new, q_new, _ = lax.while_loop(
            ls_cond, ls_body, (jnp.ones((), dtype), g1, q1, jnp.zeros((), jnp.int32))
        )
        _, grad_new = q_and_grad(g_new)

        # BB1 spectral step from (s_k, y_k)
        sk = g_new - s.gamma
        yk = grad_new - s.grad
        sy = jnp.dot(sk, yk)
        ss = jnp.dot(sk, sk)
        alpha_new = jnp.where(sy > 1e-30, ss / jnp.maximum(sy, 1e-30), s.alpha)
        alpha_new = jnp.clip(alpha_new, 1e-12, 1e12)

        fhist = jnp.roll(s.fhist, 1).at[0].set(q_new)
        res = _norm(g_new - project(g_new - grad_new)) / jnp.maximum(
            jnp.asarray(1.0, dtype), _norm(g_new)
        )
        better = res < s.res_best
        return S(
            s.k + 1, g_new, grad_new, alpha_new, fhist, res,
            jnp.where(better, g_new, s.g_best),
            jnp.where(better, res, s.res_best),
        )

    init = S(
        jnp.zeros((), jnp.int32), gamma, grad0,
        jnp.ones((), dtype), fhist0,
        jnp.asarray(jnp.inf, dtype), gamma, jnp.asarray(jnp.inf, dtype),
    )
    out = lax.while_loop(cond, body, init)
    return VISolution(out.g_best, out.k, out.res_best)


def solve_pjacobi(
    Nop: Callable[[Array], Array],
    r: Array,
    project: Callable[[Array], Array],
    gamma0: Array,
    diag: Array,
    max_iter: int = 200,
    tol: float = 1e-6,
    omega: float = 0.3,
) -> VISolution:
    """Projected (under-relaxed) Jacobi iteration.

    Data-parallel stand-in for the reference's PSOR (ChSolverPSOR.cpp):
    Gauss–Seidel sweeps are inherently sequential, so on TPU we use the Jacobi
    splitting with per-row diagonal scaling — same fixed point, fully parallel.
    """
    dtype = r.dtype
    inv_d = 1.0 / jnp.maximum(diag, 1e-30)

    def cond(c):
        k, g, res = c
        return (k < max_iter) & (res > tol)

    def body(c):
        k, g, _ = c
        grad = Nop(g) + r
        g_new = project(g - omega * inv_d * grad)
        res = _norm(g_new - g) / jnp.maximum(jnp.asarray(1.0, dtype), _norm(g_new))
        return (k + 1, g_new, res)

    k, g, res = lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), project(gamma0), jnp.asarray(jnp.inf, dtype)),
    )
    return VISolution(g, k, res)


def solve_admm(
    Nop: Callable[[Array], Array],
    r: Array,
    project: Callable[[Array], Array],
    gamma0: Array,
    max_iter: int = 60,
    tol: float = 1e-6,
    rho: float = 1.0,
    inner_cg: int = 8,
    adaptive_rho: bool = True,
) -> VISolution:
    """ADMM with cone-splitting and residual-balancing ρ adaptation (the
    reference's ChSolverADMM with its stepadjust policy,
    /root/reference/src/chrono/solver/ChSolverADMM.cpp).

    Split γ = z with z ∈ K; augmented Lagrangian with penalty ρ:
      γ-update  (N + ρI) γ = ρ(z − u) − r     (few matrix-free CG iterations)
      z-update  z = Π(γ + u)
      u-update  u += γ − z
      ρ-update  Boyd residual balancing: ρ·τ when the primal residual
                dominates, ρ/τ when the dual dominates (u rescaled to keep
                the scaled dual consistent)
    Robust on ill-conditioned mixed bilateral+cone systems where plain
    projected gradients crawl.
    """
    dtype = r.dtype
    z = project(gamma0)
    u = jnp.zeros_like(z)

    def cg(b, x0, rho_k):
        # fixed-iteration CG on (N + ρI) x = b
        def Aop(x):
            return Nop(x) + rho_k * x

        def body(k, carry):
            x, p, res, rs = carry
            Ap = Aop(p)
            alpha = rs / jnp.maximum(jnp.dot(p, Ap), 1e-30)
            x = x + alpha * p
            res = res - alpha * Ap
            rs_new = jnp.dot(res, res)
            beta = rs_new / jnp.maximum(rs, 1e-30)
            p = res + beta * p
            return (x, p, res, rs_new)

        res0 = b - Aop(x0)
        out = lax.fori_loop(0, inner_cg, body,
                            (x0, res0, res0, jnp.dot(res0, res0)))
        return out[0]

    class S(NamedTuple):
        k: Array
        gamma: Array
        z: Array
        u: Array
        rho: Array
        res: Array

    def cond(s: S):
        return (s.k < max_iter) & (s.res > tol)

    def body(s: S):
        gamma = cg(s.rho * (s.z - s.u) - r, s.gamma, s.rho)
        z_new = project(gamma + s.u)
        u_new = s.u + gamma - z_new
        r_pri = _norm(gamma - z_new)
        r_dua = s.rho * _norm(z_new - s.z)
        res = (r_pri + r_dua) / jnp.maximum(jnp.asarray(1.0, dtype),
                                            _norm(z_new))
        rho_new = s.rho
        if adaptive_rho:
            mu_b, tau = 10.0, 2.0
            up = r_pri > mu_b * r_dua
            dn = r_dua > mu_b * r_pri
            rho_new = jnp.where(up, s.rho * tau,
                                jnp.where(dn, s.rho / tau, s.rho))
            u_new = u_new * s.rho / rho_new   # keep the scaled dual variable
        return S(s.k + 1, gamma, z_new, u_new, rho_new, res)

    out = lax.while_loop(
        cond, body,
        S(jnp.zeros((), jnp.int32), z, z, u,
          jnp.asarray(rho, dtype), jnp.asarray(jnp.inf, dtype)))
    return VISolution(out.z, out.k, out.res)


class VIHistory(NamedTuple):
    """Per-iteration records (reference ChIterativeSolverVI::SetRecordViolation
    histories, ChIterativeSolverVI.h:74-90)."""

    violation: Array    # (max_iter,) residual/violation per iteration
    delta_gamma: Array  # (max_iter,) ‖Δγ‖ per iteration


def solve_apgd_with_history(Nop, r, project, gamma0, max_iter: int = 100,
                            tol: float = 1e-6):
    """APGD under ``lax.scan`` recording per-iteration violation and ‖Δγ‖.

    Fixed-length iteration (entries after convergence repeat the converged
    values) — the observability variant of :func:`solve_apgd` for solver
    tuning/benchmarks; the while-loop version stays the hot path.
    """
    gamma = project(gamma0)
    ones = jnp.ones_like(gamma)
    dg0 = _norm(ones - gamma)
    L = jnp.where(dg0 > 0, _norm(Nop(ones) - Nop(gamma))
                  / jnp.maximum(dg0, 1e-30), 1.0)
    L = jnp.maximum(L, 1e-10)

    def step(carry, _):
        gamma, y, theta, L = carry
        grad_y = Nop(y) + r
        g_new = project(y - grad_y / L)
        # simple backtracking (one halving test, scan-friendly)
        q_y = 0.5 * jnp.dot(y, Nop(y)) + jnp.dot(y, r)
        q_new = 0.5 * jnp.dot(g_new, Nop(g_new)) + jnp.dot(g_new, r)
        lin = q_y + jnp.dot(grad_y, g_new - y) \
            + 0.5 * L * jnp.sum((g_new - y) ** 2)
        L = jnp.where(q_new > lin, 2.0 * L, L)
        g_new = project(y - (Nop(y) + r) / L)
        theta_new = 0.5 * (jnp.sqrt(theta**4 + 4 * theta**2) - theta**2)
        beta = theta * (1 - theta) / (theta**2 + theta_new)
        y_new = g_new + beta * (g_new - gamma)
        dgam = _norm(g_new - gamma)
        viol = _norm(g_new - project(g_new - (Nop(g_new) + r)))
        return (g_new, y_new, theta_new, L), (viol, dgam)

    (gamma, _, _, _), (viols, dgams) = lax.scan(
        step, (gamma, gamma, jnp.ones((), r.dtype), L), None,
        length=max_iter)
    res = viols[-1]
    return (VISolution(gamma=gamma, iterations=jnp.asarray(max_iter),
                       residual=res),
            VIHistory(violation=viols, delta_gamma=dgams))
