"""Dense direct Schur solver for bilateral-only systems.

Counterpart of the reference's direct linear-solver path
(/root/reference/src/chrono/solver/ChDirectSolverLS.h — Eigen SparseLU over the
assembled saddle matrix).  On TPU, small/medium multibody systems (10²–10⁴
constraint rows) are fastest as a DENSE Schur complement: ``N = D M⁻¹ Dᵀ`` is two
MXU matmuls and a Cholesky factorization, all inside the jitted step — no
sparsity-pattern learning, no host factorization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
import jax.scipy.linalg as jsl

from chrono_tpu.physics.body import BodyProps
from chrono_tpu.physics.constraints import ConstraintRows
from chrono_tpu.solver import descriptor as desc


def _two_prod(a, b):
    """Dekker error-free product: a·b = p + err exactly (Veltkamp split)."""
    split = 4097.0 if a.dtype == jnp.float32 else 134217729.0  # 2^s + 1
    p = a * b
    ca = split * a
    ah = ca - (ca - a)
    al = a - ah
    cb = split * b
    bh = cb - (cb - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _comp_sum(terms):
    """Neumaier-compensated sum of a list of equal-shaped arrays."""
    s = terms[0]
    c = jnp.zeros_like(s)
    for t in terms[1:]:
        s1 = s + t
        bv = s1 - s
        c = c + (s - (s1 - bv)) + (t - bv)
        s = s1
    return s, c


def _comp_sum_axis(P, axis=-1):
    """Compensated reduction along ``axis``: pairwise tree of two_sums with
    the rounding errors accumulated separately.  Equivalent accuracy class
    to the sequential Neumaier sum, but log2(n) VECTOR ops instead of n —
    the sequential version dominated the small-MBS step latency on TPU
    (hundreds of O(30)-element serial HLOs per step)."""
    P = jnp.moveaxis(P, axis, -1)
    c = jnp.zeros(P.shape[:-1], P.dtype)
    while P.shape[-1] > 1:
        n = P.shape[-1]
        if n % 2:
            P = jnp.concatenate(
                [P, jnp.zeros(P.shape[:-1] + (1,), P.dtype)], axis=-1)
        a = P[..., 0::2]
        b = P[..., 1::2]
        s = a + b
        bv = s - a
        err = (a - (s - bv)) + (b - bv)       # Neumaier branchless two_sum
        c = c + jnp.sum(err, axis=-1)
        P = s
    return P[..., 0], c


def compensated_schur_rhs(rows: ConstraintRows, v_free, w_free) -> Array:
    """``r = D u_free − b`` with error-free products + compensated summation.

    The constrained-direction relative velocities cancel O(|v|·|J|) terms to
    O(h): at fp32 the plain contraction's rounding (eps·20 on the golden
    pendula) passes through N⁻¹ into γ and is amplified by 1/h in the
    reported reactions/accelerations — the dominant fp32 noise once
    stabilization jitter is deadbanded.  Cost: ~4× the plain contraction on
    a tiny (m, 12) product set; only the direct path uses it.
    """
    va = v_free[rows.body_a]
    wa = w_free[rows.body_a]
    vb = v_free[rows.body_b]
    wb = w_free[rows.body_b]
    wc = w_free[rows.body_c]
    # one (m, 16) error-free product + a log-depth compensated reduction
    # (NOT a python loop of per-column products: ~170 serial small HLOs
    # per step was the dominant small-MBS latency on TPU)
    J = jnp.concatenate([rows.Ja_v, rows.Ja_w, rows.Jb_v, rows.Jb_w,
                         rows.Jc_w, -rows.rhs[:, None]], axis=1)
    u = jnp.concatenate([va, wa, vb, wb, wc,
                         jnp.ones_like(rows.rhs)[:, None]], axis=1)
    p, e = _two_prod(J, u)
    s, c = _comp_sum_axis(p, axis=1)
    r = s + (c + jnp.sum(e, axis=1))
    return jnp.where(rows.active, r, 0.0)


def solve_dense_schur(
    rows: ConstraintRows,
    props: BodyProps,
    v_free: Array,
    w_free: Array,
    reg: float = 1e-9,
    reg_fallback: float = 3e-6,
) -> Array:
    """Solve ``N γ = -(D u_free - b)`` exactly (equality constraints only).

    Inactive rows are masked out of D, and the Tikhonov term keeps N invertible
    for redundant constraint sets (the reference relies on direct-solver pivoting;
    regularization is the batched-friendly equivalent).

    Regularization is two-tier: the primary ``reg`` (1e-9) preserves the
    fp32 golden-trajectory fidelity of well-posed systems, but sits below
    fp32 eps — closed kinematic loops of PARALLEL revolutes (leaf-spring
    shackles, planar 4-bars) make N exactly rank-deficient and the
    equilibrated Cholesky then hits rounding-negative pivots -> NaN
    (observed).  When the primary solve comes back non-finite, a traced
    ``lax.cond`` re-solves with ``reg_fallback`` (3e-6, safely above eps);
    the compensated iterative refinement keeps the bias small, and the
    redundant multiplier directions it damps lie in null(D^T) — they do not
    affect body motion.  (A flat 3e-6 everywhere was measured to break 3 of
    the 14 golden joint cases; the two-tier scheme keeps both worlds.)
    """
    n_bodies = props.inv_mass.shape[0]
    D = desc.dense_D(rows, n_bodies)  # (m, 6N)
    minv = jnp.stack(
        [jnp.broadcast_to(props.inv_mass[:, None], (n_bodies, 3)),
         props.inv_inertia], axis=1,
    ).reshape(n_bodies * 6)
    # N = D M^-1 D^T  — MXU matmuls
    DM = D * minv[None, :]
    N0 = DM @ D.T
    m = rows.m
    scale = jnp.maximum(jnp.trace(N0) / jnp.maximum(m, 1), 1.0)
    r = compensated_schur_rhs(rows, v_free, w_free)
    r = jnp.where(rows.active, r, 0.0)

    def solve_at(reg_v):
        N = N0 + (reg_v * scale) * jnp.eye(m, dtype=N0.dtype)
        # inactive rows: force gamma=0 via identity rows
        N = jnp.where(rows.active[:, None] & rows.active[None, :], N,
                      jnp.eye(m, dtype=N.dtype))
        # Jacobi equilibration: joint rows mix translational (|J|~1, 1/m)
        # and rotational (|J|~arm, 1/I) scales — raw cond(N) reaches 1e5+ on
        # the golden pendula, which at fp32 puts eps·cond noise straight
        # into γ/h reactions.  Symmetric scaling drops cond to the scaled
        # matrix's.
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(N), 1e-30))
        Ns = N * s[:, None] * s[None, :]
        cho = jsl.cho_factor(Ns, lower=True)
        # ONE batched triangular solve for the scaled inverse: the
        # refinement corrections then become matmuls instead of two more
        # sequential cho_solves (each a 2·m-step serial loop — measured as
        # small-MBS step latency, not FLOPs)
        inv_s = jsl.cho_solve(cho, jnp.eye(m, dtype=Ns.dtype))
        gamma = s * (inv_s @ (-(s * r)))
        # two steps of iterative refinement with a COMPENSATED residual
        # (a plain fp32 N@γ+r has the same eps·‖N‖·‖γ‖ rounding as the
        # error being corrected — the residual must be error-free to gain
        # digits); the error-free products and the compensated row sums are
        # fully vectorized (log-depth tree, see _comp_sum_axis)
        for _ in range(2):
            p, e = _two_prod(N, gamma[None, :])
            ssum, c = _comp_sum_axis(p, axis=1)
            resid = (ssum + r) + (c + jnp.sum(e, axis=1))
            gamma = gamma - s * (inv_s @ (s * resid))
        return gamma

    import jax
    gamma = solve_at(jnp.asarray(reg, N0.dtype))
    bad = ~jnp.isfinite(gamma).all()
    return jax.lax.cond(
        bad,
        lambda _: solve_at(jnp.asarray(reg_fallback, N0.dtype)),
        lambda g: g,
        gamma)
