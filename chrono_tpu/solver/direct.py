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


def solve_dense_schur(
    rows: ConstraintRows,
    props: BodyProps,
    v_free: Array,
    w_free: Array,
    reg: float = 1e-9,
) -> Array:
    """Solve ``N γ = -(D u_free - b)`` exactly (equality constraints only).

    Inactive rows are masked out of D, and the Tikhonov term keeps N invertible
    for redundant constraint sets (the reference relies on direct-solver pivoting;
    regularization is the batched-friendly equivalent).
    """
    n_bodies = props.inv_mass.shape[0]
    D = desc.dense_D(rows, n_bodies)  # (m, 6N)
    minv = jnp.stack(
        [jnp.broadcast_to(props.inv_mass[:, None], (n_bodies, 3)),
         props.inv_inertia], axis=1,
    ).reshape(n_bodies * 6)
    # N = D M^-1 D^T  — MXU matmuls
    DM = D * minv[None, :]
    N = DM @ D.T
    m = rows.m
    scale = jnp.maximum(jnp.trace(N) / jnp.maximum(m, 1), 1.0)
    N = N + (reg * scale) * jnp.eye(m, dtype=N.dtype)
    r = desc.schur_rhs(rows, v_free, w_free)
    # inactive rows: force gamma=0 via identity rows
    N = jnp.where(rows.active[:, None] & rows.active[None, :], N,
                  jnp.eye(m, dtype=N.dtype))
    r = jnp.where(rows.active, r, 0.0)
    cho = jsl.cho_factor(N, lower=True)
    return jsl.cho_solve(cho, -r)
