"""Unified constraint-row representation and autodiff Jacobian lowering.

This is the TPU-native replacement for the reference's ``ChSystemDescriptor`` +
``ChConstraint`` registry (/root/reference/src/chrono/solver/ChSystemDescriptor.h,
ChConstraint*.h): instead of a list of constraint objects each owning sparse
Jacobian blocks, all scalar constraint rows live in one padded struct-of-arrays
buffer.  Rows reference at most two bodies; the Schur-complement operator
``N·γ = D M⁻¹ Dᵀ γ`` becomes gather → segment-sum → gather over these arrays
(see chrono_tpu.solver.descriptor).

Jacobians are exact: each joint type defines its position-level gap function
``c(x_a, q_a, x_b, q_b)`` and rows are obtained by forward-mode autodiff along the
12 tangent directions ``(δx_a, δθ_a^local, δx_b, δθ_b^local)`` — replacing the
reference's ~40 hand-derived ``ChLinkLock*/ChLinkMate*`` Jacobian implementations
with one generic, machine-checked lowering.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q


@pytree_dataclass
class ConstraintRows:
    """M scalar constraint rows, each coupling up to THREE bodies.

    The velocity-level constraint is
        ``Ja_v·v_a + Ja_w·w_a + Jb_v·v_b + Jb_w·w_b + Jc_w·w_c = rhs``
    with ``v`` world linear velocity and ``w`` body-local angular velocity.
    ``rhs`` already contains Baumgarte/contact stabilization ``-C/h`` and motor
    velocity set-points ``-Ct``.

    The third slot exists for the drivetrain constraints that genuinely couple
    three 1-DOF variables (the reference's ChShaftsPlanetary,
    /root/reference/src/chrono/physics/ChShaftsPlanetary.h); ordinary joint /
    contact rows leave it at body 0 with zero Jacobians.
    """

    body_a: Array  # (M,) int32
    body_b: Array  # (M,) int32
    body_c: Array  # (M,) int32 (0 + zero Jacobian when unused)
    Ja_v: Array    # (M, 3)
    Ja_w: Array    # (M, 3)
    Jb_v: Array    # (M, 3)
    Jb_w: Array    # (M, 3)
    Jc_w: Array    # (M, 3) third slot is rotational-only (shaft coupling)
    rhs: Array     # (M,)
    active: Array  # (M,) bool

    @property
    def m(self) -> int:
        return self.body_a.shape[0]

    @staticmethod
    def two_body(body_a, body_b, Ja_v, Ja_w, Jb_v, Jb_w, rhs, active
                 ) -> "ConstraintRows":
        """Standard two-body rows (third slot inert)."""
        return ConstraintRows(
            body_a=body_a, body_b=body_b,
            body_c=jnp.zeros_like(body_a),
            Ja_v=Ja_v, Ja_w=Ja_w, Jb_v=Jb_v, Jb_w=Jb_w,
            Jc_w=jnp.zeros_like(Ja_w),
            rhs=rhs, active=active,
        )

    @staticmethod
    def empty(dtype=jnp.float32) -> "ConstraintRows":
        z3 = jnp.zeros((0, 3), dtype)
        zi = jnp.zeros((0,), jnp.int32)
        return ConstraintRows(
            body_a=zi, body_b=zi, body_c=zi,
            Ja_v=z3, Ja_w=z3, Jb_v=z3, Jb_w=z3, Jc_w=z3,
            rhs=jnp.zeros((0,), dtype),
            active=jnp.zeros((0,), bool),
        )


def concat_rows(rows_list) -> ConstraintRows:
    rows_list = [r for r in rows_list if r is not None and r.m > 0]
    if not rows_list:
        return ConstraintRows.empty()
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *rows_list
    )


def _perturbed_pose(x, q, dx, dth):
    """First-order pose perturbation along tangent (δx, δθ_local)."""
    zero = jnp.zeros_like(dth[..., :1])
    dq = 0.5 * Q.qmul(q, jnp.concatenate([zero, dth], axis=-1))
    return x + dx, q + dq


def lower_gap_function(
    gap_fn: Callable, n_rows: int
) -> Callable:
    """Build a batched lowering for a joint type.

    ``gap_fn(x_a, q_a, x_b, q_b, params) -> (n_rows,)`` is the position-level gap.
    Returns ``lower(xs, qs, body_a, body_b, params, h, stab_factor) -> ConstraintRows``
    producing ``n_rows`` rows per joint with exact velocity Jacobians and
    stabilized rhs ``-C·stab_factor/h``.
    """

    def _one(x_a, q_a, x_b, q_b, params):
        def lifted(u):
            xa, qa = _perturbed_pose(x_a, q_a, u[0:3], u[3:6])
            xb, qb = _perturbed_pose(x_b, q_b, u[6:9], u[9:12])
            return gap_fn(xa, qa, xb, qb, params)

        C = gap_fn(x_a, q_a, x_b, q_b, params)
        J = jax.jacfwd(lifted)(jnp.zeros((12,), dtype=x_a.dtype))  # (n_rows, 12)
        return C, J

    _batched = jax.vmap(_one, in_axes=(0, 0, 0, 0, 0))

    def lower(states_x, states_q, body_a, body_b, params, h, stab_factor=1.0,
              deadband=0.0):
        x_a = states_x[body_a]
        q_a = states_q[body_a]
        x_b = states_x[body_b]
        q_b = states_q[body_b]
        C, J = _batched(x_a, q_a, x_b, q_b, params)  # (J, n), (J, n, 12)
        if deadband:
            # soft-threshold the violation at the fp32 position-roundoff
            # floor: Baumgarte would otherwise convert eps32·|x| jitter into
            # stab/h-scaled velocity kicks (and /h again into reported
            # accelerations/reactions) every step
            C = jnp.sign(C) * jnp.maximum(jnp.abs(C) - deadband, 0.0)
        nj = body_a.shape[0]
        flat = lambda a: a.reshape(nj * n_rows, -1)
        rep = lambda a: jnp.repeat(a, n_rows)
        return ConstraintRows.two_body(
            body_a=rep(body_a),
            body_b=rep(body_b),
            Ja_v=flat(J[..., 0:3]),
            Ja_w=flat(J[..., 3:6]),
            Jb_v=flat(J[..., 6:9]),
            Jb_w=flat(J[..., 9:12]),
            rhs=-(stab_factor / h) * C.reshape(-1),
            active=jnp.ones((nj * n_rows,), bool),
        )

    return lower
