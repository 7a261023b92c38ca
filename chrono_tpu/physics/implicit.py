"""MBS-level implicit integration: HHT-α with Newton and step rejection.

TPU-native counterpart of the reference's stiff-system machinery
(/root/reference/src/chrono/timestepper/ChTimestepperHHT.cpp:93 PrepareStep /
:120 Increment, with the Newton loop + Jacobian-reuse/step-rejection policy of
ChTimestepperImplicit.cpp:99-312): the index-3 HHT DAE over bodies + bilateral
joints.  Where the reference assembles sparse KRM blocks and calls a direct
solver per Newton iteration, here the whole residual is a pure function of the
unknown ``u = [accelerations, multipliers]`` and the EXACT Newton matrix comes
from forward-mode autodiff — constraint reaction term included, via the
identity  ∂(λᵀ C(x(a)))/∂a = β h² Jᵀ λ  (no hand-assembled Jacobians
anywhere).  Dense MXU factorization: right for the 10²–10³-DOF stiff
mechanisms this targets (the DVI stepper remains the large-contact-count
path).

Step rejection: a step whose Newton fails to converge is retried at h/2 (up
to ``max_halvings``), mirroring the reference's rejection policy; the actual
step taken is returned.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.body import BodyState
from chrono_tpu.physics.system import Model, applied_forces
from chrono_tpu.physics.joints import JOINT_TYPES


class HHTStepOut(NamedTuple):
    state: BodyState
    acc: Array          # (N, 6) end-of-step accelerations (warm start)
    h_used: Array       # () actual step after any halvings
    iterations: Array
    residual: Array


def _constraint_C(model: Model, x, q):
    """Position-level violations of all joints, concatenated (M,)."""
    parts = []
    for kind, data in model.joints.items():
        gap_fn, n_rows = JOINT_TYPES[kind]

        def one(i, gap_fn=gap_fn, data=data):
            p = {"fa_pos": data.fa_pos[i], "fa_rot": data.fa_rot[i],
                 "fb_pos": data.fb_pos[i], "fb_rot": data.fb_rot[i],
                 "aux": data.aux[i]}
            a, b = data.body_a[i], data.body_b[i]
            return gap_fn(x[a], q[a], x[b], q[b], p)

        parts.append(jax.vmap(one)(jnp.arange(data.n)).reshape(-1))
    if not parts:
        return jnp.zeros((0,), x.dtype)
    return jnp.concatenate(parts)


def make_hht_mbs_step(model: Model, alpha: float = -0.2,
                      newton_iters: int = 12, tol: float = 1e-6,
                      max_halvings: int = 3, beta: float = None,
                      gamma: float = None):
    """Build ``step(state, acc_prev, t, h) -> HHTStepOut`` (jit-safe).

    Supports bodies, all joint types, TSDA/RSDA/shaft force elements and
    gravity (constraint motors stay on the DVI path).  ``acc_prev`` is the
    (N, 6) acceleration warm start ((0s at t=0, or the previous step's out).

    With default ``beta``/``gamma`` this is HHT-α; passing them explicitly
    (with ``alpha=0``) yields the whole Newmark family — see
    :func:`make_newmark_mbs_step` and friends.
    """
    if beta is None:
        beta = (1.0 - alpha) ** 2 / 4.0
    if gamma is None:
        gamma = 0.5 - alpha
    n = model.n_bodies
    inv_m = model.props.inv_mass
    mass = jnp.where(inv_m > 0, 1.0 / jnp.maximum(inv_m, 1e-30), 0.0)
    inertia = jnp.where(model.props.inv_inertia > 0, model.props.inertia, 0.0)
    # free DOFs: fixed bodies (and dead shaft axes) keep a = 0 identity rows.
    # BODY-MAJOR layout [lin(3), ang(3)] per body — must match u's reshape.
    free = jnp.concatenate(
        [jnp.repeat((inv_m > 0)[:, None], 3, axis=1),
         model.props.inv_inertia > 0], axis=1).reshape(-1)
    m_rows = sum(JOINT_TYPES[k][1] * d.n for k, d in model.joints.items())
    n_dof = 6 * n

    def new_pose(state, acc, a_lin, a_ang, h):
        x_new = state.x + h * state.v + h * h * (
            (0.5 - beta) * acc[:, 0:3] + beta * a_lin)
        rotvec = h * state.w + h * h * ((0.5 - beta) * acc[:, 3:6]
                                        + beta * a_ang)
        q_new = Q.qmul(state.q, Q.qexp_half(rotvec))
        v_new = state.v + h * ((1.0 - gamma) * acc[:, 0:3] + gamma * a_lin)
        w_new = state.w + h * ((1.0 - gamma) * acc[:, 3:6] + gamma * a_ang)
        return x_new, q_new, v_new, w_new

    def residual(u, state, acc, f_old, tau_old, t, h):
        a = u[:n_dof].reshape(n, 6)
        lam = u[n_dof:]
        a_lin, a_ang = a[:, 0:3], a[:, 3:6]
        x_new, q_new, v_new, w_new = new_pose(state, acc, a_lin, a_ang, h)
        st_new = BodyState(x=x_new, q=q_new, v=v_new, w=w_new)
        f_new, tau_new = applied_forces(model, st_new, t + h)

        def lamC(a_flat):
            aa = a_flat.reshape(n, 6)
            x2, q2, _, _ = new_pose(state, acc, aa[:, 0:3], aa[:, 3:6], h)
            return jnp.dot(lam, _constraint_C(model, x2, q2))

        # Jᵀλ in the (v, w_local) basis = (1/βh²) ∂(λᵀC)/∂a
        JTlam = jax.grad(lamC)(u[:n_dof]) / (beta * h * h)

        r_lin = (mass[:, None] * a_lin
                 - (1.0 + alpha) * f_new + alpha * f_old).reshape(-1)
        r_ang = (inertia * a_ang
                 - (1.0 + alpha) * tau_new + alpha * tau_old).reshape(-1)
        r_a = (jnp.stack([r_lin.reshape(n, 3), r_ang.reshape(n, 3)],
                         axis=1).reshape(n, 6).reshape(-1) + JTlam)
        r_a = jnp.where(free, r_a, u[:n_dof])       # fixed dofs: a = 0
        # velocity-scale the constraint rows (C/h): the index-3 1/(βh²)
        # factor would amplify fp32 position noise (~1e-7·scale) to O(1)
        # residuals and stall Newton; λ's units absorb the choice
        r_c = _constraint_C(model, x_new, q_new) / h
        return jnp.concatenate([r_a, r_c])

    jac = jax.jacfwd(residual)

    def newton_solve(state, acc, f_old, tau_old, t, h, u0):
        def body(carry):
            u, k, res = carry
            r = residual(u, state, acc, f_old, tau_old, t, h)
            J = jac(u, state, acc, f_old, tau_old, t, h)
            du = jnp.linalg.solve(J, -r)
            u = u + du
            res = jnp.linalg.norm(
                residual(u, state, acc, f_old, tau_old, t, h))
            return (u, k + 1, res)

        def cond(carry):
            _, k, res = carry
            # NaN res compares False → divergence exits the loop on its own
            return (k < newton_iters) & (res > tol)

        u, iters, res = lax.while_loop(
            cond, body, (u0, jnp.zeros((), jnp.int32),
                         jnp.asarray(jnp.inf, u0.dtype)))
        return u, iters, res

    def step(state: BodyState, acc_prev: Array, t, h) -> HHTStepOut:
        f_old, tau_old = applied_forces(model, state, t)
        u0 = jnp.concatenate([acc_prev.reshape(-1),
                              jnp.zeros((m_rows,), state.x.dtype)])

        def reject_cond(carry):
            h_try, u, iters, res, k_half = carry
            bad = (res > tol) | ~jnp.isfinite(res)
            return bad & (k_half < max_halvings)

        def reject_body(carry):
            h_try, u, iters, res, k_half = carry
            h2 = 0.5 * h_try
            u, iters, res = newton_solve(state, acc_prev, f_old, tau_old,
                                         t, h2, u0)
            return h2, u, iters, res, k_half + 1

        h0 = jnp.asarray(h, state.x.dtype)
        u, iters, res = newton_solve(state, acc_prev, f_old, tau_old, t, h0,
                                     u0)
        h_used, u, iters, res, _ = lax.while_loop(
            reject_cond, reject_body,
            (h0, u, iters, res, jnp.zeros((), jnp.int32)))

        a = u[:n_dof].reshape(n, 6)
        x_new, q_new, v_new, w_new = new_pose(state, acc_prev,
                                              a[:, 0:3], a[:, 3:6], h_used)
        return HHTStepOut(
            state=BodyState(x=x_new, q=q_new, v=v_new, w=w_new),
            acc=a, h_used=h_used, iterations=iters, residual=res)

    return step


def make_newmark_mbs_step(model: Model, beta: float = 0.25,
                          gamma: float = 0.5, **kw):
    """Newmark-β implicit stepper (reference: ChTimestepperNewmark,
    /root/reference/src/chrono/timestepper/ChTimestepperImplicit.cpp).
    Defaults to the unconditionally-stable average-acceleration rule."""
    return make_hht_mbs_step(model, alpha=0.0, beta=beta, gamma=gamma, **kw)


def make_trapezoidal_mbs_step(model: Model, **kw):
    """Implicit trapezoidal rule (reference: ChTimestepperTrapezoidal role) —
    the γ=1/2, β=1/4 member of the Newmark family (second order,
    non-dissipative)."""
    return make_hht_mbs_step(model, alpha=0.0, beta=0.25, gamma=0.5, **kw)


def make_euler_implicit_mbs_step(model: Model, **kw):
    """Fully-implicit (backward) Euler with Newton (reference:
    ChTimestepperEulerImplicit): γ=1, β=1/2 — first order, maximally
    dissipative; the nonlinear sibling of the linearized DVI stepper."""
    return make_hht_mbs_step(model, alpha=0.0, beta=0.5, gamma=1.0, **kw)


class ProjectedStepOut(NamedTuple):
    state: BodyState
    c_inf: Array        # max |C| after projection
    info: object        # StepInfo from the velocity solve


def make_euler_implicit_projected_step(model: Model, settings=None,
                                       n_proj: int = 2):
    """Euler-implicit-projected stepper (reference:
    ChTimestepperEulerImplicitProjected, timestepper/ChTimestepper.h:34-49).

    Instead of Baumgarte blending, the velocity solve runs UNstabilized and
    the end-of-step poses are projected back onto the constraint manifold
    C(q)=0 (``n_proj`` Gauss–Newton iterations of N·λ = −C with the dense MXU
    Schur solve), followed by one velocity projection onto J·u = 0.  Holonomic
    drift is removed to solver precision each step — the property the
    reference buys with this stepper for long-horizon runs.
    """
    from chrono_tpu.physics.system import (
        SolverSettings, step_euler_implicit_linearized,
    )
    from chrono_tpu.physics.joints import joint_rows
    from chrono_tpu.physics.constraints import concat_rows
    from chrono_tpu.physics.body import integrate_positions
    from chrono_tpu.solver.direct import solve_dense_schur
    from chrono_tpu.solver import descriptor as desc

    if settings is None:
        settings = SolverSettings(solver="direct")
    nobau = settings.replace(stab_factor=0.0)
    n = model.n_bodies
    minv6 = jnp.stack(
        [jnp.broadcast_to(model.props.inv_mass[:, None], (n, 3)),
         model.props.inv_inertia], axis=1).reshape(n * 6)

    def _rows(st, stab):
        parts = [joint_rows(k, d, st.x, st.q, 1.0, stab)
                 for k, d in model.joints.items()]
        return concat_rows(parts) if parts else None

    def _delta_u(rows, gam):
        D = desc.dense_D(rows, n)                       # (m, 6N)
        du = (D.T @ gam) * minv6
        du = du.reshape(n, 6)
        return du[:, 0:3], du[:, 3:6]

    def step(state: BodyState, t, h) -> ProjectedStepOut:
        st, info = step_euler_implicit_linearized(model, state, t, h, nobau)
        zv = jnp.zeros_like(st.v)
        zw = jnp.zeros_like(st.w)
        rows0 = _rows(st, 1.0)
        if rows0 is None:
            return ProjectedStepOut(st, jnp.zeros((), st.x.dtype), info)
        for _ in range(n_proj):
            rows = _rows(st, 1.0)          # rhs = −C at current pose
            gam = solve_dense_schur(rows, model.props, zv, zw)
            dv, dw = _delta_u(rows, gam)
            moved = integrate_positions(st.replace(v=dv, w=dw), 1.0)
            st = moved.replace(v=st.v, w=st.w)
        # velocity projection: solve N γ = −D u at the projected pose
        rows_v = _rows(st, 0.0)            # rhs = 0
        gam_v = solve_dense_schur(rows_v, model.props, st.v, st.w)
        dv, dw = _delta_u(rows_v, gam_v)
        st = st.replace(v=st.v + dv, w=st.w + dw)
        c_inf = jnp.max(jnp.abs(_constraint_C(model, st.x, st.q)))
        return ProjectedStepOut(st, c_inf, info)

    return step
