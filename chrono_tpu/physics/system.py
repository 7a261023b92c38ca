"""The multibody system model and its time steppers.

TPU-native counterpart of the reference's ``ChSystem`` + timestepper + solver
orchestration (/root/reference/src/chrono/physics/ChSystem.cpp:1581 AdvanceDynamics,
timestepper/ChTimestepperImplicit.cpp:468 Euler-implicit-linearized): instead of an
object graph traversed per step, the scene is a ``Model`` pytree of batched arrays
and the whole step — force accumulation, constraint lowering (autodiff), contact
detection, VI solve, state integration — is ONE jitted function suitable for
``lax.scan`` over thousands of steps without leaving the device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.body import (
    BodyProps, BodyState, gyroscopic_torque, integrate_positions,
)
from chrono_tpu.physics.constraints import ConstraintRows, concat_rows
from chrono_tpu.physics.joints import JointData, joint_rows
from chrono_tpu.physics.motors import MotorData, motor_rows, motor_loads
from chrono_tpu.physics import force_elements as fe
from chrono_tpu.solver import descriptor as desc
from chrono_tpu.solver.direct import solve_dense_schur
from chrono_tpu.solver import vi as vi_solvers
from chrono_tpu.solver.projection import make_projector


@pytree_dataclass
class SolverSettings:
    """Static solver configuration (hashable; changing it recompiles the step)."""

    solver: str = static_field(default="apgd")       # apgd | bb | pjacobi | direct
    max_iter: int = static_field(default=100)
    tol: float = static_field(default=1e-6)
    stab_factor: float = static_field(default=1.0)   # Baumgarte C/h scaling
    # soft-threshold on joint violations before stabilization: set to the
    # fp32 position-roundoff floor (~1e-6 · pose scale) for long fp32 runs
    stab_deadband: float = static_field(default=0.0)
    # "baumgarte": rhs += -stab·C/h (velocity-level, the reference default).
    # "project": rhs stab term dropped; positions projected back onto the
    # constraint manifold AFTER each step (M⁻¹-weighted least squares).  At
    # fp32 this avoids Baumgarte's eps32·|x|·stab/h velocity-jitter
    # injection — but the position teleport adds potential energy with no
    # kinetic bookkeeping (measured O(h²·t) energy drift), so prefer:
    # "filtered": Baumgarte on a bias-corrected EMA of C (carried across
    # steps via ``stab_state``).  The true violation signal is smooth in
    # time; the eps32·|x| evaluation noise is white — the running mean
    # passes the signal and divides the noise by √k (and its STEP-TO-STEP
    # difference, which is what pollutes Dv/h accelerations, by k).
    # Corrections stay velocity-level, so energy bookkeeping matches the
    # reference's Baumgarte semantics exactly.
    stab_mode: str = static_field(default="baumgarte")
    # "filtered" steady-state EMA gain (reached once 1/k < alpha_min);
    # lag·drift must stay under the constraint tolerance
    stab_alpha_min: float = static_field(default=1.0 / 2048.0)
    # contact −C/h clamp — the reference's default Qc_clamping
    # (ChSystem.cpp:59 max_penetration_recovery_speed = 0.6)
    max_recovery_speed: float = static_field(default=0.6)
    # per-movable-body row-valence bound of the Dᵀγ incidence gather (shape
    # of the plan table: N·valence_bound·8 elements gathered PER ITERATION —
    # size it to the scene; overflow falls back to the scatter form)
    valence_bound: int = static_field(default=96)


@pytree_dataclass
class Model:
    """Immutable scene description: bodies + joints + motors + force elements.

    Collision/contact configuration is attached separately (see
    chrono_tpu.collision.pipeline.ContactConfig) to keep the smooth-MBS core
    independent of the contact backend.
    """

    props: BodyProps
    gravity: Array                      # (3,)
    joints: dict                        # {kind: JointData}
    motors: dict                        # {kind: MotorData} constraint motors
    load_motors: dict                   # {kind: MotorData} torque/force motors
    tsda: Optional[fe.TSDAData]
    rsda: Optional[fe.RSDAData]
    shaft_constraints: dict = None      # {kind: Shaft*Data} (physics.shafts)
    shaft_elements: object = None       # ShaftTorqueElements
    couplers: dict = None               # {kind: JointData} velocity-level rows
    bushings: object = None             # fe.BushingData compliant mounts

    @property
    def n_bodies(self) -> int:
        return self.props.inv_mass.shape[0]


class StepInfo(NamedTuple):
    """Per-step diagnostics (the reference's solver stats / ChTimer analogues)."""

    iterations: Array
    residual: Array
    joint_reactions: Array   # (M,) constraint impulses / h = forces
    n_rows: int


def applied_forces(model: Model, state: BodyState, t, f_ext=None, tau_ext=None):
    """Accumulate all smooth forces → (f_world (N,3), tau_local (N,3)).

    Includes gravity, gyroscopic torque, spring-dampers, motor loads and
    optional user external loads (the reference's accumulators
    ChBody::AccumulateForce/Torque).
    """
    n = model.n_bodies
    inv_m = model.props.inv_mass
    mass = jnp.where(inv_m > 0, 1.0 / jnp.maximum(inv_m, 1e-30), 0.0)
    f = mass[:, None] * model.gravity[None, :]
    tau = gyroscopic_torque(model.props, state)
    if f_ext is not None:
        f = f + f_ext
    if tau_ext is not None:
        tau = tau + tau_ext
    if model.tsda is not None:
        f, tau = fe.accumulate_tsda(model.tsda, state, f, tau)
    if model.rsda is not None:
        f, tau = fe.accumulate_rsda(model.rsda, state, f, tau)
    if model.bushings is not None:
        f, tau = fe.accumulate_bushing(model.bushings, state, f, tau)
    for kind, data in model.load_motors.items():
        fa, ta, fb, tb = motor_loads(kind, data, state.x, state.q, t)
        f = f.at[data.body_a].add(fa).at[data.body_b].add(fb)
        tau = (
            tau
            .at[data.body_a].add(Q.qrotate_inv(state.q[data.body_a], ta))
            .at[data.body_b].add(Q.qrotate_inv(state.q[data.body_b], tb))
        )
    if model.shaft_elements is not None:
        from chrono_tpu.physics.shafts import shaft_torques
        tau = tau + shaft_torques(model.shaft_elements, state.q, state.w, n)
    return f, tau


def bilateral_rows(model: Model, state: BodyState, t, h,
                   settings: SolverSettings) -> ConstraintRows:
    """Lower all joints and constraint motors to stabilized rows."""
    stab = (0.0 if settings.stab_mode in ("project", "filtered")
            else settings.stab_factor)
    parts = [
        joint_rows(kind, data, state.x, state.q, h, stab,
                   settings.stab_deadband)
        for kind, data in model.joints.items()
    ]
    parts += [
        motor_rows(kind, data, state.x, state.q, t, h, stab)
        for kind, data in model.motors.items()
    ]
    if model.shaft_constraints:
        from chrono_tpu.physics.shafts import SHAFT_ROW_GENERATORS
        parts += [SHAFT_ROW_GENERATORS[kind](data, state.x.dtype)
                  for kind, data in model.shaft_constraints.items()]
    if model.couplers:
        from chrono_tpu.physics.joints import coupler_rows
        parts += [coupler_rows(kind, data, state.x, state.q)
                  for kind, data in model.couplers.items()]
    return concat_rows(parts)


def bilateral_C(model: Model, state: BodyState, t, m_total: int) -> Array:
    """Position-level violation vector aligned with ``bilateral_rows`` order.

    joints → C; angle/pos motors → tracking error; speed motors, shafts and
    couplers (velocity-level rows, no position gap) → 0, padded at the tail
    to ``m_total``.
    """
    parts = [joint_rows(kind, data, state.x, state.q, 1.0, 1.0)
             for kind, data in model.joints.items()]
    parts += [
        motor_rows(kind, data, state.x, state.q, t, 1.0, 1.0, vel_scale=0.0)
        for kind, data in model.motors.items()
    ]
    rows = concat_rows(parts)
    C = -rows.rhs if rows.m else jnp.zeros((0,), state.x.dtype)
    return jnp.pad(C, (0, m_total - C.shape[0]))


def init_stab_state(model: Model, state: BodyState, t, h,
                    settings: SolverSettings):
    """Zero-initialised carry for ``stab_mode='filtered'``: (C_ema, k)."""
    m = bilateral_rows(model, state, t, h, settings).m
    return jnp.zeros((m,), state.x.dtype), jnp.zeros((), jnp.int32)


def _solve(rows: ConstraintRows, model: Model, v_free, w_free,
           settings: SolverSettings, n_contacts=0, mu=None, gamma0=None,
           n_rolling=0, mu_roll=0.0, mu_spin=0.0):
    """Dispatch to the configured constraint solver."""
    m = rows.m
    if m == 0:
        return jnp.zeros((0,), v_free.dtype), jnp.zeros((), jnp.int32), \
            jnp.zeros((), v_free.dtype)
    if settings.solver == "direct" and n_contacts == 0:
        gamma = solve_dense_schur(rows, model.props, v_free, w_free)
        return gamma, jnp.ones((), jnp.int32), jnp.zeros((), v_free.dtype)

    # only ChShaftsPlanetary-role rows use the third body slot — statically
    # known from the model, so contact-dominated scenes skip a third of the
    # per-iteration row gathers
    has_c = bool(model.shaft_constraints
                 and "planetary" in model.shaft_constraints)
    packed = desc.pack_rows(rows, has_c=has_c)
    minv8 = desc.pack_minv(model.props)
    # Solver-iteration hot path: Dᵀγ through the per-body incidence gather
    # (vector-unit friendly); if any movable body exceeds the valence bound
    # the whole solve falls back to the scatter-add form (correct, slower).
    plan = desc.build_gather_plan(packed, minv8,
                                  max_rows_per_body=settings.valence_bound)

    def Nop(g):
        return jax.lax.cond(
            plan.overflow == 0,
            lambda gg: desc.schur_product_plan(packed, minv8, plan, gg),
            lambda gg: desc.schur_product_packed(packed, minv8, gg),
            g)

    r = desc.schur_rhs_packed(packed, desc.pack_u(v_free, w_free))
    project = make_projector(m - 3 * n_contacts - 3 * n_rolling,
                             n_contacts, mu, n_rolling=n_rolling,
                             mu_roll=mu_roll, mu_spin=mu_spin)
    g0 = jnp.zeros((m,), v_free.dtype) if gamma0 is None else gamma0
    if settings.solver == "apgd":
        sol = vi_solvers.solve_apgd(Nop, r, project, g0,
                                    settings.max_iter, settings.tol)
    elif settings.solver == "bb":
        sol = vi_solvers.solve_bb(Nop, r, project, g0,
                                  settings.max_iter, settings.tol)
    elif settings.solver == "admm":
        sol = vi_solvers.solve_admm(Nop, r, project, g0,
                                    settings.max_iter, settings.tol)
    elif settings.solver == "pjacobi":
        sol = vi_solvers.solve_pjacobi(
            Nop, r, project, g0, desc.diag_N_packed(packed, minv8),
            settings.max_iter, settings.tol)
    elif settings.solver in ("cg", "minres", "gmres"):
        # Krylov LS menu for BILATERAL-ONLY systems (the reference's
        # GMRES/MINRES engines, ChIterativeSolverLS.h:108-124); cone
        # projection needs the VI solvers above
        from chrono_tpu.solver import krylov

        dinv = 1.0 / desc.diag_N_packed(packed, minv8)
        if settings.solver == "cg":
            ls = krylov.solve_cg(Nop, -r, Minv=lambda x: dinv * x,
                                 max_iter=settings.max_iter,
                                 tol=settings.tol)
        elif settings.solver == "minres":
            ls = krylov.solve_minres(Nop, -r, max_iter=settings.max_iter,
                                     tol=settings.tol)
        else:
            ls = krylov.solve_gmres(Nop, -r, tol=settings.tol)
        from chrono_tpu.solver.vi import VISolution

        sol = VISolution(gamma=ls.x, iterations=ls.iterations,
                         residual=ls.residual)
    elif settings.solver == "direct":
        # mixed system requested as direct: fall back to APGD
        sol = vi_solvers.solve_apgd(Nop, r, project, g0,
                                    settings.max_iter, settings.tol)
    else:
        raise ValueError(f"unknown solver {settings.solver!r}")
    return sol.gamma, sol.iterations, sol.residual


def step_euler_implicit_linearized(
    model: Model,
    state: BodyState,
    t,
    h: float,
    settings: SolverSettings = SolverSettings(),
    f_ext=None,
    tau_ext=None,
    extra_rows: Optional[ConstraintRows] = None,
    n_contacts: int = 0,
    contact_mu: Optional[Array] = None,
    gamma_warm: Optional[Array] = None,
    position_comp=None,
    stab_state=None,
    n_rolling: int = 0,
    mu_roll: float = 0.0,
    mu_spin: float = 0.0,
):
    """One DVI step (Anitescu/Tasora one-Newton-iteration implicit Euler).

    Semantics follow the reference's Euler-implicit-linearized timestepper
    (ChTimestepperImplicit.cpp:468-523): forces evaluated at the step start,
    one VI solve for end-of-step velocities with Baumgarte-stabilized
    constraints, then symplectic position update.

    ``extra_rows`` lets the contact pipeline append cone rows (normal/tangential
    triples, LAST in the row order); ``n_contacts``/``contact_mu`` configure the
    cone projector; ``gamma_warm`` warm-starts the VI solver.

    Returns ``(new_state, StepInfo)``.
    """
    f, tau = applied_forces(model, state, t, f_ext, tau_ext)
    v_free = state.v + h * model.props.inv_mass[:, None] * f
    w_free = state.w + h * model.props.inv_inertia * tau

    rows = bilateral_rows(model, state, t, h, settings)
    if settings.stab_mode == "filtered" and stab_state is not None:
        # bias-corrected EMA of the violation: running mean until 1/k hits
        # alpha_min, then exponential with that gain.  THIS step's rhs uses
        # the updated mean (step 1 ≡ plain Baumgarte).
        C_ema, k = stab_state
        k = k + 1
        alpha = jnp.maximum(1.0 / k.astype(C_ema.dtype),
                            settings.stab_alpha_min)
        C_now = bilateral_C(model, state, t, rows.m)
        C_ema = C_ema + alpha * (C_now - C_ema)
        stab_state = (C_ema, k)
        rows = rows.replace(
            rhs=rows.rhs - (settings.stab_factor / h) * C_ema)
    if extra_rows is not None:
        rows = concat_rows([rows, extra_rows])

    gamma, iters, res = _solve(
        rows, model, v_free, w_free, settings,
        n_contacts=n_contacts, mu=contact_mu, gamma0=gamma_warm,
        n_rolling=n_rolling, mu_roll=mu_roll, mu_spin=mu_spin,
    )
    if rows.m > 0:
        v_new, w_new = desc.velocity_update_packed(
            desc.pack_rows(rows), desc.pack_minv(model.props), gamma,
            desc.pack_u(v_free, w_free))
    else:
        v_new, w_new = v_free, w_free

    info = StepInfo(iterations=iters, residual=res,
                    joint_reactions=gamma / h, n_rows=rows.m)
    if position_comp is not None:
        # Kahan-compensated long-fp32-run variant: carry = (cx, cq)
        from chrono_tpu.physics.body import integrate_positions_compensated
        cx, cq = position_comp
        new_state, cx, cq = integrate_positions_compensated(
            state.replace(v=v_new, w=w_new), h, cx, cq)
        if settings.stab_mode == "project":
            new_state, cx = project_positions(model, new_state, t + h,
                                              comp_x=cx)
        if stab_state is not None:
            return new_state, (cx, cq), stab_state, info
        return new_state, (cx, cq), info
    new_state = integrate_positions(state.replace(v=v_new, w=w_new), h)
    if settings.stab_mode == "project":
        new_state, _ = project_positions(model, new_state, t + h)
    if stab_state is not None:
        return new_state, stab_state, info
    return new_state, info


def project_positions(model: Model, state: BodyState, t, n_iter: int = 1,
                      comp_x=None, C_offset=None):
    """Project positions back onto the constraint manifold (M⁻¹-weighted).

    Solves ``(D M⁻¹ Dᵀ) λ = −(C − C_offset)`` on the position-level rows
    (joints + motor tracking errors) and applies ``Δx = M⁻¹ Dᵀ λ`` to poses.

    Used standalone (``C_offset=None``, mode "project") it keeps violations
    at the solve floor but pumps energy O(h²·t) — the position teleport does
    no kinetic-energy bookkeeping.  Its production role is the RESIDUAL
    projector of mode "filtered": Baumgarte-on-EMA corrects the smooth
    (systematic) violation energy-consistently, and this projects only the
    zero-mean remainder ``C − C_ema`` — the eps32 evaluation noise plus the
    √L random walk the EMA lag would otherwise admit — at position level,
    where it is never amplified by 1/h.  ``C_offset`` must align with this
    function's row order (joints then ALL motors — the ``bilateral_C``
    layout).  ``comp_x``: Kahan carry for x.  Returns (state, comp_x).
    """
    def rows_at(st):
        parts = [joint_rows(kind, data, st.x, st.q, 1.0, 1.0)
                 for kind, data in model.joints.items()]
        parts += [
            motor_rows(kind, data, st.x, st.q, t, 1.0, 1.0, vel_scale=0.0)
            for kind, data in model.motors.items()
        ]
        return concat_rows(parts)

    if rows_at(state).m == 0:
        return state, comp_x
    for _ in range(n_iter):
        rows = rows_at(state)
        if C_offset is not None:
            # rhs = −C + C_ema = −(C − C_ema): project the residual only
            rows = rows.replace(rhs=rows.rhs + C_offset[:rows.m])
        zero_v = jnp.zeros_like(state.v)
        zero_w = jnp.zeros_like(state.w)
        lam = solve_dense_schur(rows, model.props, zero_v, zero_w)
        dv, dw = desc.velocity_update_packed(
            desc.pack_rows(rows), desc.pack_minv(model.props), lam,
            desc.pack_u(zero_v, zero_w))
        if comp_x is None:
            x_new = state.x + dv
        else:
            y = dv - comp_x
            x_new = state.x + y
            comp_x = (x_new - state.x) - y
        proj = integrate_positions(state.replace(x=x_new, v=zero_v, w=dw),
                                   1.0)
        state = state.replace(x=x_new, q=proj.q)
    return state, comp_x


def make_step_fn(model: Model, h: float, settings: SolverSettings = SolverSettings()):
    """Build a jitted ``(state, t) -> (state, info)`` step closure."""

    @jax.jit
    def step(state: BodyState, t):
        return step_euler_implicit_linearized(model, state, t, h, settings)

    return step


def simulate(model: Model, state: BodyState, h: float, n_steps: int,
             settings: SolverSettings = SolverSettings(), t0=0.0,
             save_every: int = 1):
    """Run ``n_steps`` under ``lax.scan``; returns final state + stacked trajectory.

    The whole trajectory loop compiles to one XLA program (the TPU-native
    replacement for the reference's per-step ``DoStepDynamics`` driver loop).

    ``save_every=0`` skips trajectory stacking entirely (returns
    ``(state, None)``) through a jitted, carry-donating path — the
    latency configuration for small-MBS runs where only the final state
    matters (per-step HBM trajectory writes and the post-hoc slice cost
    more than the physics on a 10-body scene).
    """
    if save_every == 0:
        return _simulate_nosave(model, state, h, n_steps, settings,
                                jnp.asarray(t0, state.x.dtype)), None

    final_state, xs, qs = _simulate_traj(
        model, state, h, n_steps, settings,
        jnp.asarray(t0, state.x.dtype))
    return final_state, (xs[::save_every], qs[::save_every])


@partial(jax.jit, static_argnums=(2, 3))
def _simulate_traj(model: Model, state: BodyState, h: float, n_steps: int,
                   settings: SolverSettings, t0):
    # module-level jit: repeat simulate() calls with the same model/shape
    # hit the compile cache instead of re-TRACING the n_steps-scan body in
    # python every call (measured ~8 s of pure tracing per call on the
    # config-#1 bench model — more than the device time of the whole run)
    def body(carry, k):
        state, t = carry
        state, info = step_euler_implicit_linearized(
            model, state, t, h, settings)
        return (state, t + h), (state.x, state.q)

    (final_state, tf), (xs, qs) = jax.lax.scan(
        body, (state, t0), jnp.arange(n_steps))
    return final_state, xs, qs


@partial(jax.jit, static_argnums=(2, 3))
def _simulate_nosave(model: Model, state: BodyState, h: float,
                     n_steps: int, settings: SolverSettings, t0):
    # NOT donated: callers (benches, parameter sweeps) reuse the initial
    # state across calls; donating it invalidates their buffer (observed:
    # "TPU backend error (InvalidArgument)" on the second bench call).
    # The saved copy is one small pytree — donation bought nothing.
    def body(carry, _):
        state, t = carry
        state, _info = step_euler_implicit_linearized(
            model, state, t, h, settings)
        return (state, t + h), None

    (final_state, _), _ = jax.lax.scan(body, (state, t0), None,
                                       length=n_steps)
    return final_state
