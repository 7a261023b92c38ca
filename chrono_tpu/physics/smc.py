"""Penalty (SMC) contact for the core MBS — the ChSystemSMC role.

The reference offers a second rigid-body contact formulation besides DVI:
smooth penalty contact with a menu of normal-force models and adhesion laws
(/root/reference/src/chrono/physics/ChSystemSMC.h:34-49 — ContactForceModel
{Hooke, Hertz, Flores, PlainCoulomb}, AdhesionForceModel {Constant, DMT,
Perko}, TangentialDisplacementModel {None, OneStep, MultiStep}; force
evaluation in physics/ChContactSMC.h).  TPU-native design: contacts come from
the same fixed-capacity grid pipeline as NSC (collision/pipeline.py), all
per-contact force laws are evaluated as one vectorized masked batch, and the
resulting body forces enter the SAME implicit-linearized DAE step as joints —
so SMC scenes keep bilateral constraints, motors and springs for free.

Conventions (match collision/pipeline.py): contact normal points A→B,
``gap < 0`` means penetrating, angular velocities are body-frame.

The reference combines two per-shape materials per contact; chrono_tpu keeps
one scene material (the DEM module does the same), with per-contact friction
(mu) and curvature (r_eff) coming from the pipeline.  MultiStep tangential
history needs slot-stable contact identity across steps and is covered by the
DEM backend's history machinery; here None/OneStep are implemented (OneStep is
the reference default).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core import quaternion as Q

if False:  # typing only — a runtime import would cycle through collision
    from chrono_tpu.collision.pipeline import CollisionModel, Contacts


@pytree_dataclass
class SMCParams:
    """Scene-wide smooth-contact material + model selection.

    Traced leaves → retune without recompile; model choices are static
    (compile-time branches, exactly like the reference's switch).
    """

    youngs: Array = 1e7          # E [Pa]
    poisson: Array = 0.3         # ν
    restitution: Array = 0.5     # e
    adhesion: Array = 0.0        # Constant model: F_adh [N]
    adhesion_mult_dmt: Array = 0.0   # DMT model: F = mult · √R_eff
    adhesion_s_perko: Array = 0.0    # Perko model: F = s · R_eff
    char_vel: Array = 1.0        # characteristic velocity (Hooke/Flores)
    force_model: str = static_field(default="hertz")   # hertz|hooke|flores
    adhesion_model: str = static_field(default="constant")  # constant|dmt|perko
    tangential_model: str = static_field(default="one_step")  # none|one_step


def _effective_moduli(p: SMCParams):
    E, nu = p.youngs, p.poisson
    E_star = E / (2.0 * (1.0 - nu * nu))
    G_star = E / (4.0 * (2.0 - nu) * (1.0 + nu))
    return E_star, G_star


def smc_contact_forces(params: SMCParams, model, state, contacts,
                       h) -> tuple[Array, Array]:
    """Per-body forces/torques from penalty contact.

    Returns ``(f, tau)`` with shapes (N,3); ``tau`` is body-frame (the
    stepper's convention).  Mirrors ChContactSMC::CalculateForce semantics for
    the selected models.
    """
    props = model.props
    a, b = contacts.body_a, contacts.body_b
    n = contacts.normal                                  # A→B
    delta = jnp.maximum(-contacts.gap, 0.0)              # penetration ≥ 0
    act = contacts.active & (contacts.gap < 0.0)
    ok = act.astype(jnp.float32)

    # kinematics at the contact point
    ra = contacts.point - state.x[a]
    rb = contacts.point - state.x[b]
    wa = Q.qrotate(state.q[a], state.w[a])               # world ω
    wb = Q.qrotate(state.q[b], state.w[b])
    v_rel = (state.v[b] + jnp.cross(wb, rb)
             - state.v[a] - jnp.cross(wa, ra))           # of B relative to A
    vn = jnp.sum(v_rel * n, axis=-1)                     # >0 separating
    vt = v_rel - vn[:, None] * n

    m_eff = 1.0 / jnp.maximum(props.inv_mass[a] + props.inv_mass[b], 1e-12)
    r_eff = jnp.maximum(contacts.r_eff, 1e-9)
    E_star, G_star = _effective_moduli(params)
    e = jnp.clip(params.restitution, 1e-3, 1.0 - 1e-6)

    if params.force_model == "hertz":
        # ChContactSMC.h Hertz branch (same relations as the DEM matBased
        # kernel, ChDemSMC.cuh:647-696) with per-contact R_eff, m_eff
        ln_e = jnp.log(e)
        beta = ln_e / jnp.sqrt(ln_e * ln_e + jnp.pi * jnp.pi)
        sqrt_Rd = jnp.sqrt(r_eff * delta + 1e-30)
        Sn = 2.0 * E_star * sqrt_Rd
        St = 8.0 * G_star * sqrt_Rd
        kn = (4.0 / 3.0) * E_star * sqrt_Rd              # × δ → force
        kt = St
        gn = -2.0 * jnp.sqrt(5.0 / 6.0) * beta * jnp.sqrt(Sn * m_eff)
        gt = -2.0 * jnp.sqrt(5.0 / 6.0) * beta * jnp.sqrt(St * m_eff)
        forceN = kn * delta - gn * vn
    elif params.force_model == "hooke":
        # linear spring-dashpot, stiffness from material props at the
        # characteristic velocity (ChContactSMC.h Hooke branch)
        sqrt_R = jnp.sqrt(r_eff)
        kn = (16.0 / 15.0) * sqrt_R * E_star * (
            15.0 * m_eff * params.char_vel**2
            / (16.0 * sqrt_R * E_star)) ** 0.2
        ln_e = jnp.log(e)
        gn = jnp.sqrt(4.0 * m_eff * kn
                      / (1.0 + (jnp.pi / ln_e) ** 2))
        kt, gt = kn, gn
        forceN = kn * delta - gn * vn
    elif params.force_model == "flores":
        # Flores et al. hysteretic-damping model: the dissipation is folded
        # into the stiffness term via the approach speed
        kn = (4.0 / 3.0) * E_star * jnp.sqrt(r_eff)
        cr = e
        forceN = (kn * delta ** 1.5
                  * (1.0 + 8.0 * (1.0 - cr) / (5.0 * cr)
                     * (-vn) / params.char_vel))
        # tangential like Hertz
        sqrt_Rd = jnp.sqrt(r_eff * delta + 1e-30)
        St = 8.0 * G_star * sqrt_Rd
        ln_e = jnp.log(e)
        beta = ln_e / jnp.sqrt(ln_e * ln_e + jnp.pi * jnp.pi)
        kt = St
        gt = -2.0 * jnp.sqrt(5.0 / 6.0) * beta * jnp.sqrt(St * m_eff)
    else:
        raise ValueError(f"unknown SMC force model {params.force_model!r}")

    forceN = jnp.maximum(forceN, 0.0)

    # adhesion menu (ChSystemSMC.h:41-49)
    if params.adhesion_model == "constant":
        forceN = forceN - params.adhesion
    elif params.adhesion_model == "dmt":
        forceN = forceN - params.adhesion_mult_dmt * jnp.sqrt(r_eff)
    elif params.adhesion_model == "perko":
        forceN = forceN - params.adhesion_s_perko * r_eff
    else:
        raise ValueError(f"unknown adhesion model {params.adhesion_model!r}")

    F = forceN[:, None] * n                              # on body B

    if params.tangential_model != "none":
        # OneStep: tangential displacement ≈ vt·h (reference default)
        Ft = -(kt * h + gt)[:, None] * vt
        ft_mag = jnp.linalg.norm(Ft, axis=-1)
        clamp = jnp.minimum(
            1.0, contacts.mu * jnp.maximum(forceN, 0.0)
            / jnp.maximum(ft_mag, 1e-12))
        F = F + clamp[:, None] * Ft

    F = F * ok[:, None]

    N = props.inv_mass.shape[0]
    f = jnp.zeros((N, 3)).at[b].add(F).at[a].add(-F)
    tau_b = Q.qrotate_inv(state.q[b], jnp.cross(rb, F))
    tau_a = Q.qrotate_inv(state.q[a], jnp.cross(ra, -F))
    tau = jnp.zeros((N, 3)).at[b].add(tau_b).at[a].add(tau_a)
    return f, tau


def smc_step(model, coll, state, t, h,
             params: SMCParams = SMCParams(), settings=None,
             f_ext=None, tau_ext=None):
    """One SMC step: detect → penalty forces → implicit-linearized DAE step.

    The ChSystemSMC::DoStepDynamics analogue: contact forces are explicit
    (evaluated at the step start, like the reference's SMC force loads) while
    joints/motors stay in the implicit velocity solve.
    Returns ``(new_state, contacts, StepInfo)``.
    """
    from chrono_tpu.physics.system import (
        SolverSettings, step_euler_implicit_linearized,
    )
    from chrono_tpu.collision.pipeline import detect_contacts

    if settings is None:
        settings = SolverSettings(solver="apgd")
    contacts = detect_contacts(coll, state)
    f_c, tau_c = smc_contact_forces(params, model, state, contacts, h)
    if f_ext is not None:
        f_c = f_c + f_ext
    if tau_ext is not None:
        tau_c = tau_c + tau_ext
    new_state, info = step_euler_implicit_linearized(
        model, state, t, h, settings, f_ext=f_c, tau_ext=tau_c)
    return new_state, contacts, info
