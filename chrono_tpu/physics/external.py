"""User ODE blocks coupled to the MBS + hydraulic actuators.

Counterparts of the reference's ChExternalDynamicsODE
(/root/reference/src/chrono/physics/ChExternalDynamicsODE.h — user-defined
first-order state integrated alongside the system) and ChHydraulicActuator /
ChHydraulicCircuit (physics/ChHydraulicActuator.h — two-chamber cylinder with
valve flow dynamics driving a translational force between two bodies).

TPU design: an ODE block is just ``(y0, rhs)`` where
``rhs(t, y, body_state) -> (dy, f_ext (N,3), tau_ext (N,3))`` — a pure
function; ``make_ode_coupled_step`` fuses the block's explicit update with
the DVI body step into one program.  Several blocks compose by stacking.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.system import (
    Model, SolverSettings, step_euler_implicit_linearized,
)


def make_ode_coupled_step(model: Model, rhs: Callable, h: float,
                          settings: SolverSettings = SolverSettings(
                              solver="direct")):
    """``step(state, y, t) -> (state', y', info)``: explicit midpoint update
    of the user ODE interleaved with one MBS step (the reference couples the
    block through the same system solve; at MBS step sizes the explicit
    treatment of the block is the reference's default as well)."""

    def step(state, y, t):
        dy1, f1, tau1 = rhs(t, y, state)
        y_mid = y + 0.5 * h * dy1
        dy2, f2, tau2 = rhs(t + 0.5 * h, y_mid, state)
        new_state, info = step_euler_implicit_linearized(
            model, state, t, h, settings, f_ext=f2, tau_ext=tau2)
        return new_state, y + h * dy2, info

    return step


# ---------------------------------------------------------------------------
# hydraulic actuator (two-chamber cylinder + proportional valve)
# ---------------------------------------------------------------------------

@pytree_dataclass
class HydraulicParams:
    """Cylinder + valve constants (ChHydraulicActuator's essential set)."""

    area_head: Array = 1e-3        # piston head area [m²]
    area_rod: Array = 6e-4         # rod-side annulus area [m²]
    bulk_modulus: Array = 1.2e9    # oil stiffness [Pa]
    vol_head0: Array = 4e-4        # dead volume, head side [m³]
    vol_rod0: Array = 4e-4
    p_pump: Array = 10e6           # supply pressure [Pa]
    p_tank: Array = 1e5
    q_nominal: Array = 2e-4        # valve flow at full opening, Δp_nom [m³/s]
    dp_nominal: Array = 3.5e6
    stroke0: Array = 0.5           # length at which chambers split evenly
    visc_friction: Array = 5e3     # seal/rod viscous friction [N·s/m]


def make_hydraulic_actuator(model: Model, body_a: int, body_b: int,
                            pa_loc, pb_loc, hp: HydraulicParams,
                            valve_fn: Callable):
    """Hydraulic cylinder between anchor points on two bodies.

    ``valve_fn(t) -> u ∈ [−1, 1]`` commands the proportional valve
    (+u: pump→head / rod→tank, extends; −u retracts).
    Returns ``(y0, rhs)`` for :func:`make_ode_coupled_step`;
    y = (p_head, p_rod).
    """
    pa_loc = jnp.asarray(pa_loc)
    pb_loc = jnp.asarray(pb_loc)

    def geometry(state):
        xa = state.x[body_a] + Q.qrotate(state.q[body_a], pa_loc)
        xb = state.x[body_b] + Q.qrotate(state.q[body_b], pb_loc)
        d = xb - xa
        L = jnp.sqrt(jnp.sum(d * d) + 1e-12)
        axis = d / L
        va = state.v[body_a] + jnp.cross(
            Q.qrotate(state.q[body_a], state.w[body_a]),
            Q.qrotate(state.q[body_a], pa_loc))
        vb = state.v[body_b] + jnp.cross(
            Q.qrotate(state.q[body_b], state.w[body_b]),
            Q.qrotate(state.q[body_b], pb_loc))
        Ldot = jnp.dot(vb - va, axis)
        return xa, xb, axis, L, Ldot

    def valve_flow(u, p_from, p_to):
        """Turbulent orifice: Q = u·Qn·sign(Δp)·√(|Δp|/Δp_n)."""
        dp = p_from - p_to
        return (u * hp.q_nominal
                * jnp.sign(dp) * jnp.sqrt(jnp.abs(dp) / hp.dp_nominal))

    def rhs(t, y, state):
        p1, p2 = y[0], y[1]
        xa, xb, axis, L, Ldot = geometry(state)
        s = L - hp.stroke0                      # piston displacement
        V1 = hp.vol_head0 + hp.area_head * s
        V2 = hp.vol_rod0 - hp.area_rod * s
        V1 = jnp.maximum(V1, 0.1 * hp.vol_head0)
        V2 = jnp.maximum(V2, 0.1 * hp.vol_rod0)

        u = jnp.clip(valve_fn(t), -1.0, 1.0)
        up = jnp.maximum(u, 0.0)
        um = jnp.maximum(-u, 0.0)
        q1 = valve_flow(up, hp.p_pump, p1) - valve_flow(um, p1, hp.p_tank)
        q2 = valve_flow(um, hp.p_pump, p2) - valve_flow(up, p2, hp.p_tank)

        dp1 = hp.bulk_modulus / V1 * (q1 - hp.area_head * Ldot)
        dp2 = hp.bulk_modulus / V2 * (q2 + hp.area_rod * Ldot)

        # piston force + seal viscous friction (damps the trapped-oil mode)
        F = p1 * hp.area_head - p2 * hp.area_rod - hp.visc_friction * Ldot
        f = jnp.zeros((model.n_bodies, 3), y.dtype)
        f = f.at[body_b].add(F * axis).at[body_a].add(-F * axis)
        tau = jnp.zeros((model.n_bodies, 3), y.dtype)
        # torque about each body's COM from the anchor offset (body-local)
        ra = xa - state.x[body_a]
        rb = xb - state.x[body_b]
        tau = tau.at[body_a].add(
            Q.qrotate_inv(state.q[body_a], jnp.cross(ra, -F * axis)))
        tau = tau.at[body_b].add(
            Q.qrotate_inv(state.q[body_b], jnp.cross(rb, F * axis)))
        return jnp.stack([dp1, dp2]), f, tau

    y0 = jnp.asarray([float(hp.p_tank), float(hp.p_tank)])
    return y0, rhs
