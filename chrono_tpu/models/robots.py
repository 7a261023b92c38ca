"""Small robot models: quadcopter and differential-drive robot.

Role of the reference's remaining robot model families
(/root/reference/src/chrono_models/robot/copters/Copter.h — n-prop copter
with per-prop thrust/torque coefficients — and robot/turtlebot/Turtlebot.h
— a two-wheel differential-drive robot with passive casters), assembled on
the multibody core.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core.functions import FConst
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.physics.system import Model, step_euler_implicit_linearized


# ---------------------------------------------------------------------------
# quadcopter
# ---------------------------------------------------------------------------


@pytree_dataclass
class Copter:
    model: Model
    arm: jnp.ndarray            # rotor arm length
    c_thrust: jnp.ndarray       # thrust per ω² [N s²]
    c_torque: jnp.ndarray       # yaw drag torque per ω² [N m s²]
    spin_dirs: jnp.ndarray      # (4,) ±1 rotor handedness
    body: int = static_field(default=0)


def create_copter(mass=1.2, arm=0.18, inertia=(0.012, 0.012, 0.022),
                  c_thrust=1.2e-5, c_torque=2.5e-7, pos=(0, 0, 1.0)):
    """Quad-X copter (reference Copter<4> role): one 6-DOF body; the four
    rotors are force generators, not articulated bodies (their gyroscopics
    are negligible at model scale — same simplification the reference's
    ChCopter uses for dynamics)."""
    b = SystemBuilder()
    b.set_gravity((0, 0, -9.81))
    body = b.add_body(mass=mass, inertia=inertia, pos=pos, name="copter")
    model, state = b.finalize()
    dirs = jnp.asarray([1.0, -1.0, 1.0, -1.0])
    return Copter(model=model, arm=jnp.asarray(arm),
                  c_thrust=jnp.asarray(c_thrust),
                  c_torque=jnp.asarray(c_torque),
                  spin_dirs=dirs, body=body), state


#: rotor positions in the body frame (X configuration), unit arm
_ROTORS = np.asarray([[1, 1, 0], [1, -1, 0], [-1, -1, 0], [-1, 1, 0]],
                     float) / np.sqrt(2.0)


def copter_forces(copter: Copter, state, rotor_omega):
    """World force / body torque from rotor speeds (4,) [rad/s]."""
    q = state.q[copter.body]
    thrust = copter.c_thrust * rotor_omega ** 2            # (4,)
    up_body = jnp.asarray([0.0, 0.0, 1.0])
    f_body = jnp.asarray([0.0, 0.0, 1.0]) * jnp.sum(thrust)
    f_world = Q.qrotate(q, f_body)
    r = jnp.asarray(_ROTORS) * copter.arm                  # (4,3)
    tau = jnp.sum(jnp.cross(r, up_body[None, :] * thrust[:, None]), axis=0)
    tau = tau + up_body * jnp.sum(
        copter.spin_dirs * copter.c_torque * rotor_omega ** 2)
    return f_world, tau                                    # tau body-local


def copter_step(copter: Copter, state, rotor_omega, t, h,
                settings=SolverSettings(solver="direct")):
    f_w, tau_b = copter_forces(copter, state, jnp.asarray(rotor_omega))
    n = copter.model.n_bodies
    f_ext = jnp.zeros((n, 3)).at[copter.body].add(f_w)
    tau_ext = jnp.zeros((n, 3)).at[copter.body].add(tau_b)
    return step_euler_implicit_linearized(copter.model, state, t, h,
                                          settings, f_ext=f_ext,
                                          tau_ext=tau_ext)


def copter_hover_omega(copter: Copter, mass=None):
    """Rotor speed that exactly balances gravity (all four equal)."""
    m = 1.0 / copter.model.props.inv_mass[copter.body] if mass is None \
        else mass
    return jnp.sqrt(m * 9.81 / (4.0 * copter.c_thrust))


# ---------------------------------------------------------------------------
# turtlebot (differential drive)
# ---------------------------------------------------------------------------


@pytree_dataclass
class Turtlebot:
    model: Model
    wheel_radius: jnp.ndarray
    track: jnp.ndarray
    chassis: int = static_field(default=0)
    wheels: tuple = static_field(default=())


def create_turtlebot(mass=2.8, wheel_radius=0.035, track=0.23,
                     clearance=0.02):
    """Two driven wheels + front/rear caster contacts (reference Turtlebot
    role).  Casters are modeled as vertical support forces in the step
    function (they are passive ball rollers)."""
    b = SystemBuilder()
    b.set_gravity((0, 0, -9.81))
    z0 = wheel_radius
    chassis = b.add_body(mass=mass, inertia=(0.02, 0.02, 0.03),
                         pos=(0, 0, z0 + clearance), name="chassis")
    wheels = []
    for side, sy in (("L", track / 2), ("R", -track / 2)):
        w = b.add_body(mass=0.15, inertia=(1e-4, 2e-4, 1e-4),
                       pos=(0.0, sy, z0), name=f"wheel_{side}")
        b.add_motor_rotation_speed(chassis, w, world_pos=(0.0, sy, z0),
                                   world_axis=(0, 1, 0),
                                   profile=FConst(c=jnp.asarray(0.0)))
        wheels.append(w)
    model, state = b.finalize()
    return Turtlebot(model=model, wheel_radius=jnp.asarray(wheel_radius),
                     track=jnp.asarray(track), chassis=chassis,
                     wheels=tuple(wheels)), state


def set_turtlebot_speeds(bot: Turtlebot, left, right) -> Turtlebot:
    md = bot.model.motors["rot_speed"]
    new = md.replace(profile=md.profile.replace(
        c=jnp.asarray([left, right], md.fa_pos.dtype)))
    motors = dict(bot.model.motors)
    motors["rot_speed"] = new
    return bot.replace(model=bot.model.replace(motors=motors))


def turtlebot_step(bot: Turtlebot, state, t, h, mu=0.7,
                   settings=SolverSettings(solver="direct")):
    """Flat-ground step: wheel contact = vertical spring-damper support +
    regularized-Coulomb longitudinal traction at each wheel; casters =
    frictionless supports fore/aft of the chassis."""
    n = bot.model.n_bodies
    r = bot.wheel_radius
    k, c = 8000.0, 120.0
    f_ext = jnp.zeros((n, 3))
    tau_ext = jnp.zeros((n, 3))
    for w in bot.wheels:
        pen = r - state.x[w, 2]
        fn = jnp.maximum(k * pen - c * state.v[w, 2], 0.0)
        # contact-point slip: v + ω×(−r ẑ) (ω body-local ≈ world here)
        w_world = Q.qrotate(state.q[w], state.w[w])
        vslip = state.v[w, :2] + jnp.cross(w_world, jnp.asarray(
            [0.0, 0.0, -r]))[:2]
        ft = -mu * fn * vslip / (jnp.linalg.norm(vslip) + 0.05)
        f = jnp.concatenate([ft, fn[None]])
        f_ext = f_ext.at[w].add(f)
        # traction reaction torque about the wheel axle (body-local y)
        tau_ext = tau_ext.at[w, 1].add(-ft[0] * r)
    # casters fore/aft (frictionless vertical support at chassis height)
    for dx in (0.10, -0.10):
        p = state.x[bot.chassis] + Q.qrotate(state.q[bot.chassis],
                                             jnp.asarray([dx, 0.0, -0.055]))
        pen = -p[2]
        fn = jnp.maximum(k * pen, 0.0)
        f_ext = f_ext.at[bot.chassis, 2].add(fn)
    return step_euler_implicit_linearized(bot.model, state, t, h, settings,
                                          f_ext=f_ext, tau_ext=tau_ext)
