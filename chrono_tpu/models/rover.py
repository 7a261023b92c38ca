"""Planetary-rover model (Viper/Curiosity-class capability).

Counterpart of the reference's rover models
(/root/reference/src/chrono_models/robot/viper, curiosity): a 4-wheel
skid/explicit-steer rover with per-wheel drive motors, assembled on the
multibody core — intended for granular/SCM terrain studies like the
reference's lunar-rover simulations.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core.functions import FConst
from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.physics.system import Model, step_euler_implicit_linearized
from chrono_tpu.core import quaternion as Q


@pytree_dataclass
class Rover:
    model: Model
    wheel_radius: jnp.ndarray
    wheel_width: jnp.ndarray
    chassis: int = static_field(default=0)
    wheels: tuple = static_field(default=())


def create_rover(body_mass=440.0, wheel_mass=12.0, wheel_radius=0.25,
                 wheel_width=0.2, wheelbase=1.6, track=1.2,
                 clearance=0.35, gravity=(0, 0, -9.81)):
    """A Viper-scale 4-wheel rover; each wheel gets a speed motor."""
    b = SystemBuilder()
    b.set_gravity(gravity)
    chassis = b.add_body(
        mass=body_mass, inertia=(60.0, 100.0, 120.0),
        pos=(0, 0, clearance + wheel_radius), name="chassis")
    a, s = wheelbase / 2, track / 2
    wheels = []
    for (cx, cy, name) in [(a, s, "FL"), (a, -s, "FR"),
                           (-a, s, "RL"), (-a, -s, "RR")]:
        # suspension upright with travel + spring
        up = b.add_body(mass=6.0, inertia=(0.3, 0.3, 0.3),
                        pos=(cx, cy, wheel_radius), name=f"up_{name}")
        b.add_joint("prismatic", chassis, up, world_pos=(cx, cy, wheel_radius),
                    world_axis=(0, 0, 1))
        load = (body_mass / 4 + 6 + wheel_mass) * abs(gravity[2])
        b.add_tsda(chassis, up,
                   pa_world=(cx, cy, clearance + wheel_radius),
                   pb_world=(cx, cy, wheel_radius),
                   k=25000.0, c=2500.0,
                   rest_length=clearance + load / 25000.0)
        w = b.add_body(mass=wheel_mass,
                       inertia=(0.3, 0.5, 0.3),
                       pos=(cx, cy, wheel_radius), name=f"wheel_{name}")
        b.add_motor_rotation_speed(up, w, world_pos=(cx, cy, wheel_radius),
                                   world_axis=(0, 1, 0),
                                   profile=FConst(c=jnp.asarray(0.0)))
        wheels.append(w)
    model, state = b.finalize()
    rover = Rover(model=model, wheel_radius=jnp.asarray(wheel_radius),
                  wheel_width=jnp.asarray(wheel_width),
                  chassis=chassis, wheels=tuple(wheels))
    return rover, state


def set_wheel_speeds(rover: Rover, speeds) -> Rover:
    """Command per-wheel angular speeds (skid steering: differential
    left/right speeds)."""
    md = rover.model.motors["rot_speed"]
    new = md.replace(profile=md.profile.replace(
        c=jnp.asarray(speeds, md.fa_pos.dtype)))
    motors = dict(rover.model.motors)
    motors["rot_speed"] = new
    return rover.replace(model=rover.model.replace(motors=motors))


def rover_step_scm(rover: Rover, state, scm_params, scm_state, t, h,
                   settings=SolverSettings(solver="direct")):
    """One rover step on SCM deformable terrain (the reference's
    Viper-on-SCM configuration)."""
    from chrono_tpu.vehicle.terrain import scm_wheel_forces

    w_idx = jnp.asarray(rover.wheels, jnp.int32)
    out = scm_wheel_forces(
        scm_params, scm_state,
        state.x[w_idx], state.q[w_idx], state.v[w_idx], state.w[w_idx],
        wheel_radius=rover.wheel_radius, wheel_width=rover.wheel_width)
    n = rover.model.n_bodies
    f_ext = jnp.zeros((n, 3), state.x.dtype).at[w_idx].add(out.force)
    tau_ext = jnp.zeros((n, 3), state.x.dtype).at[w_idx].add(
        out.torque_spin[:, None] * jnp.asarray([0.0, 1.0, 0.0]))
    new_state, info = step_euler_implicit_linearized(
        rover.model, state, t, h, settings, f_ext=f_ext, tau_ext=tau_ext)
    return new_state, out.new_state, info
