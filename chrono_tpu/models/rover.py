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


def create_curiosity(body_mass=500.0, wheel_mass=10.0, wheel_radius=0.25,
                     wheel_width=0.25, track=2.2, clearance=0.6,
                     gravity=(0, 0, -9.81)):
    """Curiosity-class 6-wheel rocker-bogie rover
    (/root/reference/src/chrono_models/robot/curiosity/Curiosity.h role).

    Kinematics: per side, a ROCKER pivots on the chassis (revolute about y)
    and carries the front wheel plus a BOGIE (revolute about y) that carries
    the middle and rear wheels.  The left/right rockers are tied through the
    body-mounted differential — here the reference's own shafts idiom
    (ChShaftsBody + ChShaftsPlanetary): one shaft per rocker about the pivot
    axis, chassis shaft as carrier, Willis ratio ψ=1 ⇒
    2·ω_chassis = ω_L + ω_R, i.e. the rockers counter-rotate relative to
    the chassis so the body pitch averages the terrain."""
    b = SystemBuilder()
    b.set_gravity(gravity)
    r = wheel_radius
    s = track / 2
    zc = clearance + r                   # chassis center height
    chassis = b.add_body(mass=body_mass, inertia=(250.0, 350.0, 400.0),
                         pos=(0, 0, zc), name="chassis")
    # wheel x-stations (front, mid, rear) and pivot points
    xf, xm, xr = 1.1, 0.0, -1.1
    x_rocker_piv, z_piv = 0.45, zc - 0.15      # rocker↔chassis
    x_bogie_piv, z_bpiv = -0.5, r + 0.5 * (z_piv - r)   # bogie↔rocker

    wheels, rockers = [], []
    for side, sy in (("L", s), ("R", -s)):
        rocker = b.add_body(mass=25.0, inertia=(2.0, 8.0, 8.0),
                            pos=(x_rocker_piv, sy, z_piv),
                            name=f"rocker_{side}")
        b.add_joint("revolute", chassis, rocker,
                    world_pos=(x_rocker_piv, sy, z_piv), world_axis=(0, 1, 0))
        bogie = b.add_body(mass=15.0, inertia=(1.0, 4.0, 4.0),
                           pos=(x_bogie_piv, sy, z_bpiv),
                           name=f"bogie_{side}")
        b.add_joint("revolute", rocker, bogie,
                    world_pos=(x_bogie_piv, sy, z_bpiv), world_axis=(0, 1, 0))
        for (carrier, wx, name) in ((rocker, xf, f"F{side}"),
                                    (bogie, xm, f"M{side}"),
                                    (bogie, xr, f"R{side}")):
            w = b.add_body(mass=wheel_mass, inertia=(0.3, 0.5, 0.3),
                           pos=(wx, sy, r), name=f"wheel_{name}")
            b.add_motor_rotation_speed(carrier, w, world_pos=(wx, sy, r),
                                       world_axis=(0, 1, 0),
                                       profile=FConst(c=jnp.asarray(0.0)))
            wheels.append(w)
        rockers.append(rocker)

    # differential: shafts bound to chassis/rockers about local y
    sh_c = b.add_shaft(inertia=0.5)
    sh_l = b.add_shaft(inertia=0.5)
    sh_r = b.add_shaft(inertia=0.5)
    b.add_shaft_body(sh_c, chassis, axis_local=(0, 1, 0))
    b.add_shaft_body(sh_l, rockers[0], axis_local=(0, 1, 0))
    b.add_shaft_body(sh_r, rockers[1], axis_local=(0, 1, 0))
    b.add_shaft_planetary(sh_c, sh_l, sh_r, ratio=1.0)

    model, state = b.finalize()
    rover = Rover(model=model, wheel_radius=jnp.asarray(wheel_radius),
                  wheel_width=jnp.asarray(wheel_width),
                  chassis=chassis, wheels=tuple(wheels))
    return rover, state
