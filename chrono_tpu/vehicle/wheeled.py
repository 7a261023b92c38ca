"""Wheeled-vehicle assembly and its fused simulation step.

Counterpart of the reference's ``ChWheeledVehicle`` + subsystem templates
(/root/reference/src/chrono_vehicle/wheeled_vehicle/ChWheeledVehicle.cpp:50-116
Synchronize/Advance): the vehicle is an ordinary multibody ``Model`` built from
suspension corner templates, and one jitted ``vehicle_step`` fuses
tires → driveline → steering → MBS solve — the reference's Synchronize+Advance
pair collapsed into a single XLA program per step.

Suspension template (per corner): chassis →[prismatic z + TSDA]→ upright
→[steer revolute z + angle motor (front only)]→ knuckle →[revolute y]→ wheel.
This is the reduced kinematic equivalent of the reference's double-wishbone
travel DOF; geometric wishbone templates can be layered on the same builder.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core import quaternion as Q
from chrono_tpu.core.functions import FConst
from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.physics.system import Model, step_euler_implicit_linearized
from chrono_tpu.vehicle.tire import TMeasyParams, tmeasy_forces
from chrono_tpu.vehicle.powertrain import (
    PowertrainParams, driveline_torques, brake_torques, default_engine_map,
)
from chrono_tpu.vehicle.driver import DriverInputs


@pytree_dataclass
class WheeledVehicle:
    """The assembled vehicle: multibody model + vehicle-level parameters."""

    model: Model
    tire: TMeasyParams
    powertrain: PowertrainParams
    max_steer_angle: Array            # rad at full steering input
    max_brake_torque: Array
    ackermann: Array                  # 0 = parallel, 1 = full Ackermann
    wheelbase: Array
    track: Array
    aero_cda: Array                   # ½ρ·Cd·A lumped coefficient
    steer_rack_gain: Array = 0.0      # rack travel per steer rad (wishbone)
    chassis: int = static_field(default=0)
    wheels: tuple = static_field(default=())      # body indices FL, FR, RL, RR
    knuckles: tuple = static_field(default=())    # steered bodies (front)


class VehicleStepOut(NamedTuple):
    state: object
    tire_fz: Array
    engine_speed: Array
    gear: Array


def build_wheeled_vehicle(
    chassis_mass=2000.0,
    chassis_inertia=(900.0, 3000.0, 3200.0),
    wheelbase=3.0,
    track=1.8,
    cg_height=0.9,
    wheel_mass=40.0,
    wheel_radius=0.35,
    wheel_width=0.25,
    wheel_inertia_spin=2.0,
    suspension_k=90000.0,
    suspension_c=9000.0,
    suspension_travel_preload=None,
    tire: TMeasyParams | None = None,
    powertrain: PowertrainParams | None = None,
    max_steer_angle=0.45,
    max_brake_torque=3000.0,
    driven="AWD",
    suspension="reduced",
):
    """Assemble a 4-wheel vehicle at the origin, +x forward.

    ``suspension``: "reduced" (prismatic-travel corner) or "wishbone"
    (geometric double-wishbone corners from chrono_tpu.vehicle.suspension,
    steered through a real rack body + tie rods — camber/caster/Ackermann
    emerge from the linkage geometry like the reference's ChDoubleWishbone
    + ChPitmanArm stack).
    """
    if suspension == "wishbone":
        return _build_wishbone_vehicle(
            chassis_mass, chassis_inertia, wheelbase, track, cg_height,
            wheel_mass, wheel_radius, wheel_width, wheel_inertia_spin,
            tire, powertrain, max_steer_angle, max_brake_torque, driven)
    b = SystemBuilder()
    chassis = b.add_body(mass=chassis_mass, inertia=chassis_inertia,
                         pos=(0, 0, cg_height), name="chassis")
    a, s = wheelbase / 2, track / 2
    corners = [(+a, +s, "FL", True), (+a, -s, "FR", True),
               (-a, +s, "RL", False), (-a, -s, "RR", False)]
    wheels, knuckles = [], []
    z_w = wheel_radius
    m_up = 30.0
    for (cx, cy, name, steered) in corners:
        upright = b.add_body(mass=m_up, inertia=(1.0, 1.0, 1.0),
                             pos=(cx, cy, z_w), name=f"upright_{name}")
        # suspension travel along chassis z + spring-damper
        b.add_joint("prismatic", chassis, upright, world_pos=(cx, cy, z_w),
                    world_axis=(0, 0, 1))
        # spring preloaded to carry the static corner load
        corner_load = (chassis_mass / 4 + m_up +
                       (20.0 if steered else 0.0)) * 9.81
        b.add_tsda(chassis, upright, pa_world=(cx, cy, cg_height),
                   pb_world=(cx, cy, z_w), k=suspension_k, c=suspension_c,
                   rest_length=(cg_height - z_w) + corner_load / suspension_k)
        if steered:
            knuckle = b.add_body(mass=20.0, inertia=(0.5, 0.5, 0.5),
                                 pos=(cx, cy, z_w), name=f"knuckle_{name}")
            b.add_motor_rotation_angle(
                upright, knuckle, world_pos=(cx, cy, z_w),
                world_axis=(0, 0, 1), profile=FConst(c=jnp.asarray(0.0)))
            hub = knuckle
            knuckles.append(knuckle)
        else:
            hub = upright
        wheel = b.add_body(mass=wheel_mass,
                           inertia=(wheel_inertia_spin * 0.55,
                                    wheel_inertia_spin,
                                    wheel_inertia_spin * 0.55),
                           pos=(cx, cy, z_w), name=f"wheel_{name}")
        b.add_joint("revolute", hub, wheel, world_pos=(cx, cy, z_w),
                    world_axis=(0, 1, 0))
        wheels.append(wheel)

    model, state = b.finalize()

    if tire is None:
        tire = TMeasyParams(radius=jnp.asarray(wheel_radius),
                            width=jnp.asarray(wheel_width),
                            Fz0=jnp.asarray(chassis_mass * 9.81 / 4))
    if powertrain is None:
        speeds, torques, losses = default_engine_map()
        driven_mask = {
            "AWD": [1.0, 1.0, 1.0, 1.0],
            "RWD": [0.0, 0.0, 1.0, 1.0],
            "FWD": [1.0, 1.0, 0.0, 0.0],
        }[driven]
        powertrain = PowertrainParams(
            map_speed=speeds, map_torque=torques, map_losses=losses,
            max_speed=jnp.asarray(650.0),
            gear_ratios=jnp.asarray([3.5, 2.2, 1.5, 1.0, 0.75]),
            shift_speeds=jnp.asarray([5.0, 10.0, 16.0, 23.0]),
            final_drive=jnp.asarray(3.7),
            driven_wheels=jnp.asarray(driven_mask),
        )

    vehicle = WheeledVehicle(
        model=model, tire=tire, powertrain=powertrain,
        max_steer_angle=jnp.asarray(max_steer_angle),
        max_brake_torque=jnp.asarray(max_brake_torque),
        ackermann=jnp.asarray(1.0),
        wheelbase=jnp.asarray(wheelbase), track=jnp.asarray(track),
        aero_cda=jnp.asarray(1.2),
        chassis=chassis, wheels=tuple(wheels), knuckles=tuple(knuckles),
    )
    return vehicle, state


def _build_wishbone_vehicle(chassis_mass, chassis_inertia, wheelbase, track,
                            cg_height, wheel_mass, wheel_radius, wheel_width,
                            wheel_inertia_spin, tire, powertrain,
                            max_steer_angle, max_brake_torque, driven):
    from chrono_tpu.vehicle.suspension import (
        WishboneHardpoints, add_double_wishbone_corner,
    )

    b = SystemBuilder()
    chassis = b.add_body(mass=chassis_mass, inertia=chassis_inertia,
                         pos=(0, 0, cg_height), name="chassis")
    a, s = wheelbase / 2, track / 2
    z_w = wheel_radius
    r = wheel_radius
    hp = WishboneHardpoints(
        spindle=(0.0, 0.0, 0.0),
        uca_front=(0.30 * r / 0.35, -0.9 * s, 0.55 * r),
        uca_rear=(-0.30 * r / 0.35, -0.9 * s, 0.55 * r),
        uca_ball=(0.0, -0.25 * r, 0.62 * r),
        lca_front=(0.35 * r / 0.35, -0.95 * s, -0.45 * r),
        lca_rear=(-0.35 * r / 0.35, -0.95 * s, -0.45 * r),
        lca_ball=(0.0, -0.18 * r, -0.5 * r),
        spring_chassis=(0.0, -0.6 * s, 1.3 * r),
        spring_lca=(0.0, -0.5 * s, -0.4 * r),
        tierod_chassis=(0.5 * r, -0.85 * s, 0.0),
        tierod_upright=(0.45 * r, -0.25 * r, 0.0),
        masses=dict(uca=6.0, lca=8.0, upright=25.0, wheel=wheel_mass),
        inertias=dict(uca=(0.03, 0.03, 0.05), lca=(0.05, 0.05, 0.08),
                      upright=(0.4, 0.4, 0.4),
                      wheel=(wheel_inertia_spin * 0.55, wheel_inertia_spin,
                             wheel_inertia_spin * 0.55)),
        spring_k=chassis_mass * 50.0,    # ~5 Hz corner with lever ratio
        spring_c=chassis_mass * 4.0)

    # front steering rack: one body sliding laterally on the chassis with a
    # position motor — the tie rods do the rest (Ackermann from geometry)
    rack_x = a + 0.5 * r
    rack = b.add_body(mass=5.0, inertia=(0.05, 0.05, 0.05),
                      pos=(rack_x, 0, z_w), name="rack")
    b.add_motor_linear_position(chassis, rack, world_pos=(rack_x, 0, z_w),
                                world_axis=(0, 1, 0),
                                profile=FConst(c=jnp.asarray(0.0)),
                                add_joint=True)

    wheels, uprights = [], []
    for (cx, side, name, steered) in ((+a, +1, "FL", True),
                                      (+a, -1, "FR", True),
                                      (-a, +1, "RL", False),
                                      (-a, -1, "RR", False)):
        corner = add_double_wishbone_corner(
            b, chassis, (cx, side * s, z_w), hp, side=side,
            steered_rack_body=rack if steered else None)
        wheels.append(corner.wheel)
        if steered:
            uprights.append(corner.upright)

    model, state = b.finalize()

    if tire is None:
        tire = TMeasyParams(radius=jnp.asarray(wheel_radius),
                            width=jnp.asarray(wheel_width),
                            Fz0=jnp.asarray(chassis_mass * 9.81 / 4))
    if powertrain is None:
        speeds, torques, losses = default_engine_map()
        driven_mask = {"AWD": [1.0] * 4, "RWD": [0, 0, 1, 1],
                       "FWD": [1, 1, 0, 0]}[driven]
        powertrain = PowertrainParams(
            map_speed=speeds, map_torque=torques, map_losses=losses,
            max_speed=jnp.asarray(650.0),
            gear_ratios=jnp.asarray([3.5, 2.2, 1.5, 1.0, 0.75]),
            shift_speeds=jnp.asarray([5.0, 10.0, 16.0, 23.0]),
            final_drive=jnp.asarray(3.7),
            driven_wheels=jnp.asarray([float(d) for d in driven_mask]))

    # steer-arm radius: distance of the tie-rod anchor from the kingpin axis
    # (UCA ball ↔ LCA ball line) sets rack-travel per steer angle
    import numpy as np

    kp_top = np.asarray(hp.uca_ball)
    kp_bot = np.asarray(hp.lca_ball)
    axis = kp_top - kp_bot
    axis = axis / np.linalg.norm(axis)
    tr = np.asarray(hp.tierod_upright) - kp_bot
    arm = np.linalg.norm(tr - np.dot(tr, axis) * axis)

    vehicle = WheeledVehicle(
        model=model, tire=tire, powertrain=powertrain,
        max_steer_angle=jnp.asarray(max_steer_angle),
        max_brake_torque=jnp.asarray(max_brake_torque),
        ackermann=jnp.asarray(0.0),          # geometric — nothing imposed
        wheelbase=jnp.asarray(wheelbase), track=jnp.asarray(track),
        aero_cda=jnp.asarray(1.2),
        chassis=chassis, wheels=tuple(wheels), knuckles=tuple(uprights),
        steer_rack_gain=jnp.asarray(float(arm)),
    )
    return vehicle, state


def _set_rack(model: Model, disp) -> Model:
    """Write the steering-rack displacement into the lin_pos motor profile."""
    md = model.motors["lin_pos"]
    new_md = md.replace(profile=md.profile.replace(
        c=jnp.broadcast_to(disp, md.profile.c.shape)))
    motors = dict(model.motors)
    motors["lin_pos"] = new_md
    return model.replace(motors=motors)


def _set_steering(model: Model, angles: Array) -> Model:
    """Write per-knuckle steer angles into the rot_angle motor profiles."""
    md = model.motors["rot_angle"]
    new_profile = md.profile.replace(c=angles)
    new_md = md.replace(profile=new_profile)
    motors = dict(model.motors)
    motors["rot_angle"] = new_md
    return model.replace(motors=motors)


def ackermann_angles(steer_input, max_angle, wheelbase, track, ackermann):
    """Left/right steer angles with Ackermann correction."""
    delta = steer_input * max_angle
    # ideal Ackermann: cot(δo) − cot(δi) = track/wheelbase
    tan_d = jnp.tan(jnp.abs(delta) + 1e-9)
    inner = jnp.arctan(wheelbase * tan_d / (wheelbase - 0.5 * track * tan_d))
    outer = jnp.arctan(wheelbase * tan_d / (wheelbase + 0.5 * track * tan_d))
    inner = jnp.abs(delta) + (inner - jnp.abs(delta)) * ackermann
    outer = jnp.abs(delta) + (outer - jnp.abs(delta)) * ackermann
    # steering left (+): left wheel is inner
    left = jnp.where(delta >= 0, inner, outer) * jnp.sign(delta)
    right = jnp.where(delta >= 0, outer, inner) * jnp.sign(delta)
    return jnp.stack([left, right])


def vehicle_step(vehicle: WheeledVehicle, state, inputs: DriverInputs,
                 terrain_height_fn, t, h,
                 settings: SolverSettings = SolverSettings(solver="direct")):
    """One fused vehicle step: tires → driveline/brakes → steering → MBS."""
    w_idx = jnp.asarray(vehicle.wheels, jnp.int32)
    wx = state.x[w_idx]
    wq = state.q[w_idx]
    wv = state.v[w_idx]
    ww = state.w[w_idx]

    # tires
    f_tire, t_spin, fz = tmeasy_forces(
        vehicle.tire, wx, wq, wv, ww, terrain_height_fn)

    # driveline + brakes
    speed = jnp.linalg.norm(state.v[vehicle.chassis, :2])
    omegas = ww[:, 1]
    t_drive, engine_speed, gear = driveline_torques(
        vehicle.powertrain, omegas, speed, inputs.throttle)
    t_brake = brake_torques(inputs.braking, vehicle.max_brake_torque, omegas)

    # steering: wishbone build → rack displacement; reduced → knuckle motors
    if "lin_pos" in vehicle.model.motors:
        disp = (inputs.steering * vehicle.max_steer_angle
                * vehicle.steer_rack_gain)
        model = _set_rack(vehicle.model, disp)
    else:
        angles = ackermann_angles(inputs.steering, vehicle.max_steer_angle,
                                  vehicle.wheelbase, vehicle.track,
                                  vehicle.ackermann)
        model = _set_steering(vehicle.model, angles)

    # external loads
    n = model.n_bodies
    f_ext = jnp.zeros((n, 3), state.x.dtype)
    tau_ext = jnp.zeros((n, 3), state.x.dtype)
    f_ext = f_ext.at[w_idx].add(f_tire)
    spin_t = t_spin + t_drive + t_brake
    tau_ext = tau_ext.at[w_idx].add(
        spin_t[:, None] * jnp.asarray([0.0, 1.0, 0.0], state.x.dtype))
    # aero drag on the chassis
    v_ch = state.v[vehicle.chassis]
    f_ext = f_ext.at[vehicle.chassis].add(
        -vehicle.aero_cda * jnp.linalg.norm(v_ch) * v_ch)
    # driveline reaction torque on the chassis (about the wheel spin axes)
    tau_ext = tau_ext.at[vehicle.chassis].add(
        Q.qrotate_inv(state.q[vehicle.chassis],
                      jnp.sum(-(t_drive + t_brake)[:, None]
                              * Q.qrotate(wq, jnp.asarray([0.0, 1.0, 0.0],
                                                          state.x.dtype)),
                              axis=0)))

    new_state, info = step_euler_implicit_linearized(
        model, state, t, h, settings, f_ext=f_ext, tau_ext=tau_ext)
    return VehicleStepOut(state=new_state, tire_fz=fz,
                          engine_speed=engine_speed, gear=gear)
