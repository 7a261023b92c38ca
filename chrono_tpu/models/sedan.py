"""Sedan-class passenger-car model (parameter set).

Capability counterpart of the reference's Sedan/BMW model families
(/root/reference/src/chrono_models/vehicle/sedan, vehicle/bmw): a ~1.5 t
front-engine RWD passenger car on the chrono_tpu vehicle templates.
"""

from __future__ import annotations

import jax.numpy as jnp

from chrono_tpu.vehicle.tire import TMeasyParams
from chrono_tpu.vehicle.powertrain import PowertrainParams, default_engine_map
from chrono_tpu.vehicle.wheeled import build_wheeled_vehicle


def create_sedan(driven="RWD", suspension="reduced"):
    """Returns (WheeledVehicle, BodyState) for a mid-size sedan."""
    wheel_radius = 0.33
    mass = 1500.0
    tire = TMeasyParams(
        radius=jnp.asarray(wheel_radius),
        width=jnp.asarray(0.225),
        Fz0=jnp.asarray(mass * 9.81 / 4),
        cz=jnp.asarray(260000.0),
        dz=jnp.asarray(1800.0),
        dfx0_1=jnp.asarray(90000.0), fxm_1=jnp.asarray(4300.0),
        fxs_1=jnp.asarray(3800.0), sxm_1=jnp.asarray(0.10),
        sxs_1=jnp.asarray(0.8),
        dfx0_2=jnp.asarray(180000.0), fxm_2=jnp.asarray(8400.0),
        fxs_2=jnp.asarray(7300.0), sxm_2=jnp.asarray(0.12),
        sxs_2=jnp.asarray(0.85),
        dfy0_1=jnp.asarray(70000.0), fym_1=jnp.asarray(4100.0),
        fys_1=jnp.asarray(3700.0), sym_1=jnp.asarray(0.24),
        sys_1=jnp.asarray(1.0),
        dfy0_2=jnp.asarray(135000.0), fym_2=jnp.asarray(8000.0),
        fys_2=jnp.asarray(7200.0), sym_2=jnp.asarray(0.28),
        sys_2=jnp.asarray(1.0),
        rolling_resistance=jnp.asarray(0.012),
    )
    speeds, torques, losses = default_engine_map(
        max_torque=240.0,          # 2.0 l turbo petrol
        max_power_speed=520.0,     # ~5000 rpm
        max_speed=680.0,
    )
    powertrain = PowertrainParams(
        map_speed=speeds, map_torque=torques, map_losses=losses,
        max_speed=jnp.asarray(680.0),
        gear_ratios=jnp.asarray([4.71, 3.14, 2.11, 1.67, 1.29, 1.0]),
        shift_speeds=jnp.asarray([5.0, 10.0, 15.0, 21.0, 28.0]),
        final_drive=jnp.asarray(3.27),
        driven_wheels=jnp.asarray({
            "AWD": [1.0, 1.0, 1.0, 1.0],
            "RWD": [0.0, 0.0, 1.0, 1.0],
            "FWD": [1.0, 1.0, 0.0, 0.0],
        }[driven]),
        efficiency=jnp.asarray(0.9),
    )
    return build_wheeled_vehicle(
        chassis_mass=mass,
        chassis_inertia=(487.0, 1447.0, 1650.0),
        wheelbase=2.78,
        track=1.58,
        cg_height=0.52,
        wheel_mass=22.0,
        wheel_radius=wheel_radius,
        wheel_width=0.225,
        wheel_inertia_spin=1.2,
        suspension_k=55000.0,
        suspension_c=4500.0,
        tire=tire,
        powertrain=powertrain,
        max_steer_angle=0.60,
        max_brake_torque=2200.0,
        driven=driven,
        suspension=suspension,
    )
