"""HMMWV-class vehicle model (parameter set).

Capability counterpart of the reference's HMMWV model family
(/root/reference/src/chrono_models/vehicle/hmmwv): a ~2.4 t 4×4 utility truck
with published-spec-level parameters (wheelbase 3.378 m, track 1.82 m, 37"
tires) assembled on the chrono_tpu vehicle templates.
"""

from __future__ import annotations

import jax.numpy as jnp

from chrono_tpu.vehicle.tire import TMeasyParams
from chrono_tpu.vehicle.powertrain import PowertrainParams, default_engine_map
from chrono_tpu.vehicle.wheeled import build_wheeled_vehicle


def create_hmmwv(driven="AWD"):
    """Returns (WheeledVehicle, BodyState) for an HMMWV-class truck."""
    wheel_radius = 0.47
    mass = 2097.0
    tire = TMeasyParams(
        radius=jnp.asarray(wheel_radius),
        width=jnp.asarray(0.318),
        Fz0=jnp.asarray(mass * 9.81 / 4),
        cz=jnp.asarray(326000.0),
        dz=jnp.asarray(3500.0),
        # longitudinal/lateral characteristics scaled to the 37x12.5R16.5 tire
        dfx0_1=jnp.asarray(120000.0), fxm_1=jnp.asarray(6200.0),
        fxs_1=jnp.asarray(5400.0), sxm_1=jnp.asarray(0.12),
        sxs_1=jnp.asarray(0.9),
        dfx0_2=jnp.asarray(240000.0), fxm_2=jnp.asarray(12000.0),
        fxs_2=jnp.asarray(10400.0), sxm_2=jnp.asarray(0.15),
        sxs_2=jnp.asarray(0.95),
        dfy0_1=jnp.asarray(90000.0), fym_1=jnp.asarray(5800.0),
        fys_1=jnp.asarray(5200.0), sym_1=jnp.asarray(0.28),
        sys_1=jnp.asarray(1.0),
        dfy0_2=jnp.asarray(170000.0), fym_2=jnp.asarray(11000.0),
        fys_2=jnp.asarray(9800.0), sym_2=jnp.asarray(0.32),
        sys_2=jnp.asarray(1.0),
        rolling_resistance=jnp.asarray(0.015),
    )
    speeds, torques, losses = default_engine_map(
        max_torque=542.0,          # 400 lb-ft diesel
        max_power_speed=360.0,     # ~3400 rpm
        max_speed=460.0,
    )
    powertrain = PowertrainParams(
        map_speed=speeds, map_torque=torques, map_losses=losses,
        max_speed=jnp.asarray(460.0),
        gear_ratios=jnp.asarray([3.59, 2.19, 1.41, 1.0]),
        shift_speeds=jnp.asarray([6.0, 12.0, 19.0]),
        final_drive=jnp.asarray(4.71),
        driven_wheels=jnp.asarray({
            "AWD": [1.0, 1.0, 1.0, 1.0],
            "RWD": [0.0, 0.0, 1.0, 1.0],
        }[driven]),
        efficiency=jnp.asarray(0.85),
    )
    return build_wheeled_vehicle(
        chassis_mass=mass,
        chassis_inertia=(1078.0, 2955.0, 3570.0),
        wheelbase=3.378,
        track=1.82,
        cg_height=0.85,
        wheel_mass=55.0,
        wheel_radius=wheel_radius,
        wheel_width=0.318,
        wheel_inertia_spin=3.8,
        suspension_k=167000.0,
        suspension_c=15000.0,
        tire=tire,
        powertrain=powertrain,
        max_steer_angle=0.52,
        max_brake_torque=4000.0,
        driven=driven,
    )
