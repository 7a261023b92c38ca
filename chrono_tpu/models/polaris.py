"""Polaris-class light UTV model (parameter set).

Capability counterpart of the reference's Polaris RZR / Gator families
(/root/reference/src/chrono_models/vehicle/polaris, vehicle/gator and the
JSON decks in data/vehicle/Polaris): a ~0.8 t off-road side-by-side, AWD,
soft long-travel suspension — the reference's standard vehicle for CRM/SCM
deformable-terrain studies.
"""

from __future__ import annotations

import jax.numpy as jnp

from chrono_tpu.vehicle.tire import TMeasyParams
from chrono_tpu.vehicle.powertrain import PowertrainParams, default_engine_map
from chrono_tpu.vehicle.wheeled import build_wheeled_vehicle


def create_polaris(driven="AWD", suspension="reduced"):
    """Returns (WheeledVehicle, BodyState) for a Polaris-class UTV."""
    wheel_radius = 0.34
    mass = 790.0
    tire = TMeasyParams(
        radius=jnp.asarray(wheel_radius),
        width=jnp.asarray(0.24),
        Fz0=jnp.asarray(mass * 9.81 / 4),
        cz=jnp.asarray(110000.0),
        dz=jnp.asarray(1200.0),
        dfx0_1=jnp.asarray(40000.0), fxm_1=jnp.asarray(2300.0),
        fxs_1=jnp.asarray(2000.0), sxm_1=jnp.asarray(0.14),
        sxs_1=jnp.asarray(0.9),
        dfx0_2=jnp.asarray(80000.0), fxm_2=jnp.asarray(4500.0),
        fxs_2=jnp.asarray(3900.0), sxm_2=jnp.asarray(0.17),
        sxs_2=jnp.asarray(0.95),
        dfy0_1=jnp.asarray(32000.0), fym_1=jnp.asarray(2100.0),
        fys_1=jnp.asarray(1900.0), sym_1=jnp.asarray(0.30),
        sys_1=jnp.asarray(1.0),
        dfy0_2=jnp.asarray(62000.0), fym_2=jnp.asarray(4100.0),
        fys_2=jnp.asarray(3700.0), sym_2=jnp.asarray(0.35),
        sys_2=jnp.asarray(1.0),
        rolling_resistance=jnp.asarray(0.02),
    )
    speeds, torques, losses = default_engine_map(
        max_torque=95.0,           # ~1 l twin
        max_power_speed=700.0,     # ~6700 rpm
        max_speed=900.0,
    )
    powertrain = PowertrainParams(
        map_speed=speeds, map_torque=torques, map_losses=losses,
        max_speed=jnp.asarray(900.0),
        gear_ratios=jnp.asarray([10.1, 5.9, 3.9]),   # CVT approximated
        shift_speeds=jnp.asarray([7.0, 15.0]),
        final_drive=jnp.asarray(3.2),
        driven_wheels=jnp.asarray({
            "AWD": [1.0, 1.0, 1.0, 1.0],
            "RWD": [0.0, 0.0, 1.0, 1.0],
        }[driven]),
        efficiency=jnp.asarray(0.82),
    )
    return build_wheeled_vehicle(
        chassis_mass=mass,
        chassis_inertia=(260.0, 560.0, 620.0),
        wheelbase=2.72,
        track=1.62,
        cg_height=0.62,
        wheel_mass=14.0,
        wheel_radius=wheel_radius,
        wheel_width=0.24,
        wheel_inertia_spin=0.6,
        suspension_k=35000.0,
        suspension_c=3200.0,
        tire=tire,
        powertrain=powertrain,
        max_steer_angle=0.61,
        max_brake_torque=900.0,
        driven=driven,
        suspension=suspension,
    )
