"""Engine + transmission + driveline, as pure per-step functions.

Capability counterparts of the reference's map-based powertrain
(/root/reference/src/chrono_vehicle/powertrain/ChEngineSimpleMap.h,
ChAutomaticTransmissionSimpleMap.h) and shafts drivelines: an engine torque map
sampled at engine speed, a gear ratio selected by speed thresholds
(branch-free ``searchsorted``), and an open differential splitting torque to
the driven wheels.  State is just the selected gear (hysteresis-free map, like
the "simple map" reference models).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class PowertrainParams:
    """Engine map + gearbox + driveline parameters."""

    # engine full-throttle torque map (Nm) vs speed (rad/s), plus losses map
    map_speed: Array          # (K,)
    map_torque: Array         # (K,) full-throttle
    map_losses: Array         # (K,) closed-throttle (negative = braking)
    max_speed: Array          # rev limiter [rad/s]
    gear_ratios: Array        # (G,) total transmission ratios (engine/driveshaft)
    shift_speeds: Array       # (G-1,) upshift vehicle speeds [m/s]
    final_drive: Array        # differential ratio
    driven_wheels: Array      # (W,) 1.0 if driven, else 0.0
    efficiency: Array = 0.9


def engine_torque(p: PowertrainParams, engine_speed, throttle):
    """Torque from a SIGNED engine speed: the drive part always pushes the
    engine forward; the losses part OPPOSES the current rotation (so a
    backward-spinning driveline is braked, not accelerated)."""
    w_abs = jnp.abs(engine_speed)
    wt = jnp.interp(w_abs, p.map_speed, p.map_torque)
    wl = jnp.interp(w_abs, p.map_speed, p.map_losses)   # negative values
    # soft limiter: fade drive torque to zero in the last 5% of the range
    fade = jnp.clip((p.max_speed - w_abs) / (0.05 * p.max_speed), 0.0, 1.0)
    drive = throttle * (wt - wl) * fade
    losses = wl * jnp.tanh(engine_speed / 10.0)         # sign-aware braking
    # tanh(+w)→1: full negative (braking) torque; tanh(−w)→−1: positive torque
    return drive + losses


def select_gear(p: PowertrainParams, vehicle_speed):
    """Speed-threshold automatic gearbox (branch-free)."""
    return jnp.searchsorted(p.shift_speeds, jnp.abs(vehicle_speed))


def driveline_torques(p: PowertrainParams, wheel_omegas, vehicle_speed,
                      throttle):
    """Throttle + wheel speeds → per-wheel drive torque (open differential).

    Engine speed is kinematically tied to the mean driven-wheel speed through
    the total ratio (the reference's simple-map powertrain does the same).
    Returns (wheel_torques (W,), engine_speed, gear).
    """
    gear = select_gear(p, vehicle_speed)
    ratio = p.gear_ratios[gear] * p.final_drive
    n_driven = jnp.maximum(jnp.sum(p.driven_wheels), 1.0)
    mean_w = jnp.sum(wheel_omegas * p.driven_wheels) / n_driven
    engine_speed = mean_w * ratio                        # signed
    te = engine_torque(p, engine_speed, throttle)
    t_axle = te * ratio * p.efficiency
    per_wheel = t_axle / n_driven * p.driven_wheels
    return per_wheel, engine_speed, gear


def brake_torques(brake_input, max_torque, wheel_omegas, front_bias=0.6,
                  n_front=2):
    """Viscous-regularized brake torque opposing wheel spin
    (reference ChBrakeSimple)."""
    w = wheel_omegas
    n = w.shape[0]
    bias = jnp.concatenate([
        jnp.full((n_front,), front_bias / n_front),
        jnp.full((n - n_front,), (1.0 - front_bias) / (n - n_front)),
    ])
    return -brake_input * max_torque * bias * n * jnp.tanh(2.0 * w)


def default_engine_map(max_torque=400.0, max_power_speed=450.0,
                       max_speed=650.0, dtype=jnp.float32):
    """A generic truck-like torque curve."""
    speeds = jnp.asarray([0.0, 100.0, 200.0, 300.0, max_power_speed,
                          max_speed * 0.95, max_speed], dtype)
    torques = jnp.asarray([0.6, 0.85, 1.0, 1.0, 0.95, 0.7, 0.0],
                          dtype) * max_torque
    losses = jnp.asarray([-20.0, -25.0, -30.0, -35.0, -40.0, -50.0, -60.0],
                         dtype)
    return speeds, torques, losses
