"""M113-class tracked vehicle model.

Counterpart of the reference's ready-made M113
(/root/reference/src/chrono_models/vehicle/m113 — hull + two track
assemblies; exercised by btest_VEH_m113Acc): public-spec mass/geometry on the
band-track formulation of chrono_tpu.vehicle.tracked.
"""

from __future__ import annotations

import jax.numpy as jnp

from chrono_tpu.vehicle.tracked import (
    TrackParams, TrackedVehicle, build_tracked_vehicle, tracked_step,
)


def build_m113(pos=(0.0, 0.0, None)):
    """M113 APC: ~9.9 t combat mass, 2.82 m track centers ~2.1 m apart,
    0.38 m wide tracks, sprocket radius 0.214 m (public specifications)."""
    track = TrackParams(
        sprocket_radius=jnp.asarray(0.214),
        track_length=jnp.asarray(2.82),
        track_width=jnp.asarray(0.38),
        n_patches=7,
        kz=jnp.asarray(6.0e5), cz=jnp.asarray(5.0e4),
        mu_lon=jnp.asarray(0.85), mu_lat=jnp.asarray(0.65),
        slip_v0=jnp.asarray(0.15),
        rolling_resistance=jnp.asarray(0.025),
    )
    return build_tracked_vehicle(
        chassis_mass=9900.0,
        chassis_inertia=(12000.0, 32000.0, 35000.0),
        sprocket_inertia=18.0,
        half_track=1.05,
        ride_height=0.5,
        track=track,
        pos=pos,
    )


def m113_acceleration_run(n_steps=3000, h=2e-3, torque=6000.0):
    """The btest_VEH_m113Acc maneuver: full throttle from rest on flat rigid
    ground; returns (times, speeds) for RTF/plausibility checks."""
    import numpy as np
    import jax

    veh, state = build_m113()
    flat = lambda xy: jnp.zeros(xy.shape[:-1])
    step = jax.jit(lambda s, tq: tracked_step(veh, s, tq, flat, h))
    tq = jnp.asarray([torque, torque], jnp.float32)
    times, speeds = [], []
    for k in range(n_steps):
        out = step(state, tq)
        state = out.state
        if k % 50 == 0:
            times.append(k * h)
            speeds.append(float(state.v[veh.chassis, 0]))
    return np.asarray(times), np.asarray(speeds)
