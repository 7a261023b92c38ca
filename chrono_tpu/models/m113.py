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

# Reference-exact deck values, field-validated by tests/test_m113_deck.py
# against /root/reference/data/vehicle/M113/**/*.json (loaded at test
# time).  The lumped-track formulation folds the 2 x 63 single-pin shoes
# into the hull mass; the sprocket pitch radius is the single-pin
# assembly radius.
M113_SPEC = dict(
    hull_mass=7819.24,
    chassis_inertia=(13983.08, 27287.61, 28805.57),
    chassis_com=(-2.006, 0.0, 0.406),
    half_track=1.0795,
    sprocket_radius=0.245,      # single-pin Assembly Radius
    sprocket_teeth=10,
    sprocket_gear_mass=27.68,
    shoe_pitch=0.154,
    shoe_mass=18.02,
    shoe_height=0.06,
    shoe_inertia=(0.22, 0.04, 0.25),
    n_shoes=63,                 # per track assembly
    n_road_wheels=5,
    road_wheel_span=2.667,      # first to last suspension x
    total_mass=7819.24 + 2 * 63 * 18.02,
)


def build_m113(pos=(0.0, 0.0, None)):
    """M113 APC on the lumped band-track formulation, with the reference
    deck's single-pin parameters (M113_SPEC)."""
    track = TrackParams(
        sprocket_radius=jnp.asarray(M113_SPEC["sprocket_radius"]),
        track_length=jnp.asarray(M113_SPEC["road_wheel_span"]),
        track_width=jnp.asarray(0.38),
        n_patches=M113_SPEC["n_road_wheels"],
        kz=jnp.asarray(6.0e5), cz=jnp.asarray(5.0e4),
        mu_lon=jnp.asarray(0.85), mu_lat=jnp.asarray(0.65),
        slip_v0=jnp.asarray(0.15),
        rolling_resistance=jnp.asarray(0.025),
    )
    # the track-loop rotary inertia about the sprocket axle: gear +
    # the shoes in the loop at the pitch radius (m r^2)
    r = M113_SPEC["sprocket_radius"]
    i_loop = (0.4 + M113_SPEC["n_shoes"] * M113_SPEC["shoe_mass"] * r * r)
    return build_tracked_vehicle(
        chassis_mass=M113_SPEC["total_mass"],
        chassis_inertia=M113_SPEC["chassis_inertia"],
        sprocket_inertia=i_loop,
        half_track=M113_SPEC["half_track"],
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
