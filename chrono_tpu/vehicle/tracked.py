"""Tracked vehicles: continuous-band track super-element model.

Counterpart of the reference's tracked-vehicle stack
(/root/reference/src/chrono_vehicle/tracked_vehicle/ChTrackAssembly.h:46 —
sprocket/idler/road-wheel/track-shoe assemblies; the reference also ships
continuous *band* tracks, ChTrackAssemblyBand*.h).  This module implements
the band-track formulation TPU-first:

  * each track side is a sprocket SHAFT (1-DOF drivetrain variable, see
    chrono_tpu.physics.shafts) whose spin sets the band surface speed
    v_band = ω R;
  * the track-ground interface is a row of contact patches along the track
    footprint; each patch carries a penetration-spring normal load and
    saturated-friction longitudinal/lateral forces computed from the slip
    between the band surface and the ground-frame patch velocity (yaw makes
    patch speeds differ along the footprint — that is what produces the
    skid-steer turning resistance);
  * patch reactions accumulate onto the chassis, and their longitudinal sum
    back-torques the sprocket shaft (τ = −R ΣF_x) — the full drivetrain↔
    terramechanics loop of the reference's ChTrackAssembly, without the
    per-shoe contact pipeline (segmented shoes are the chrono_tpu roadmap's
    next fidelity level).

Everything evaluates batched over patches and sides inside the one jitted
vehicle step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.system import (
    Model, SolverSettings, step_euler_implicit_linearized,
)


@pytree_dataclass
class TrackParams:
    """Per-side band-track parameters (M113-class defaults)."""

    sprocket_radius: Array = 0.24
    track_length: Array = 2.6       # footprint length on the ground
    track_width: Array = 0.36
    n_patches: int = static_field(default=7)
    kz: Array = 4.0e5               # patch normal stiffness [N/m]
    cz: Array = 3.0e4               # patch normal damping
    mu_lon: Array = 0.9             # longitudinal friction (grouser grip)
    mu_lat: Array = 0.7             # lateral (skid) friction
    slip_v0: Array = 0.15           # slip-velocity scale for saturation [m/s]
    rolling_resistance: Array = 0.02


@pytree_dataclass
class TrackedVehicle:
    model: Model
    track: TrackParams
    chassis: int = static_field(default=0)
    sprockets: tuple = static_field(default=())   # (left, right) shaft idx
    half_track: Array = 0.95                      # lateral offset of bands
    ride_height: Array = 0.3                      # chassis COM above ground


def build_tracked_vehicle(chassis_mass=9000.0,
                          chassis_inertia=(8000.0, 25000.0, 28000.0),
                          sprocket_inertia=15.0, half_track=0.95,
                          ride_height=0.45, track=TrackParams(),
                          pos=(0.0, 0.0, None)):
    """Assemble chassis + two sprocket shafts (M113-class scale,
    chrono_models/vehicle/m113)."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    z0 = ride_height if pos[2] is None else pos[2]
    chassis = bld.add_body(mass=chassis_mass, inertia=chassis_inertia,
                           pos=(pos[0], pos[1], z0))
    left = bld.add_shaft(inertia=sprocket_inertia)
    right = bld.add_shaft(inertia=sprocket_inertia)
    model, state = bld.finalize()
    veh = TrackedVehicle(model=model, track=track, chassis=chassis,
                         sprockets=(left, right),
                         half_track=jnp.asarray(half_track),
                         ride_height=jnp.asarray(ride_height))
    return veh, state


def _track_forces(veh: TrackedVehicle, state, terrain_height_fn):
    """Patch forces for both sides.

    Returns (f_chassis_world (3,), tau_chassis_local (3,),
             tau_sprocket (2,), fz_total (2,))."""
    tp = veh.track
    ch = veh.chassis
    x_c = state.x[ch]
    q_c = state.q[ch]
    v_c = state.v[ch]
    w_l = state.w[ch]                       # body-local
    R = Q.q_to_matrix(q_c)
    e_lon = R[:, 0]
    e_lat = R[:, 1]
    # flatten to the ground plane (tracks work in the yaw frame)
    e_lon = e_lon.at[2].set(0.0)
    e_lon = e_lon / jnp.maximum(jnp.linalg.norm(e_lon), 1e-9)
    e_lat = jnp.stack([-e_lon[1], e_lon[0], 0.0])

    n_p = tp.n_patches
    s = (jnp.arange(n_p) / (n_p - 1) - 0.5) * tp.track_length   # along track
    sides = jnp.asarray([1.0, -1.0])

    # patch positions in the chassis yaw frame (world)
    def side_patches(side, w_shaft):
        py = side * veh.half_track
        p_local = s[:, None] * e_lon[None, :] + py * e_lat[None, :]
        p_world = x_c[None, :] + p_local
        z_ground = terrain_height_fn(p_world[:, :2])
        pen = z_ground + veh.ride_height - p_world[:, 2]
        # patch vertical velocity (chassis heave+pitch+roll)
        w_world = Q.qrotate(q_c, w_l)
        v_pt = v_c[None, :] + jnp.cross(w_world[None, :], p_local)
        # each patch carries its share of the track stiffness
        fz = jnp.maximum((tp.kz * pen - tp.cz * v_pt[:, 2]) / n_p, 0.0)
        in_contact = pen > 0

        v_band = w_shaft * tp.sprocket_radius
        v_lon = jnp.sum(v_pt * e_lon[None, :], axis=1)
        v_lat = jnp.sum(v_pt * e_lat[None, :], axis=1)
        slip_lon = v_band - v_lon
        fx = tp.mu_lon * fz * jnp.tanh(slip_lon / tp.slip_v0)
        fy = -tp.mu_lat * fz * jnp.tanh(v_lat / tp.slip_v0)
        fx = jnp.where(in_contact, fx, 0.0)
        fy = jnp.where(in_contact, fy, 0.0)
        fzc = jnp.where(in_contact, fz, 0.0)
        f_w = (fx[:, None] * e_lon[None, :] + fy[:, None] * e_lat[None, :]
               + fzc[:, None] * jnp.asarray([0.0, 0.0, 1.0])[None, :])
        # torque about chassis COM (world), then to local
        tau_w = jnp.sum(jnp.cross(p_local, f_w), axis=0)
        # sprocket back-torque + rolling resistance
        tau_s = (-tp.sprocket_radius * jnp.sum(fx)
                 - tp.rolling_resistance * tp.sprocket_radius
                 * jnp.sum(fzc) * jnp.tanh(w_shaft / 0.5))
        return jnp.sum(f_w, axis=0), tau_w, tau_s, jnp.sum(fzc)

    w_left = state.w[veh.sprockets[0], 2]
    w_right = state.w[veh.sprockets[1], 2]
    fL, tL, tsL, fzL = side_patches(sides[0], w_left)
    fR, tR, tsR, fzR = side_patches(sides[1], w_right)

    f_tot = fL + fR
    tau_local = Q.qrotate_inv(q_c, tL + tR)
    return f_tot, tau_local, jnp.stack([tsL, tsR]), jnp.stack([fzL, fzR])


class TrackedStepOut(NamedTuple):
    state: object
    fz: Array           # (2,) per-side normal load
    sprocket_w: Array   # (2,)


def tracked_step(veh: TrackedVehicle, state, torques, terrain_height_fn,
                 h, settings=SolverSettings(solver="direct")):
    """One fused step: track patch forces → chassis + sprocket loads → MBS.

    ``torques``: (2,) drive torque on (left, right) sprockets — differential
    torques skid-steer the vehicle.
    """
    f_tr, tau_tr, tau_spr, fz = _track_forces(veh, state, terrain_height_fn)
    n = veh.model.n_bodies
    f_ext = jnp.zeros((n, 3)).at[veh.chassis].set(f_tr)
    tau_ext = jnp.zeros((n, 3)).at[veh.chassis].set(tau_tr)
    for k, spr in enumerate(veh.sprockets):
        tau_ext = tau_ext.at[spr, 2].add(torques[k] + tau_spr[k])
    new_state, _ = step_euler_implicit_linearized(
        veh.model, state, jnp.zeros(()), h, settings,
        f_ext=f_ext, tau_ext=tau_ext)
    return TrackedStepOut(
        state=new_state, fz=fz,
        sprocket_w=jnp.stack([new_state.w[veh.sprockets[0], 2],
                              new_state.w[veh.sprockets[1], 2]]))
