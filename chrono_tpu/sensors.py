"""Dynamic sensors: IMU (accelerometer/gyroscope/magnetometer), GPS,
tachometer — with noise models and update rates.

Counterpart of the reference's non-render sensor stack
(/root/reference/src/chrono_sensor: ChAccelerometerSensor/ChGyroscopeSensor/
ChMagnetometerSensor/ChGPSSensor/ChTachometerSensor updated by
ChDynamicsManager, with ChNoiseNormal/ChNoiseNormalDrift models).  The OptiX
render sensors (camera/lidar/radar) have no TPU analogue and stay out of
scope; these dynamic sensors are pure functions of body state + a noise PRNG,
so whole sensor fleets evaluate batched inside the jitted step.

Conventions: readings are in the SENSOR frame (body-local, offset by a mount
pose); accelerometer measures proper acceleration (kinematic − gravity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core import quaternion as Q


@pytree_dataclass
class NoiseModel:
    """Gaussian noise + random-walk drift (reference ChNoiseNormalDrift)."""

    sigma: Array = 0.0        # white noise std
    drift_sigma: Array = 0.0  # per-update random-walk increment std


def _apply_noise(key, noise: NoiseModel, value, drift):
    k1, k2 = jax.random.split(key)
    white = noise.sigma * jax.random.normal(k1, jnp.shape(value))
    drift = drift + noise.drift_sigma * jax.random.normal(k2,
                                                          jnp.shape(value))
    return value + white + drift, drift


@pytree_dataclass
class IMUSensor:
    """Accel + gyro + magnetometer on a body at a mount offset."""

    body: int = static_field(default=0)
    mount_pos: Array = None           # (3,) body-local lever arm
    accel_noise: NoiseModel = None
    gyro_noise: NoiseModel = None
    gravity: Array = None             # world gravity (for proper accel)
    mag_field: Array = None           # world magnetic field vector


class IMUReading(NamedTuple):
    accel: Array       # (3,) sensor-frame proper acceleration
    gyro: Array        # (3,) sensor-frame angular velocity
    mag: Array         # (3,) sensor-frame magnetic field
    accel_drift: Array
    gyro_drift: Array


def make_imu(body, mount_pos=(0, 0, 0), accel_sigma=0.0, gyro_sigma=0.0,
             accel_drift=0.0, gyro_drift=0.0,
             gravity=(0, 0, -9.81), mag_field=(0.2, 0.0, -0.4)) -> IMUSensor:
    return IMUSensor(
        body=body, mount_pos=jnp.asarray(mount_pos, jnp.float32),
        accel_noise=NoiseModel(sigma=jnp.asarray(accel_sigma),
                               drift_sigma=jnp.asarray(accel_drift)),
        gyro_noise=NoiseModel(sigma=jnp.asarray(gyro_sigma),
                              drift_sigma=jnp.asarray(gyro_drift)),
        gravity=jnp.asarray(gravity, jnp.float32),
        mag_field=jnp.asarray(mag_field, jnp.float32))


def imu_read(imu: IMUSensor, state, state_prev, h, key,
             drifts=(None, None)) -> IMUReading:
    """One IMU sample from consecutive body states (accel by differencing the
    mount-point velocity, like the reference's keyframed ChAccelerometer)."""
    b = imu.body
    q = state.q[b]

    def mount_vel(st):
        w_world = Q.qrotate(st.q[b], st.w[b])
        return st.v[b] + jnp.cross(w_world, Q.qrotate(st.q[b],
                                                      imu.mount_pos))

    a_world = (mount_vel(state) - mount_vel(state_prev)) / h
    a_proper = Q.qrotate_inv(q, a_world - imu.gravity)
    gyro = state.w[b]                       # already body-local
    mag = Q.qrotate_inv(q, imu.mag_field)

    k1, k2 = jax.random.split(key)
    d_a = jnp.zeros(3) if drifts[0] is None else drifts[0]
    d_g = jnp.zeros(3) if drifts[1] is None else drifts[1]
    accel, d_a = _apply_noise(k1, imu.accel_noise, a_proper, d_a)
    gyro, d_g = _apply_noise(k2, imu.gyro_noise, gyro, d_g)
    return IMUReading(accel=accel, gyro=gyro, mag=mag,
                      accel_drift=d_a, gyro_drift=d_g)


@pytree_dataclass
class GPSSensor:
    """Cartesian→geodetic GPS (reference ChGPSSensor + Cartesian2GPS)."""

    body: int = static_field(default=0)
    ref_lat: Array = 43.07        # deg (reference default: Madison, WI)
    ref_lon: Array = -89.4
    ref_alt: Array = 260.0
    noise: NoiseModel = None


class GPSReading(NamedTuple):
    lat: Array
    lon: Array
    alt: Array
    drift: Array


_EARTH_R = 6371000.0


def make_gps(body, ref=(43.07, -89.4, 260.0), sigma=0.0,
             drift=0.0) -> GPSSensor:
    return GPSSensor(body=body, ref_lat=jnp.asarray(ref[0]),
                     ref_lon=jnp.asarray(ref[1]), ref_alt=jnp.asarray(ref[2]),
                     noise=NoiseModel(sigma=jnp.asarray(sigma),
                                      drift_sigma=jnp.asarray(drift)))


def gps_read(gps: GPSSensor, state, key, drift=None) -> GPSReading:
    pos = state.x[gps.body]
    d0 = jnp.zeros(3) if drift is None else drift
    pos_n, d0 = _apply_noise(key, gps.noise, pos, d0)
    deg = 180.0 / jnp.pi
    lat = gps.ref_lat + deg * pos_n[1] / _EARTH_R
    lon = gps.ref_lon + deg * pos_n[0] / (
        _EARTH_R * jnp.cos(gps.ref_lat * jnp.pi / 180.0))
    alt = gps.ref_alt + pos_n[2]
    return GPSReading(lat=lat, lon=lon, alt=alt, drift=d0)


def tachometer_read(state, body: int, axis: int = 2) -> Array:
    """Shaft/wheel rotation speed about a body-local axis [rad/s]
    (reference ChTachometerSensor)."""
    return state.w[body, axis]


# ---------------------------------------------------------------------------
# ray-cast sensors (lidar / depth camera) — the GEOMETRIC part of the
# reference's OptiX sensors (ChLidarSensor / depth camera,
# /root/reference/src/chrono_sensor/sensors/ChLidarSensor.h) without the
# shading pipeline: batched ray fans against analytic shapes + triangle
# soups (chrono_tpu.collision.ray), fully jittable.
# ---------------------------------------------------------------------------


@pytree_dataclass
class RayScene:
    """Static-shape scene for ray sensors (None = family absent)."""

    tri_v0: Array = None     # (T,3)
    tri_v1: Array = None
    tri_v2: Array = None
    sph_c: Array = None      # (S,3)
    sph_r: Array = None
    box_c: Array = None      # (B,3)
    box_R: Array = None      # (B,3,3)
    box_h: Array = None
    pln_p: Array = None      # (P,3)
    pln_n: Array = None


def ray_scene_cast(scene: RayScene, origins, dirs):
    """(t, n) against every populated family of the scene."""
    from chrono_tpu.collision import ray as _ray

    hits = []
    if scene.tri_v0 is not None:
        hits.append(_ray.ray_triangles(origins, dirs, scene.tri_v0,
                                       scene.tri_v1, scene.tri_v2))
    if scene.sph_c is not None:
        hits.append(_ray.ray_spheres(origins, dirs, scene.sph_c, scene.sph_r))
    if scene.box_c is not None:
        hits.append(_ray.ray_boxes(origins, dirs, scene.box_c, scene.box_R,
                                   scene.box_h))
    if scene.pln_p is not None:
        hits.append(_ray.ray_planes(origins, dirs, scene.pln_p, scene.pln_n))
    if not hits:
        raise ValueError("empty RayScene")
    return _ray.combine(*hits) if len(hits) > 1 else hits[0]


def lidar_scan(scene: RayScene, pose_x, pose_q, *, n_horizontal=360,
               n_vertical=16, fov_vertical=(-0.26, 0.26), max_range=100.0):
    """Spinning-lidar range image (n_vertical, n_horizontal) [m] from a body
    pose (reference ChLidarSensor parameters hfov=2π, channels, vfov)."""
    az = jnp.linspace(-jnp.pi, jnp.pi, n_horizontal, endpoint=False)
    el = jnp.linspace(fov_vertical[0], fov_vertical[1], n_vertical)
    A, E = jnp.meshgrid(az, el)
    d_loc = jnp.stack([jnp.cos(E) * jnp.cos(A), jnp.cos(E) * jnp.sin(A),
                       jnp.sin(E)], axis=-1).reshape(-1, 3)
    d_world = Q.qrotate(pose_q[None, :], d_loc)
    o = jnp.broadcast_to(pose_x, d_world.shape)
    t, _ = ray_scene_cast(scene, o, d_world)
    return jnp.minimum(t, max_range).reshape(n_vertical, n_horizontal)


def depth_image(scene: RayScene, pose_x, pose_q, *, width=64, height=48,
                hfov=1.2, max_range=100.0):
    """Pinhole depth camera (height, width) [m along ray].  Camera looks
    along body +x, image x → body −y, image y → body −z (the reference's
    camera convention)."""
    f = 0.5 * width / jnp.tan(0.5 * hfov)
    xs = (jnp.arange(width) - (width - 1) / 2.0) / f
    ys = (jnp.arange(height) - (height - 1) / 2.0) / f
    U, V = jnp.meshgrid(xs, ys)
    d_loc = jnp.stack([jnp.ones_like(U), -U, -V], axis=-1).reshape(-1, 3)
    d_loc = d_loc / jnp.linalg.norm(d_loc, axis=-1, keepdims=True)
    d_world = Q.qrotate(pose_q[None, :], d_loc)
    o = jnp.broadcast_to(pose_x, d_world.shape)
    t, _ = ray_scene_cast(scene, o, d_world)
    return jnp.minimum(t, max_range).reshape(height, width)
