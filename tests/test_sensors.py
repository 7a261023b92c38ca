"""Dynamic sensors (IMU/GPS/tachometer) vs analytic motion.

Role of the reference's sensor unit tests for non-render sensors
(chrono_sensor dynamic sensors + noise models)."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.physics.body import BodyState
from chrono_tpu.sensors import (
    make_imu, imu_read, make_gps, gps_read, tachometer_read,
)


def _state(x=(0, 0, 0), q=(1, 0, 0, 0), v=(0, 0, 0), w=(0, 0, 0)):
    return BodyState(x=jnp.asarray([x], jnp.float32),
                     q=jnp.asarray([q], jnp.float32),
                     v=jnp.asarray([v], jnp.float32),
                     w=jnp.asarray([w], jnp.float32))


def test_imu_at_rest_reads_minus_gravity():
    imu = make_imu(0)
    st = _state()
    r = imu_read(imu, st, st, 1e-3, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(r.accel), [0, 0, 9.81], atol=1e-5)
    np.testing.assert_allclose(np.asarray(r.gyro), 0.0, atol=1e-7)


def test_imu_centripetal_on_spinning_body():
    """Mount at lever r on a body spinning at ω about z: proper accel =
    −ω²r (centripetal) + g reaction, in the sensor frame."""
    w = 4.0
    imu = make_imu(0, mount_pos=(0.5, 0, 0))
    st0 = _state(w=(0, 0, w))
    # centripetal: mount velocity rotates; emulate two states dt apart
    h = 1e-4
    q1 = np.array([np.cos(w * h / 2), 0, 0, np.sin(w * h / 2)])
    st1 = _state(q=tuple(q1), w=(0, 0, w))
    r = imu_read(imu, st1, st0, h, jax.random.PRNGKey(0))
    a = np.asarray(r.accel)
    np.testing.assert_allclose(a[0], -w * w * 0.5, rtol=2e-2)
    np.testing.assert_allclose(a[2], 9.81, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r.gyro), [0, 0, w], atol=1e-6)


def test_imu_noise_statistics():
    imu = make_imu(0, accel_sigma=0.2)
    st = _state()
    keys = jax.random.split(jax.random.PRNGKey(1), 500)
    reads = jax.vmap(lambda k: imu_read(imu, st, st, 1e-3, k).accel)(keys)
    a = np.asarray(reads)
    assert abs(a[:, 0].std() - 0.2) < 0.03
    assert abs(a[:, 2].mean() - 9.81) < 0.05


def test_gps_maps_cartesian_offsets():
    gps = make_gps(0, ref=(43.0, -89.0, 200.0))
    st = _state(x=(1000.0, 2000.0, 50.0))
    r = gps_read(gps, st, jax.random.PRNGKey(0))
    assert float(r.lat) > 43.0            # +y → north
    assert float(r.lon) > -89.0           # +x → east
    np.testing.assert_allclose(float(r.alt), 250.0, atol=1e-3)
    # meter-scale sanity: 2000 m north ≈ 0.018°
    np.testing.assert_allclose(float(r.lat) - 43.0, 0.01798, rtol=1e-3)


def test_tachometer():
    st = _state(w=(0.1, 7.5, 0.2))
    np.testing.assert_allclose(float(tachometer_read(st, 0, axis=1)), 7.5)
