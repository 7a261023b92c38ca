"""Ray tests (ChRayTest role) + ray-cast lidar/depth sensors."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.collision import ray as R
from chrono_tpu.sensors import RayScene, lidar_scan, depth_image


def test_ray_sphere_exact():
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [5.0, 5.0, 5.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    t, n = R.ray_spheres(o, d, jnp.asarray([[3.0, 0.0, 0.0]]),
                         jnp.asarray([1.0]))
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n[0]), [-1, 0, 0], atol=1e-6)
    assert not np.isfinite(float(t[1]))      # perpendicular miss
    assert not np.isfinite(float(t[2]))      # behind/beside


def test_ray_box_oriented():
    # box rotated 45° about z, ray along x hits the rotated face
    c = np.cos(np.pi / 4)
    rot = jnp.asarray([[[c, -c, 0.0], [c, c, 0.0], [0.0, 0.0, 1.0]]])
    o = jnp.asarray([[-5.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t, n = R.ray_boxes(o, d, jnp.asarray([[0.0, 0.0, 0.0]]), rot,
                       jnp.asarray([[1.0, 1.0, 1.0]]))
    # corner of the rotated unit box is at x = −√2
    np.testing.assert_allclose(float(t[0]), 5.0 - np.sqrt(2.0), rtol=1e-5)
    assert float(n[0, 0]) < -0.5             # faces back toward the ray


def test_ray_triangle_and_plane():
    v0 = jnp.asarray([[0.0, -1.0, -1.0]])
    v1 = jnp.asarray([[0.0, 1.0, -1.0]])
    v2 = jnp.asarray([[0.0, 0.0, 1.5]])
    o = jnp.asarray([[-2.0, 0.0, 0.0], [-2.0, 0.0, 5.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    t, n = R.ray_triangles(o, d, v0, v1, v2)
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n[0]), [-1, 0, 0], atol=1e-6)
    assert not np.isfinite(float(t[1]))
    tp, _ = R.ray_planes(o, d, jnp.asarray([[3.0, 0.0, 0.0]]),
                         jnp.asarray([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(tp), [5.0, 5.0], rtol=1e-6)


def test_lidar_in_box_room():
    """Lidar at the center of a 10×6×4 room: ranges along the axes equal the
    half extents; every return finite."""
    pln_p = jnp.asarray([[5.0, 0, 0], [-5.0, 0, 0], [0, 3.0, 0],
                         [0, -3.0, 0], [0, 0, 2.0], [0, 0, -2.0]])
    pln_n = jnp.asarray([[-1.0, 0, 0], [1.0, 0, 0], [0, -1.0, 0],
                         [0, 1.0, 0], [0, 0, -1.0], [0, 0, 1.0]])
    scene = RayScene(pln_p=pln_p, pln_n=pln_n)
    img = lidar_scan(scene, jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]),
                     n_horizontal=8, n_vertical=1, fov_vertical=(0.0, 0.0))
    r = np.asarray(img)[0]
    assert np.isfinite(r).all()
    # azimuth grid starts at −π: index 0 → −x wall (5), 2 → −y (3), 4 → +x
    np.testing.assert_allclose(r[[0, 2, 4, 6]], [5.0, 3.0, 5.0, 3.0],
                               rtol=1e-5)


def test_depth_camera_sphere():
    scene = RayScene(sph_c=jnp.asarray([[4.0, 0.0, 0.0]]),
                     sph_r=jnp.asarray([1.0]),
                     pln_p=jnp.asarray([[10.0, 0.0, 0.0]]),
                     pln_n=jnp.asarray([[-1.0, 0.0, 0.0]]))
    img = depth_image(scene, jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]),
                      width=33, height=25, hfov=1.0)
    img = np.asarray(img)
    # center pixel hits the sphere front (t=3); corners the back wall
    # (10/cos of the corner obliquity — h+v half-FOV combined)
    np.testing.assert_allclose(img[12, 16], 3.0, rtol=1e-5)
    assert img[0, 0] > 9.0
    assert img.max() < 12.5
    # the sphere silhouette (depth < 4) covers a contiguous central blob
    assert (img[11:14, 15:18] < 4.0).all()
