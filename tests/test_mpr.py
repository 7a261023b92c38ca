"""MPR convex narrowphase vs analytic oracles.

Role of the reference's utest_MCORE_narrowphase (ChNarrowphaseMPR.cpp):
penetration depth/normal of convex pairs checked against closed forms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.collision.mpr import (
    make_shape, mpr_contact, support, SPHERE, BOX, CAPSULE, CYLINDER, HULL,
)


def test_support_functions():
    s = make_shape(SPHERE, (1, 2, 3), data=(0.5, 0, 0))
    p = np.asarray(support(s, jnp.asarray([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(p, [1, 2, 3.5], atol=1e-6)

    b = make_shape(BOX, (0, 0, 0), data=(1.0, 2.0, 3.0))
    p = np.asarray(support(b, jnp.asarray([1.0, -1.0, 1.0])))
    np.testing.assert_allclose(p, [1, -2, 3], atol=1e-6)

    c = make_shape(CYLINDER, (0, 0, 0), data=(0.5, 1.0, 0))
    p = np.asarray(support(c, jnp.asarray([1.0, 0.0, 0.5])))
    np.testing.assert_allclose(p, [0.5, 0, 1.0], atol=1e-5)

    h = make_shape(HULL, (0, 0, 0),
                   verts=[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    p = np.asarray(support(h, jnp.asarray([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(p, [0, 1, 0], atol=1e-6)


def test_sphere_sphere_depth():
    a = make_shape(SPHERE, (0, 0, 0), data=(0.5, 0, 0))
    b = make_shape(SPHERE, (0.8, 0, 0), data=(0.5, 0, 0))
    gap, n, p = mpr_contact(a, b)
    np.testing.assert_allclose(float(gap), -0.2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=2e-2)
    # witness convention: centre of the overlap band along n (here [0.3, 0.5])
    np.testing.assert_allclose(np.asarray(p)[0], 0.4, atol=3e-2)


def test_box_sphere_depth():
    a = make_shape(BOX, (0, 0, 0), data=(1.0, 1.0, 1.0))
    b = make_shape(SPHERE, (0, 0, 1.3), data=(0.5, 0, 0))
    gap, n, p = mpr_contact(a, b)
    np.testing.assert_allclose(float(gap), -0.2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=2e-2)


def test_box_box_face_contact():
    a = make_shape(BOX, (0, 0, 0), data=(1.0, 1.0, 1.0))
    b = make_shape(BOX, (0, 0, 1.9), data=(1.0, 1.0, 1.0))
    gap, n, p = mpr_contact(a, b)
    np.testing.assert_allclose(float(gap), -0.1, atol=5e-3)
    np.testing.assert_allclose(abs(float(n[2])), 1.0, atol=2e-2)


def test_cylinder_plane_like_box():
    """Cylinder standing on a big box: depth equals overlap of the flat cap."""
    ground = make_shape(BOX, (0, 0, -1.0), data=(5.0, 5.0, 1.0))
    cyl = make_shape(CYLINDER, (0, 0, 0.45), data=(0.3, 0.5, 0))
    gap, n, p = mpr_contact(ground, cyl)
    np.testing.assert_allclose(float(gap), -0.05, atol=5e-3)
    np.testing.assert_allclose(float(n[2]), 1.0, atol=2e-2)


def test_rotated_box_sphere():
    q = np.array([np.cos(np.pi / 8), 0, np.sin(np.pi / 8), 0])  # 45° about y
    a = make_shape(BOX, (0, 0, 0), rot=q, data=(1.0, 1.0, 1.0))
    # sphere approaching along the rotated face normal (world x-z diagonal)
    d = np.array([np.sin(np.pi / 4), 0, np.cos(np.pi / 4)])
    b = make_shape(SPHERE, tuple(1.2 * d), data=(0.5, 0, 0))
    gap, n, p = mpr_contact(a, b)
    np.testing.assert_allclose(float(gap), -(1.0 + 0.5 - 1.2), atol=1e-2)
    np.testing.assert_allclose(np.asarray(n), d, atol=5e-2)


def test_separated_pair_reports_positive():
    a = make_shape(SPHERE, (0, 0, 0), data=(0.5, 0, 0))
    b = make_shape(SPHERE, (2.0, 0, 0), data=(0.5, 0, 0))
    gap, n, p = mpr_contact(a, b)
    assert float(gap) > 0


def test_batched_vmap():
    import jax

    def pair(dx):
        a = make_shape(SPHERE, (0, 0, 0), data=(0.5, 0, 0))
        b = make_shape(SPHERE, (dx, 0, 0), data=(0.5, 0, 0))
        return mpr_contact(a, b)[0]

    gaps = jax.vmap(pair)(jnp.asarray([0.6, 0.8, 0.95]))
    np.testing.assert_allclose(np.asarray(gaps), [-0.4, -0.2, -0.05],
                               atol=6e-3)
