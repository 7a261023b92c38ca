"""OpenCRG road parser + queries vs the reference's shipped .crg files."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

CRG_DIR = "/root/reference/data/vehicle/terrain/crg_roads"

pytestmark = pytest.mark.skipif(not os.path.isdir(CRG_DIR),
                                reason="reference crg data not available")


def _load(name):
    from chrono_tpu.vehicle.crg import load_crg
    return load_crg(os.path.join(CRG_DIR, name))


def test_circle_geometry():
    """circle_50m_left.crg: the KRBI-binary φ channel integrates to a closed
    ~50 m-radius counter-clockwise circle."""
    road = _load("circle_50m_left.crg")
    cx = np.asarray(road.cx)
    cy = np.asarray(road.cy)
    # closes on itself
    gap = np.hypot(cx[-1] - cx[0], cy[-1] - cy[0])
    assert gap < 1.5, gap
    # radius ≈ 50 around the centroid
    r = np.hypot(cx - cx.mean(), cy - cy.mean())
    np.testing.assert_allclose(r.mean(), 50.0, rtol=0.02)
    assert r.std() < 0.5
    # left turn: positive enclosed area (CCW)
    area = 0.5 * np.sum(cx[:-1] * cy[1:] - cx[1:] * cy[:-1])
    assert area > 0


def test_sloped_road_elevation():
    """handmade_sloped_opts.crg (LRFI text): reference-line z is the slope
    integral; the central long-section bump rides on top."""
    from chrono_tpu.vehicle.crg import crg_height

    road = _load("handmade_sloped_opts.crg")
    cz = np.asarray(road.cz)
    # slope ramps 0→0.11→0 over 22 m, symmetric: z_end = Σ slope·du
    slopes = [0.0, 0.011, 0.022, 0.033, 0.044, 0.055, 0.066, 0.077, 0.088,
              0.099, 0.11, 0.11, 0.099, 0.088, 0.077, 0.066, 0.055, 0.044,
              0.033, 0.022, 0.011, 0.0]
    np.testing.assert_allclose(cz[-1], sum(slopes), rtol=1e-5)
    # centerline query reproduces z_ref + bump at mid-road
    xm = float(road.cx[11])
    ym = float(road.cy[11])
    z = float(crg_height(road, jnp.asarray(xm), jnp.asarray(ym)))
    np.testing.assert_allclose(z, cz[11] + 0.0222222, atol=2e-3)


def test_halfround_obstacle_height():
    """halfround_4in.crg: the transverse bump peaks at 4 in = 0.1016 m."""
    road = _load("halfround_4in.crg")
    z = np.asarray(road.z)
    np.testing.assert_allclose(z.max(), 4 * 0.0254, rtol=0.02)
    assert abs(float(road.cz[-1])) < 1e-3          # flat reference line


def test_banked_road_cross_slope():
    """handmade_banked.crg: height difference across the road equals
    v·tan(bank) at mid-road."""
    from chrono_tpu.vehicle.crg import crg_height

    road = _load("handmade_banked.crg")
    bank = np.asarray(road.bank)
    assert np.abs(bank).max() > 1e-3               # banking channel present
    i = len(bank) // 2
    ph = float(road.phi[i])
    nx, ny = -np.sin(ph), np.cos(ph)
    x0, y0 = float(road.cx[i]), float(road.cy[i])
    voff = 1.0
    zl = float(crg_height(road, jnp.asarray(x0 + voff * nx),
                          jnp.asarray(y0 + voff * ny)))
    zr = float(crg_height(road, jnp.asarray(x0 - voff * nx),
                          jnp.asarray(y0 - voff * ny)))
    expect = 2 * voff * np.tan(bank[i])
    np.testing.assert_allclose(zl - zr, expect, atol=0.05 * abs(expect) + 1e-3)


def test_heightmap_and_path_exports():
    from chrono_tpu.vehicle.crg import crg_to_heightmap, crg_path

    road = _load("halfround_4in.crg")
    path = np.asarray(crg_path(road))
    assert path.shape[1] == 2 and np.isfinite(path).all()
    # the bump sits mid-road (u ≈ 50 m on the 100 m course)
    xs, ys, Z = crg_to_heightmap(road, (45.0, -2.0), (55.0, 2.0), 0.05)
    assert Z.shape == (len(xs), len(ys))
    assert np.isfinite(Z).all()
    np.testing.assert_allclose(Z.max(), 4 * 0.0254, rtol=0.05)
