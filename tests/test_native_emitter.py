"""Native mesh BCE sampler + particle emitter.

Roles: ChFsiProblemSPH mesh-BCE construction (native C++ path with numpy
fallback parity) and ChParticleEmitter streams."""

import numpy as np

from chrono_tpu.native import surface_markers, get_lib
from chrono_tpu.utils.samplers import ParticleEmitter


def _cube():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
                     np.float32)
    faces = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                      [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                      [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]], np.int32)
    return verts, faces


def test_surface_markers_cover_cube():
    verts, faces = _cube()
    pts = surface_markers(verts, faces, 0.1, layers=2)
    assert len(pts) > 500
    assert pts.min() >= -1e-5 and pts.max() <= 1.0 + 1e-5
    # every marker lies within `2·spacing` of the surface (layer offsets go
    # inward)
    d_surf = np.minimum.reduce([pts[:, i] for i in range(3)]
                               + [1.0 - pts[:, i] for i in range(3)])
    assert d_surf.max() < 0.2 + 1e-5


def test_native_matches_numpy_fallback():
    verts, faces = _cube()
    native = surface_markers(verts, faces, 0.13, layers=3)
    import chrono_tpu.native as N
    saved = N._lib

    class _NoLib:
        pass

    try:
        N._lib = None
        # force the fallback by masking get_lib via module attribute
        real_get = N.get_lib
        N.get_lib = lambda: None
        fallback = N.surface_markers(verts, faces, 0.13, layers=3)
    finally:
        N.get_lib = real_get
        N._lib = saved
    assert len(native) == len(fallback)
    np.testing.assert_allclose(np.sort(native.ravel()),
                               np.sort(fallback.ravel()), atol=1e-6)


def test_emitter_rate_and_slots():
    e = ParticleEmitter((0, 0, 1), (1, 1, 1.2), rate=250.0,
                        vel_mean=(0, 0, -2), vel_sigma=0.0, seed=3)
    total = 0
    for _ in range(100):
        p, v = e.emit(0.01)
        total += len(p)
        if len(p):
            assert (p[:, 2] >= 1.0).all() and (p[:, 2] <= 1.2).all()
            np.testing.assert_allclose(v[:, 2], -2.0)
    assert total == 250  # rate · 1 s, fractional carry preserved


def test_mixture_generator_ratios_and_distributions():
    import numpy as np
    from chrono_tpu.utils.samplers import (MixtureIngredient,
                                           generate_mixture, grid_sample_box)

    pts = grid_sample_box((0, 0, 0), (1, 1, 1), 0.05)
    mix = generate_mixture(pts, [
        MixtureIngredient(ratio=3.0, radius=(0.01, 0.002), density=2500.0),
        MixtureIngredient(ratio=1.0, radius=0.02, density=7800.0, mu=0.8),
    ], seed=1)
    n = len(pts)
    frac = (mix["which"] == 0).mean()
    assert 0.68 < frac < 0.82                      # 3:1 ratio
    r0 = mix["radius"][mix["which"] == 0]
    assert 0.001 < r0.std() < 0.0025           # distributed radii (trunc normal)
    assert np.allclose(mix["radius"][mix["which"] == 1], 0.02)
    assert np.allclose(mix["mu"][mix["which"] == 1], 0.8)
    m = mix["mass"]
    assert np.all(m > 0) and len(m) == n
    # steel spheres heavier than glass at same radius scale
    assert m[mix["which"] == 1].mean() > m[mix["which"] == 0].mean()
