"""MPM particle container (ChParticleContainer role): physics fixtures in
the spirit of the reference multicore container tests."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.mpm import (MPMParams, make_mpm_state, make_mpm_step,
                            lame_from_E_nu)


def _block(lo, hi, spacing, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    axes = [np.arange(lo[i] + spacing / 2, hi[i], spacing) for i in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    return g + rng.uniform(-jitter, jitter, g.shape) * spacing


def _params(E=1.4e5, nu=0.2, dx=0.05, dt=2e-4, rho=400.0, plastic=True):
    mu, lam = lame_from_E_nu(E, nu)
    vol = (dx / 2) ** 3
    return MPMParams(dx=jnp.asarray(dx), dt=jnp.asarray(dt),
                     particle_mass=jnp.asarray(rho * vol),
                     particle_volume=jnp.asarray(vol),
                     lame_mu=jnp.asarray(mu), lame_lambda=jnp.asarray(lam),
                     plastic=plastic)


def test_free_fall_conserves_momentum_shape():
    """No contact: block in free fall follows g exactly; F stays identity."""
    p = _params()
    pts = _block((0.5, 0.5, 1.0), (0.75, 0.75, 1.25), 0.05)
    st = make_mpm_state(pts)
    step, advance = make_mpm_step(p, (32, 32, 48))
    n = 50
    st2 = advance(st, n)
    t = n * float(p.dt)
    vz = np.asarray(st2.v[:, 2])
    np.testing.assert_allclose(vz, -9.81 * t, rtol=2e-3)
    # rigid translation: no deformation
    F = np.asarray(st2.F)
    np.testing.assert_allclose(F, np.broadcast_to(np.eye(3), F.shape),
                               atol=1e-4)


def test_elastic_block_bounded_and_cohesive():
    """Elastic block dropped on the floor: pure elasticity has no
    dissipation so it keeps ringing — assert boundedness (energy never
    exceeds the initial potential) and cohesion instead of rest."""
    p = _params(plastic=False)
    pts = _block((0.5, 0.5, 0.15), (0.85, 0.85, 0.5), 0.04, jitter=0.05)
    st = make_mpm_state(pts)
    step, advance = make_mpm_step(p, (32, 32, 32))
    n_p = len(pts)
    e_scale = n_p * float(p.particle_mass) * 9.81 * 0.55
    for _ in range(4):
        st = advance(st, 250)
        x = np.asarray(st.x)
        v = np.asarray(st.v)
        assert np.isfinite(x).all()
        ke = 0.5 * float(p.particle_mass) * float(np.sum(v * v))
        assert ke < e_scale, f"energy blow-up: KE={ke} > {e_scale}"
    zmin, zmax = x[:, 2].min(), x[:, 2].max()
    assert 0.05 < zmin < 0.25          # riding on the boundary nodes
    assert zmax - zmin > 0.25          # did not splat (elastic, not fluid)
    assert (x[:, 0].max() - x[:, 0].min()) < 0.6


def test_snow_compacts_permanently_vs_elastic():
    """Snow plasticity (θ clamps + hardening): the impacted column compacts
    PERMANENTLY — its final height stays below the elastic column's (which
    recovers), and J_p records the compression."""
    zmax = {}
    jp_min = {}
    for plastic in (False, True):
        p = _params(E=4e4, plastic=plastic)
        pts = _block((0.7, 0.7, 0.15), (0.9, 0.9, 0.7), 0.028, jitter=0.05,
                     seed=3)
        st = make_mpm_state(pts)
        step, advance = make_mpm_step(p, (32, 32, 32))
        st = advance(st, 1600)
        x = np.asarray(st.x)
        assert np.isfinite(x).all()
        zmax[plastic] = float(x[:, 2].max())
        jp_min[plastic] = float(np.min(np.asarray(st.Jp)))
    assert zmax[True] < 0.95 * zmax[False], (zmax, jp_min)
    assert jp_min[True] < 0.9 and jp_min[False] == 1.0


def test_jp_bounded_and_active():
    p = _params(E=4e4, plastic=True)
    pts = _block((0.7, 0.7, 0.12), (0.9, 0.9, 0.55), 0.028, seed=5)
    st = make_mpm_state(pts)
    step, advance = make_mpm_step(p, (32, 32, 32))
    st = advance(st, 900)
    jp = np.asarray(st.Jp)
    assert np.isfinite(jp).all()
    assert (jp > 0.59).all() and (jp < 20.1).all()
    assert np.abs(jp - 1.0).max() > 1e-3     # plasticity engaged
