"""Bond-based peridynamics: elastic response + brittle fracture.

Role of the reference's chrono_peridynamics (ChMatterPeriBB) behaviors:
a bar stretches elastically below the critical bond stretch and BREAKS
(damage localizes, halves separate) above it."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.peridynamics import (
    make_peridynamics, make_peri_advance_fn, peri_step,
)
from chrono_tpu.utils.samplers import grid_sample_box


def _bar(nx=20, w=4, spacing=0.01, **kw):
    pts = grid_sample_box((0, 0, 0), (nx * spacing, w * spacing, w * spacing),
                          spacing)
    fixed = pts[:, 0] < 1.5 * spacing          # clamp the left end
    return make_peridynamics(pts, spacing, fixed_mask=fixed, **kw), pts


def test_elastic_stretch_recovers_modulus():
    """Static end load F on a bar: ΔL/L ≈ F/(E A) (±surface effects)."""
    E = 5e6
    (params, state), pts = _bar(youngs=E, density=1000.0, s0=1.0,
                                damping=5e3)
    spacing = 0.01
    L = pts[:, 0].max()
    A = (pts[:, 1].max() + spacing) * (pts[:, 2].max() + spacing)
    end = pts[:, 0] > L - 1.5 * spacing
    sigma = 2e4                                 # 0.4% strain target
    F_total = sigma * A
    f_ext = np.zeros_like(pts)
    f_ext[end, 0] = F_total / end.sum()
    adv = make_peri_advance_fn(params, jnp.asarray(f_ext))
    state = adv(state, 6000)                    # ring down to statics
    x_end = np.asarray(state.pos)[end, 0].mean()
    x_end0 = pts[end, 0].mean()
    strain = (x_end - x_end0) / L
    strain_ref = sigma / E
    assert 0.6 * strain_ref < strain < 1.8 * strain_ref, \
        (strain, strain_ref)
    assert float(jnp.max(state.damage)) == 0.0  # below s0: nothing broke


def test_overload_breaks_bar():
    """A pulled-apart bar fractures: damage localizes and the free end flies."""
    E = 5e6
    (params, state), pts = _bar(youngs=E, density=1000.0, s0=0.004,
                                damping=0.0)
    spacing = 0.01
    L = pts[:, 0].max()
    end = pts[:, 0] > L - 1.5 * spacing
    f_ext = np.zeros_like(pts)
    f_ext[end, 0] = 80.0 / end.sum()            # big pull
    adv = make_peri_advance_fn(params, jnp.asarray(f_ext))
    state = adv(state, 4000)
    dmg = np.asarray(state.damage)
    assert dmg.max() > 0.5, f"no fracture: max damage {dmg.max():.2f}"
    # the loaded end detached and keeps moving away
    x_end = np.asarray(state.pos)[end, 0].mean()
    assert x_end > L + 0.01
    # clamped end intact
    assert dmg[pts[:, 0] < 2 * spacing].max() < 0.4


def test_implicit_matches_explicit_statics_at_large_dt():
    """Backward-Euler peridynamics (ChMatterPeriBBimplicit role) reaches the
    same gravity-sag equilibrium as the explicit path, at 40x the dt."""
    import numpy as np
    import jax.numpy as jnp
    from chrono_tpu.peridynamics import (
        make_peridynamics, make_peri_advance_fn,
        make_peri_advance_implicit_fn)

    dx = 0.05
    pts = np.stack(np.meshgrid(np.arange(0, 0.65, dx), [0.0], [0.0],
                               indexing="ij"), -1).reshape(-1, 3)
    pts = np.concatenate([pts + [0, y, 0] for y in (0.0, dx)], axis=0)

    def build(dt):
        params, state = make_peridynamics(
            pts, dx, youngs=2e6, density=1200.0, s0=1.0, dt=dt,
            damping=8.0, gravity=(0, 0, -9.81),
            fixed_mask=(pts[:, 0] < 0.5 * dx))
        return params, state

    p_e, s_e = build(dt=5e-5)
    adv_e = make_peri_advance_fn(p_e)
    s_e = adv_e(s_e, 8000)                        # 0.4 s explicit

    p_i, s_i = build(dt=2e-3)
    adv_i = make_peri_advance_implicit_fn(p_i)
    s_i = adv_i(s_i, 200)                         # 0.4 s implicit, 40x dt
    tip_e = float(s_e.pos[:, 2].min())
    tip_i = float(s_i.pos[:, 2].min())
    assert np.isfinite(np.asarray(s_i.pos)).all()
    assert tip_e < -1e-4                           # actually sagged
    np.testing.assert_allclose(tip_i, tip_e, rtol=0.15)
