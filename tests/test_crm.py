"""CRM granular-continuum tests: plasticity projection identities + column
behavior (short column stands, tall column collapses — the granular analogue
of the reference's CRM terrain validation)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.fsi.sph import (
    SPHParams, make_sph_state, suggest_sph_dt,
    CRMParams, make_crm_state, make_crm_advance_fn, drucker_prager_return,
    lithostatic_init,
)
from chrono_tpu.utils.samplers import grid_sample_box


class TestDruckerPrager:
    def test_inside_cone_unchanged(self):
        p = CRMParams(friction_angle=jnp.asarray(0.6))
        # hydrostatic compression, tiny shear: inside the cone
        s = jnp.asarray([[[-1000.0, 10.0, 0.0],
                          [10.0, -1000.0, 0.0],
                          [0.0, 0.0, -1000.0]]])
        out = drucker_prager_return(s, p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(s), rtol=1e-5)

    def test_over_yield_scaled(self):
        p = CRMParams(friction_angle=jnp.asarray(0.6),
                      cohesion=jnp.asarray(0.0))
        s = jnp.asarray([[[-100.0, 500.0, 0.0],
                          [500.0, -100.0, 0.0],
                          [0.0, 0.0, -100.0]]])
        out = np.asarray(drucker_prager_return(s, p))[0]
        # pressure preserved, deviator shrunk onto the cone
        np.testing.assert_allclose(np.trace(out), -300.0, rtol=1e-4)
        dev = out + 100.0 * np.eye(3)
        J2 = 0.5 * np.sum(dev * dev)
        alpha = 0.6 / np.sqrt(9 + 3 * 0.36)
        np.testing.assert_allclose(np.sqrt(J2), alpha * 100.0, rtol=1e-3)

    def test_tension_cutoff(self):
        p = CRMParams(friction_angle=jnp.asarray(0.6),
                      cohesion=jnp.asarray(0.0))
        s = jnp.asarray([[np.eye(3) * 500.0]])[0]  # pure tension
        out = np.asarray(drucker_prager_return(s, p))[0]
        np.testing.assert_allclose(out, 0.0, atol=1e-3)


def column_setup(aspect, d0=0.01, width=0.08, cohesion=0.0):
    """A granular column of given height/width aspect on a floor."""
    H = aspect * width
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1600.0), mu=jnp.asarray(0.0),
        c_s=jnp.asarray(30.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), alpha_visc=jnp.asarray(0.1),
        max_neighbors=96, max_per_cell=80, rebuild_every=4,
    )
    crm = CRMParams(youngs=jnp.asarray(2e6), poisson=jnp.asarray(0.3),
                    friction_angle=jnp.asarray(0.7),
                    cohesion=jnp.asarray(cohesion))
    L = 0.5   # domain length in x
    col = grid_sample_box((0.01, 0.0, 0.0), (0.01 + width, width, H), d0)
    floor = grid_sample_box((-0.0, 0.0, -3 * d0), (L, width, 0.0), d0)
    # side walls at x=0 keep collapse one-directional? keep open both sides
    state0 = make_sph_state(params, col, boundary_pts=floor)
    nyc = 3
    cell = width / nyc * 3
    grid = GridSpec(origin=(-0.05, 0.0, -5 * d0), cell_size=2.5 * 1.2 * d0,
                    dims=(int(np.ceil((L + 0.1) / (2.5 * 1.2 * d0))),
                          max(nyc, int(np.ceil(width / (2.5 * 1.2 * d0)))),
                          int(np.ceil((2 * H + 6 * d0) / (2.5 * 1.2 * d0))) + 1),
                    periodic=(False, True, False))
    # periodic y needs exact length: rebuild with cell = width/n
    n_y = max(int(round(width / (2.5 * 1.2 * d0))), 3)
    cs = width / n_y
    grid = GridSpec(origin=(-0.05, 0.0, -5 * d0), cell_size=cs,
                    dims=(int(np.ceil((L + 0.1) / cs)), n_y,
                          int(np.ceil((2 * H + 6 * d0) / cs)) + 1),
                    periodic=(False, True, False))
    st = lithostatic_init(make_crm_state(state0), params, crm, H)
    return params, crm, grid, st, H, width


class TestColumn:
    def test_short_column_stands(self):
        # a cohesive squat column is statically stable (cohesionless material
        # always slumps its sharp edges to the repose angle, so use c > ρgH)
        params, crm, grid, state, H, width = column_setup(aspect=0.5,
                                                          cohesion=800.0)
        adv = make_crm_advance_fn(params, crm, grid)
        n = int(0.15 / (float(params.dt) * params.rebuild_every))
        state, ov = adv(state, n)
        assert int(ov) == 0
        g = np.asarray(state.kind) == 0
        x = np.asarray(state.pos)[g]
        # a squat frictional column barely spreads: runout < 1.6 x half-width
        assert x[:, 0].max() < 0.01 + width * 1.9, f"xmax={x[:,0].max():.3f}"
        # height mostly retained
        assert x[:, 2].max() > 0.6 * H
        assert np.abs(np.asarray(state.vel)[g]).max() < 0.5

    def test_tall_column_collapses(self):
        params, crm, grid, state, H, width = column_setup(aspect=3.0)
        adv = make_crm_advance_fn(params, crm, grid)
        n = int(0.3 / (float(params.dt) * params.rebuild_every))
        state, ov = adv(state, n)
        g = np.asarray(state.kind) == 0
        x = np.asarray(state.pos)[g]
        # tall column must flow out significantly but remain a finite pile
        assert x[:, 0].max() > 0.01 + width * 2.0, "tall column failed to flow"
        assert x[:, 2].max() < 0.8 * H, "tall column failed to collapse"
        assert np.isfinite(x).all()


# ---------------- symmetric pencil CRM engine ----------------


@pytest.mark.parametrize("layout", ["pencil", "flat", "dual"])
def test_crm_pencil_substep_parity(layout):
    """One elastoplastic substep on the pencil engine (two symmetric
    Pallas sweeps, interpret mode) == the gather crm_step, including the
    stress update, plastic return and the mixed-pair boundary penalty —
    on ALL lane layouts (pencil, flat, and the two-tier dual-field flat
    engine, ops.pallas.flatlane_dual_kernel)."""
    from chrono_tpu.dem.neighbors import build_neighbor_list
    from chrono_tpu.fsi.sph.crm import crm_step, crm_forces
    from chrono_tpu.fsi.sph.system import KERNELS
    from chrono_tpu.fsi.sph.crm_pencil import (
        make_crm_substeps_pencil, make_crm_substeps_dual,
    )

    d0 = 0.01
    width, H = 0.08, 0.08
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1600.0), mu=jnp.asarray(0.0),
        c_s=jnp.asarray(30.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), alpha_visc=jnp.asarray(0.1),
        max_neighbors=96, max_per_cell=80, rebuild_every=4,
    )
    crm = CRMParams(youngs=jnp.asarray(2e6), poisson=jnp.asarray(0.3),
                    friction_angle=jnp.asarray(0.7),
                    cohesion=jnp.asarray(0.0))
    col = grid_sample_box((0.05, 0.02, 0.0), (0.05 + width, 0.02 + width, H),
                          d0)
    floor = grid_sample_box((0.02, 0.0, -3 * d0), (0.2, 0.12, 0.0), d0)
    state0 = make_sph_state(params, col, boundary_pts=floor)
    cs = 2.5 * 1.2 * d0
    grid = GridSpec(origin=(0.0, -0.02, -5 * d0), cell_size=cs,
                    dims=(int(np.ceil(0.24 / cs)), int(np.ceil(0.17 / cs)),
                          int(np.ceil((1.5 * H + 8 * d0) / cs))))
    st = make_crm_state(state0)
    st = lithostatic_init(st, params, crm, surface_z=H)
    # a short settle on the gather engine gives nonzero velocities/stresses
    adv = make_crm_advance_fn(params, crm, grid)
    st, ov = adv(st, 2)
    assert int(ov) == 0

    support = KERNELS[params.kernel][2]
    nbr = build_neighbor_list(grid, st.pos, support * float(params.h),
                              params.max_per_cell, params.max_neighbors)
    ref = crm_step(params, crm, grid, st.replace(nbr=nbr))
    dv_ref = crm_forces(params, crm, grid, ref.replace(nbr=nbr))

    if layout == "dual":
        # CA = 8 forces real spill: the settled column cells hold ~15
        # markers, so field B is genuinely populated and every cross-sweep
        # family (A-B self cell, A-B forward, B-A forward, B-B) is hit
        subs = make_crm_substeps_dual(params, crm, grid, CA=8, CB=24,
                                      Bxy=2, interpret=True)
    else:
        subs = make_crm_substeps_pencil(params, crm, grid, capacity=32,
                                        Bxy=2, interpret=True,
                                        layout=layout)
    got, dv, ovf = subs(st, 1)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=1e-6, atol=1e-7)
    v_scale = max(float(jnp.abs(ref.vel).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=3e-5 * v_scale)
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(ref.rho),
                               rtol=2e-5, atol=1e-2)
    s_scale = max(float(jnp.abs(ref.tau_d).max()), 1.0)
    np.testing.assert_allclose(np.asarray(got.tau_d), np.asarray(ref.tau_d),
                               rtol=1e-4, atol=2e-4 * s_scale)
    np.testing.assert_allclose(np.asarray(got.tau_o), np.asarray(ref.tau_o),
                               rtol=1e-4, atol=2e-4 * s_scale)
    # the granular reaction used for the BCE reduction (note: the pencil dv
    # is evaluated at the stepped state, matching crm_fsi_step's usage)
    # compare where either is non-negligible
    a_scale = max(float(jnp.abs(dv_ref).max()), 1e-6)
    # rebuild neighbors at the stepped state for the reference dv
    nbr2 = build_neighbor_list(grid, ref.pos, support * float(params.h),
                               params.max_per_cell, params.max_neighbors)
    dv_ref2 = crm_forces(params, crm, grid, ref.replace(nbr=nbr2))
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref2),
                               rtol=1e-4, atol=5e-5 * a_scale)


def test_crm_whole_outer_parity():
    """The whole-outer fused kernel (ops.pallas.crm_outer_kernel — the full
    substep loop in ONE pallas call, planes VMEM-resident) matches running
    the per-sweep dual engine substep-by-substep on the same binned planes,
    including the dv_mode="last" acceleration planes."""
    from chrono_tpu.fsi.sph.crm_pencil import make_crm_dual_engine

    d0 = 0.01
    width, H = 0.08, 0.08
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1600.0), mu=jnp.asarray(0.0),
        c_s=jnp.asarray(30.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), alpha_visc=jnp.asarray(0.1),
        max_neighbors=96, max_per_cell=80, rebuild_every=4,
    )
    crm = CRMParams(youngs=jnp.asarray(2e6), poisson=jnp.asarray(0.3),
                    friction_angle=jnp.asarray(0.7),
                    cohesion=jnp.asarray(0.0))
    col = grid_sample_box((0.05, 0.02, 0.0),
                          (0.05 + width, 0.02 + width, H), d0)
    floor = grid_sample_box((0.02, 0.0, -3 * d0), (0.2, 0.12, 0.0), d0)
    state0 = make_sph_state(params, col, boundary_pts=floor)
    cs = 2.5 * 1.2 * d0
    grid = GridSpec(origin=(0.0, -0.02, -5 * d0), cell_size=cs,
                    dims=(int(np.ceil(0.24 / cs)), int(np.ceil(0.17 / cs)),
                          int(np.ceil((1.5 * H + 8 * d0) / cs))))
    st = make_crm_state(state0)
    st = lithostatic_init(st, params, crm, surface_z=H)
    adv = make_crm_advance_fn(params, crm, grid)
    st, ov = adv(st, 2)
    assert int(ov) == 0

    # CA=8 forces real spill so all four pair families are exercised
    eng = make_crm_dual_engine(params, crm, grid, CA=8, CB=24, Bxy=2,
                               interpret=True)
    feat, aux, perm, ovf = eng["bin"](st, ())
    assert int(ovf) == 0

    n_sub = 3
    f_ref = feat
    for _ in range(n_sub - 1):
        f_ref = eng["substep"](f_ref)
    f_ref, acc_ref = eng["substep_acc"](f_ref)

    f_got, acc_got = eng["outer"](feat, n_sub)

    for side in range(2):
        val = np.asarray(feat[side][:, 15:16]) > 0
        ref = np.asarray(f_ref[side])
        got = np.asarray(f_got[side])
        scale = np.abs(ref).max(axis=(0, 2, 3), keepdims=True) + 1e-9
        np.testing.assert_allclose((got * val) / scale, (ref * val) / scale,
                                   atol=2e-5)
        ar = np.asarray(acc_ref[side])
        ag = np.asarray(acc_got[side])
        a_scale = np.abs(ar).max() + 1e-9
        val3 = val[:, 0:1]
        np.testing.assert_allclose(ag * val3 / a_scale, ar * val3 / a_scale,
                                   atol=2e-5)
