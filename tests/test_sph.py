"""SPH validation tests: kernel identities, hydrostatic tank, transient
Poiseuille flow vs the analytic series (the reference's quantitative oracle,
utest_FSI-SPH_Poiseuille_flow.cpp, v_tolerance 5e-3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.fsi.sph import (
    SPHParams, make_sph_state, make_sph_advance_fn, suggest_sph_dt,
    tait_pressure, FLUID,
)
from chrono_tpu.fsi.sph.kernels import KERNELS
from chrono_tpu.utils.samplers import grid_sample_box
from chrono_tpu.fsi.bce import box_wall_markers


class TestKernels:
    @pytest.mark.parametrize("name", ["cubic", "wendland", "quintic"])
    def test_normalization(self, name):
        # ∫ W dV = 1 over the support
        w_fn, dw_fn, support = KERNELS[name]
        h = 1.0
        L = support * h
        n = 40
        xs = np.linspace(-L, L, n, endpoint=False) + L / n
        g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
        r = jnp.asarray(np.linalg.norm(g, axis=-1))
        W = w_fn(r, h)
        integral = float(jnp.sum(W)) * (2 * L / n) ** 3
        np.testing.assert_allclose(integral, 1.0, rtol=2e-2)

    @pytest.mark.parametrize("name", ["cubic", "wendland", "quintic"])
    def test_gradient_consistency(self, name):
        w_fn, dw_fn, support = KERNELS[name]
        h = 1.0
        r = jnp.linspace(0.05, support * h * 0.99, 50)
        # fp32 central difference: step large enough to dominate rounding noise
        num = (w_fn(r + 1e-3, h) - w_fn(r - 1e-3, h)) / 2e-3
        np.testing.assert_allclose(np.asarray(dw_fn(r, h)), np.asarray(num),
                                   rtol=2e-2, atol=1e-3)

    def test_compact_support(self):
        for name, (w_fn, dw_fn, support) in KERNELS.items():
            assert float(w_fn(jnp.asarray(support + 0.01), 1.0)) == 0.0
            assert float(dw_fn(jnp.asarray(support + 0.01), 1.0)) == 0.0


def hydrostatic_setup(nx=10, nz=20, d0=0.02):
    """Water column in a box with periodic x/y: analytic p = ρ g (H − z)."""
    H = nz * d0
    W = nx * d0
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1000.0), mu=jnp.asarray(0.05),
        c_s=jnp.asarray(20.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), viscosity_model="laminar",
        max_neighbors=96, max_per_cell=80, rebuild_every=4,
        integrator="symplectic",
    )
    params = params.replace(dt=jnp.asarray(suggest_sph_dt(params)))
    fluid = grid_sample_box((0, 0, 0), (W, W, H), d0)
    # floor markers only (3 layers below z=0); periodic in x,y
    floor = grid_sample_box((0, 0, -3 * d0), (W, W, 0), d0)
    cell = 2.5 * 1.2 * d0
    grid = GridSpec(origin=(0.0, 0.0, -6 * d0), cell_size=cell,
                    dims=(max(int(np.ceil(W / cell)), 1),
                          max(int(np.ceil(W / cell)), 1),
                          int(np.ceil((2 * H + 6 * d0) / cell)) + 2),
                    periodic=(True, True, False))
    # adjust cell size so periodic lengths match the domain exactly
    nxc = max(int(round(W / cell)), 1)
    grid = GridSpec(origin=(0.0, 0.0, -6 * d0), cell_size=W / nxc,
                    dims=(nxc, nxc,
                          int(np.ceil((2 * H + 6 * d0) / (W / nxc))) + 2),
                    periodic=(True, True, False))
    state = make_sph_state(params, fluid, boundary_pts=floor)
    # start from the hydrostatic density profile (kills the startup transient):
    # p(z) = ρ0 g (H−z) → ρ = ρ0 (1 + γ p / (c² ρ0))^(1/γ)
    import jax.numpy as _jnp
    z_all = state.pos[:, 2]
    p_hydro = 1000.0 * 9.81 * _jnp.clip(H - z_all, 0.0, None)
    g = float(params.eos_gamma)
    B = float(params.c_s) ** 2 * 1000.0 / g
    rho_init = 1000.0 * (1.0 + p_hydro / B) ** (1.0 / g)
    state = state.replace(rho=_jnp.where(state.kind == 0, rho_init, state.rho))
    return params, grid, state, H


class TestHydrostatic:
    def test_pressure_profile(self):
        params, grid, state, H = hydrostatic_setup()
        adv = make_sph_advance_fn(params, grid)
        n_cycles = int(0.5 / (float(params.dt) * params.rebuild_every))
        state, overflow = adv(state, n_cycles)
        assert int(overflow) == 0
        kind = np.asarray(state.kind)
        z = np.asarray(state.pos[:, 2])[kind == 0]
        p = np.asarray(tait_pressure(params, state.rho))[kind == 0]
        rho_g = 1000.0 * 9.81
        # compare in the bulk (away from free surface and floor)
        sel = (z > 0.2 * H) & (z < 0.7 * H)
        p_expect = rho_g * (H - z[sel])
        err = np.abs(p[sel] - p_expect) / (rho_g * H)
        assert err.mean() < 0.05, f"mean rel pressure err {err.mean():.3f}"
        # fluid must not have collapsed or exploded
        assert z.max() < 1.3 * H and z.min() > -0.01


class TestPoiseuille:
    def test_transient_profile(self):
        """Body-force-driven flow between plates at z=0, z=L; compare the
        centerline-normalized transient velocity profile to the series
        solution (same oracle as the reference's Poiseuille unit test)."""
        d0 = 0.05 / 10  # 10 particles across the gap
        L = 0.05        # gap width
        rho0, mu = 1000.0, 0.1
        F = 1e-3        # body force (acceleration) along x
        params = SPHParams(
            d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
            rho0=jnp.asarray(rho0), mu=jnp.asarray(mu),
            c_s=jnp.asarray(1.0),
            gravity=jnp.asarray([F, 0.0, 0.0]),
            dt=jnp.asarray(1e-4), viscosity_model="laminar",
            max_neighbors=96, max_per_cell=80, rebuild_every=8,
            integrator="symplectic", xsph_eps=0.1,
        )
        params = params.replace(dt=jnp.asarray(suggest_sph_dt(params)))
        W = 9 * d0
        fluid = grid_sample_box((0, 0, 0), (W, W, L), d0)
        walls = np.concatenate([
            grid_sample_box((0, 0, -3 * d0), (W, W, 0), d0),
            grid_sample_box((0, 0, L), (W, W, L + 3 * d0), d0),
        ])
        nxc = 3
        cell = W / nxc
        grid = GridSpec(origin=(0.0, 0.0, -4 * d0), cell_size=cell,
                        dims=(nxc, nxc, int(np.ceil((L + 8 * d0) / cell)) + 1),
                        periodic=(True, True, False))
        state = make_sph_state(params, fluid, boundary_pts=walls)
        adv = make_sph_advance_fn(params, grid)

        t_target = 2.0  # transient, not yet steady for nu=1e-4, L=0.05
        cyc = int(t_target / (float(params.dt) * params.rebuild_every))
        state, overflow = adv(state, cyc)
        assert int(overflow) == 0
        t = float(state.time)

        # analytic transient Poiseuille series
        nu = mu / rho0
        z = np.linspace(0, L, 200)
        v = F / (2 * nu) * z * (L - z)
        for n in range(0, 60):
            k = (2 * n + 1) * np.pi / L
            v -= (4 * F * L**2 / (nu * np.pi**3 * (2 * n + 1) ** 3)
                  * np.sin(k * z) * np.exp(-nu * k * k * t))

        kind = np.asarray(state.kind)
        zf = np.asarray(state.pos[:, 2])[kind == 0]
        vx = np.asarray(state.vel[:, 0])[kind == 0]
        v_interp = np.interp(zf, z, v)
        v_max = v.max()
        err = np.abs(vx - v_interp) / v_max
        assert err.mean() < 0.05, f"mean rel velocity err {err.mean():.4f}"
        assert abs(vx.max() / v_max - 1.0) < 0.1


class TestSPHVariants:
    """Holmes wall BC, PPST shifting, adaptive dt (reference option menu:
    SphForceWCSPH.cu:819, ChFsiDefinitionsSPH.h:51, SphFluidDynamics.cu:93)."""

    def _column(self, **overrides):
        d0 = 0.02
        base = dict(
            d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
            rho0=jnp.asarray(1000.0), mu=jnp.asarray(0.05),
            c_s=jnp.asarray(20.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
            dt=jnp.asarray(1e-4), viscosity_model="laminar",
            max_neighbors=96, max_per_cell=80, rebuild_every=4,
            integrator="symplectic",
        )
        base.update(overrides)
        params = SPHParams(**base)
        W, H = 6 * d0, 0.2
        fluid = grid_sample_box((0, 0, 0), (W, W, H), d0)
        floor = grid_sample_box((0, 0, -3 * d0), (W, W, 0), d0)
        from chrono_tpu.collision.cell_list import GridSpec
        cell = W / 3
        grid = GridSpec(origin=(0, 0, -4 * d0), cell_size=cell,
                        dims=(3, 3, int(np.ceil((H + 8 * d0) / cell)) + 1),
                        periodic=(True, True, False))
        return params, grid, make_sph_state(params, fluid,
                                            boundary_pts=floor)

    @pytest.mark.parametrize("variant", [
        dict(boundary_model="holmes"),
        dict(shifting="ppst"),
        dict(shifting="none"),
    ])
    def test_column_stays_settled(self, variant):
        params, grid, state = self._column(**variant)
        adv = make_sph_advance_fn(params, grid)
        state, ovf = adv(state, 60)
        assert int(ovf) == 0
        v = np.asarray(state.vel)[np.asarray(state.kind) == FLUID]
        assert np.isfinite(v).all()
        assert np.abs(v).max() < 0.5 * np.sqrt(9.81 * 0.2)

    def test_adaptive_dt_advances_and_matches_bounds(self):
        params, grid, state = self._column()
        from chrono_tpu.fsi.sph.system import runtime_dt
        dt0 = float(runtime_dt(params, state))
        # at rest the bound is the acoustic CFL
        np.testing.assert_allclose(dt0, 0.25 * 0.024 / 20.0, rtol=1e-3)
        adv = make_sph_advance_fn(params, grid, adaptive_dt=True)
        state2, ovf = adv(state, 30)
        assert int(ovf) == 0
        assert float(state2.time) > 0     # time advanced with traced dt
        v = np.asarray(state2.vel)
        assert np.isfinite(v).all()
