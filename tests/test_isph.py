"""ISPH (implicit pressure projection) validation.

Oracles: transient analytic Poiseuille profile (the reference's FSI test,
utest_FSI-SPH_Poiseuille_flow.cpp) reached at a dt far above the acoustic CFL
bound that limits WCSPH, and hydrostatic pressure recovery from the PPE.
"""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.fsi.sph import SPHParams, make_sph_state, FLUID
from chrono_tpu.fsi.sph.isph import (
    make_isph_advance_fn, isph_substep, suggest_isph_dt,
)
from chrono_tpu.fsi.sph.system import (
    rebuild_sph_neighbors, suggest_sph_dt,
)
from chrono_tpu.utils.samplers import grid_sample_box


def _poiseuille_setup(dt):
    d0 = 0.05 / 10
    L = 0.05
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1000.0), mu=jnp.asarray(0.1),
        c_s=jnp.asarray(1.0), gravity=jnp.asarray([1e-3, 0.0, 0.0]),
        dt=jnp.asarray(dt), viscosity_model="laminar",
        max_neighbors=96, max_per_cell=80, rebuild_every=4,
        xsph_eps=0.1,
    )
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
    return params, grid, state, L


def test_isph_poiseuille_large_dt():
    """Transient profile matches the series solution at a dt ~8x above the
    WCSPH acoustic bound (c_s = 1 here; real water c_s makes the gap larger)."""
    probe = _poiseuille_setup(1e-4)[0]
    dt_wcsph = suggest_sph_dt(probe)          # acoustic-bound dt
    dt = float(suggest_isph_dt(probe, v_max=0.05))
    assert dt > 5.0 * dt_wcsph, (dt, dt_wcsph)

    params, grid, state, L = _poiseuille_setup(dt)
    adv = make_isph_advance_fn(params, grid)
    t_target = 2.0
    cyc = int(t_target / (dt * params.rebuild_every))
    state, overflow, iters = adv(state, cyc)
    assert int(overflow) == 0
    t = float(state.time)

    rho0, mu, F = 1000.0, 0.1, 1e-3
    nu = mu / rho0
    z = np.linspace(0, L, 200)
    v = F / (2 * nu) * z * (L - z)
    for n in range(0, 60):
        k = (2 * n + 1) * np.pi / L
        v -= (4 * F * L**2 / (nu * np.pi**3 * (2 * n + 1) ** 3)
              * np.sin(k * z) * np.exp(-nu * k * k * t))

    kind = np.asarray(state.kind)
    zf = np.asarray(state.pos[:, 2])[kind == FLUID]
    vx = np.asarray(state.vel[:, 0])[kind == FLUID]
    v_interp = np.interp(zf, z, v)
    v_max = v.max()
    err = np.abs(vx - v_interp) / v_max
    assert err.mean() < 0.05, f"mean rel velocity err {err.mean():.4f}"
    assert abs(vx.max() / v_max - 1.0) < 0.1


def test_isph_hydrostatic_pressure():
    """PPE recovers p ≈ ρ g (H − z) in a standing column (periodic x/y)."""
    d0 = 0.02
    nz = 15
    H = nz * d0
    W = 6 * d0
    # high viscosity damps the initial surface transient quickly so the
    # column reaches hydrostatic equilibrium within the test budget
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1000.0), mu=jnp.asarray(0.5),
        c_s=jnp.asarray(10.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(2e-4), viscosity_model="laminar",
        max_neighbors=96, max_per_cell=80, rebuild_every=4,
    )
    fluid = grid_sample_box((0, 0, 0), (W, W, H), d0)
    floor = grid_sample_box((0, 0, -3 * d0), (W, W, 0), d0)
    cell = W / 3
    grid = GridSpec(origin=(0.0, 0.0, -4 * d0), cell_size=cell,
                    dims=(3, 3, int(np.ceil((H + 8 * d0) / cell)) + 1),
                    periodic=(True, True, False))
    state = make_sph_state(params, fluid, boundary_pts=floor)

    # settle to equilibrium, then inspect the PPE pressure of one substep
    adv = make_isph_advance_fn(params, grid)
    state, overflow, _ = adv(state, 200)
    assert int(overflow) == 0
    assert float(jnp.abs(state.vel).max()) < 0.02  # settled
    state = rebuild_sph_neighbors(params, grid, state)
    _, p, iters = isph_substep(params, grid, state)

    kind = np.asarray(state.kind)
    zf = np.asarray(state.pos[:, 2])[kind == FLUID]
    pf = np.asarray(p)[kind == FLUID]
    # compare interior band (surface + floor layers excluded)
    band = (zf > 3 * d0) & (zf < H - 3 * d0)
    p_ref = 1000.0 * 9.81 * (H - zf)
    err = np.abs(pf[band] - p_ref[band]) / (1000.0 * 9.81 * H)
    assert err.mean() < 0.1, f"mean rel pressure err {err.mean():.3f}"
    # velocities must stay near zero (no spurious currents)
    vf = np.asarray(state.vel)[kind == FLUID]
    assert np.abs(vf).max() < 0.15 * np.sqrt(9.81 * H)


def test_isph_fsi_buoyancy():
    """ISPH-coupled rigid FSI: a half-density block floats (Archimedes) with
    the implicit scheme (reference IMPLICIT_SPH + BCE reduction path)."""
    import sys
    sys.path.insert(0, "tests")
    from test_fsi import floating_block_setup
    from chrono_tpu.fsi.system import FSIState, make_fsi_advance_fn

    model, params, grid, fsi0, z0, H, side = floating_block_setup(500.0)
    # implicit scheme at a dt above the acoustic bound
    params = params.replace(dt=jnp.asarray(3.0 * float(params.dt)))
    adv = make_fsi_advance_fn(model, params, grid, n_fluid_substeps=4,
                              scheme="isph")
    state = fsi0
    for _ in range(30):
        state = adv(state, 10)
    z = float(state.bodies.x[1, 2])
    assert np.isfinite(np.asarray(state.fluid.pos)).all()
    # floats: stays in the upper half of the water column, doesn't sink
    assert z > 0.5 * H, f"block sank with ISPH coupling: z={z:.3f}"


def test_bicgstab_matches_cg():
    """The BiCGStab solver option (reference SphLinearSolverBiCGStab role)
    reproduces the CG velocity field on the Poiseuille startup."""
    from chrono_tpu.fsi.sph.isph import suggest_isph_dt

    dt = float(suggest_isph_dt(_poiseuille_setup(1e-4)[0], v_max=0.05))
    params, grid, state, L = _poiseuille_setup(dt)
    adv_cg = make_isph_advance_fn(params, grid)
    adv_bi = make_isph_advance_fn(params, grid, linear_solver="bicgstab")
    cyc = int(0.3 / (dt * params.rebuild_every))
    st_cg, ov1, _ = adv_cg(state, cyc)
    st_bi, ov2, _ = adv_bi(state, cyc)
    assert int(ov1) == 0 and int(ov2) == 0
    v1 = np.asarray(st_cg.vel[:, 0])
    v2 = np.asarray(st_bi.vel[:, 0])
    scale = max(np.abs(v1).max(), 1e-9)
    assert np.abs(v1 - v2).max() / scale < 5e-3
