"""Pencil-layout WCSPH kernels: parity vs the gather/neighbor-list backend
(interpret mode on CPU; compiled mode exercised on real TPU by bench_suite).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.fsi.sph.state import FLUID
from chrono_tpu.fsi.sph.system import (
    SPHParams, make_sph_state, sph_substep, rebuild_sph_neighbors,
    suggest_sph_dt,
)
from chrono_tpu.fsi.sph.pencil import (
    state_to_pencils, pencils_to_state, make_sph_advance_pencil,
)
from chrono_tpu.utils.samplers import grid_sample_box


def _mini_dam(viscosity="artificial"):
    d0 = 0.02
    W, H = 0.12, 0.12
    L = 0.24
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1000.0), mu=jnp.asarray(1e-3),
        c_s=jnp.asarray(10.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), max_neighbors=96, max_per_cell=64,
        rebuild_every=4, integrator="symplectic",
        viscosity_model=viscosity,
    )
    params = params.replace(dt=jnp.asarray(suggest_sph_dt(params)))
    fluid = grid_sample_box((0, 0, 0), (W / 2, W, H), d0)
    floors = [grid_sample_box((-3 * d0, -3 * d0, -(k + 1) * d0),
                              (L + 3 * d0, W + 3 * d0, -(k + 1) * d0), d0)
              for k in range(3)]
    state = make_sph_state(params, fluid, boundary_pts=np.concatenate(floors))
    cell = 2.0 * float(params.h)
    grid = GridSpec(origin=(-4 * d0, -4 * d0, -5 * d0), cell_size=cell,
                    dims=(int(np.ceil((L + 8 * d0) / cell)),
                          int(np.ceil((W + 8 * d0) / cell)),
                          int(np.ceil((2 * H + 9 * d0) / cell))))
    return params, grid, state


@pytest.mark.parametrize("viscosity", ["artificial", "laminar"])
def test_pencil_substep_parity(viscosity):
    """One symplectic substep: pencil sweeps == gather backend."""
    params, grid, state = _mini_dam(viscosity)
    ref = rebuild_sph_neighbors(params, grid, state)
    ref = sph_substep(params, grid, ref)

    adv = make_sph_advance_pencil(
        params.replace(rebuild_every=1), grid, capacity=32, interpret=True)
    got, ovf = adv(state, 1)
    assert int(ovf) == 0

    # same markers, same order (perm maps back to original indices)
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(ref.rho),
                               rtol=2e-5, atol=1e-3)
    v_scale = max(float(jnp.abs(ref.vel).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=2e-5 * v_scale)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=1e-6, atol=1e-7)


def test_pencil_multi_cycle_stays_physical():
    """A short dam-break run on the pencil backend: finite, bounded density,
    fluid spreads along +x, boundary markers immobile."""
    params, grid, state = _mini_dam()
    x0_max = float(state.pos[state.kind == FLUID, 0].max())
    bpos0 = np.asarray(state.pos[state.kind != FLUID])
    params = params.replace(rebuild_every=2)
    adv = make_sph_advance_pencil(params, grid, capacity=32,
                                  interpret=True)
    state, ovf = adv(state, 5)
    assert int(ovf) == 0
    assert np.isfinite(np.asarray(state.pos)).all()
    kind = np.asarray(state.kind)
    rho = np.asarray(state.rho)[kind == FLUID]
    assert rho.min() > 700.0 and rho.max() < 1500.0
    assert float(state.pos[state.kind == FLUID, 0].max()) > x0_max + 1e-5
    np.testing.assert_array_equal(np.asarray(state.pos[state.kind != FLUID]),
                                  bpos0)


def test_flat_cell_grid_parity():
    """Flat-cell PencilGrid (cell_z = h, dz ∈ ±2) reproduces the gather
    backend exactly — the C=16 slot-budget layout used on TPU."""
    from chrono_tpu.fsi.sph.pencil import PencilGrid

    params, grid, state = _mini_dam()
    ref = rebuild_sph_neighbors(params, grid, state)
    ref = sph_substep(params, grid, ref)

    lo = np.asarray(grid.origin)
    hi = lo + np.asarray(grid.dims) * grid.cell_size
    pg = PencilGrid.for_box(lo, hi, float(params.h))
    adv = make_sph_advance_pencil(
        params.replace(rebuild_every=1), pg, capacity=24, interpret=True)
    got, ovf = adv(state, 1)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(ref.rho),
                               rtol=2e-5, atol=1e-3)
    v_scale = max(float(jnp.abs(ref.vel).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=2e-5 * v_scale)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=1e-6, atol=1e-7)


# ---------------- symmetric half-stencil kernel ----------------


@pytest.mark.parametrize("viscosity,layout", [
    ("artificial", "pencil"), ("artificial", "flat"), ("laminar", "flat")])
def test_sym_substep_parity(viscosity, layout):
    """Symmetric half-stencil sweeps (each pair once, reactions through the
    rolling window) == the gather backend, including mixed fluid-solid
    viscous pairs — on both lane layouts (pencil and flat,
    ops.pallas.flatlane_kernel)."""
    params, grid, state = _mini_dam(viscosity)
    ref = rebuild_sph_neighbors(params, grid, state)
    ref = sph_substep(params, grid, ref)

    adv = make_sph_advance_pencil(
        params.replace(rebuild_every=1), grid, capacity=32, interpret=True,
        backend="sym", layout=layout)
    got, ovf = adv(state, 1)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(ref.rho),
                               rtol=2e-5, atol=1e-3)
    v_scale = max(float(jnp.abs(ref.vel).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=2e-5 * v_scale)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=1e-6, atol=1e-7)


def test_sym_flat_cells_parity():
    """Symmetric kernel on the anisotropic flat-cell grid (n_dz = 2)
    against the dense pencil path over several substeps."""
    from chrono_tpu.fsi.sph.pencil import PencilGrid

    params, grid, state = _mini_dam()
    params = params.replace(rebuild_every=3)
    lo = grid.origin
    hi = (lo[0] + grid.dims[0] * grid.cell_size,
          lo[1] + grid.dims[1] * grid.cell_size,
          lo[2] + grid.dims[2] * grid.cell_size)
    pg = PencilGrid.for_box(lo, hi, float(params.h))
    # exact-lattice fill packs 3*3*2 = 18 markers into a flat cell
    adv_d = make_sph_advance_pencil(params, pg, capacity=24,
                                    interpret=True)
    adv_s = make_sph_advance_pencil(params, pg, capacity=24,
                                    interpret=True, backend="sym")
    a, ov_a = adv_d(state, 2)
    b, ov_b = adv_s(state, 2)
    assert int(ov_a) == 0 and int(ov_b) == 0
    np.testing.assert_allclose(np.asarray(b.pos), np.asarray(a.pos),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.rho), np.asarray(a.rho),
                               rtol=1e-5, atol=2e-2)


def test_sym_c8_ring2_parity():
    """C = 8 sub-support cells (cell = 2 d0 < 2.4 d0 support, n_dxy = 2
    rings) on the flat-lane layout: the d0-lattice dam packs EXACTLY 8
    markers per 2 d0 cell (boundaries mid-gap), so the ±2-ring half
    stencil must reproduce the gather backend."""
    params, grid, state = _mini_dam()
    cell = 2.0 * float(params.d0)
    d0 = float(params.d0)
    g8 = GridSpec(origin=grid.origin, cell_size=cell,
                  dims=(int(np.ceil((0.24 + 8 * d0) / cell)),
                        int(np.ceil((0.12 + 8 * d0) / cell)),
                        int(np.ceil((0.24 + 9 * d0) / cell))))
    ref = rebuild_sph_neighbors(params, grid, state)
    ref = sph_substep(params, grid, ref)

    adv = make_sph_advance_pencil(
        params.replace(rebuild_every=1), g8, capacity=8,
        backend="sym", layout="flat", interpret=True)
    got, ovf = adv(state, 1)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(ref.rho),
                               rtol=2e-5, atol=1e-3)
    v_scale = max(float(jnp.abs(ref.vel).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=2e-5 * v_scale)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=1e-6, atol=1e-7)
