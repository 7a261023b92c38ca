"""Pallas cell-dense DEM kernel: parity vs the jnp (27-roll) implementation
(interpret mode on CPU; compiled mode is exercised on real TPU by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.params import DEMParams, DEMMaterial
from chrono_tpu.dem.cell_dense import (
    to_cells, cell_dense_forces, pallas_cell_forces, field_to_planes,
    make_cell_dense_advance,
)
from chrono_tpu.ops.pallas.dem_cell_kernel import edge_ok_table


def _scene(friction_mode, n=120, seed=5):
    rng = np.random.default_rng(seed)
    radius = 0.05
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13, dims=(4, 4, 4))
    pos = rng.uniform(0.05, 0.47, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    omega = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    params = DEMParams(
        radius=jnp.asarray(radius), mass=jnp.asarray(1.0),
        material=DEMMaterial(), wall_material=DEMMaterial(),
        gravity=jnp.zeros(3), dt=jnp.asarray(1e-5),
        friction_mode=friction_mode,
    )
    field = to_cells(grid, 8, jnp.asarray(pos), jnp.asarray(vel),
                     jnp.asarray(omega))
    assert int(field.overflow) == 0
    return params, grid, field


@pytest.mark.parametrize("friction_mode", ["frictionless", "single_step"])
def test_parity_with_jnp(friction_mode):
    params, grid, field = _scene(friction_mode)
    f_ref, t_ref = cell_dense_forces(params, grid, field)
    edge = edge_ok_table(grid.dims)
    f_pal, t_pal = pallas_cell_forces(params, grid, field, edge, B=16,
                                      interpret=True)
    # fp32 roundoff scales with the field magnitude (forces reach ~1e4 here);
    # frictionless torque is identically zero analytically, so its noise
    # floor scales with r·|F| (cross-product cancellation error)
    f_scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-5 * f_scale)
    t_atol = 1e-5 * max(float(jnp.abs(t_ref).max()),
                        float(params.radius) * f_scale)
    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                               rtol=1e-4, atol=t_atol)
    assert float(jnp.abs(f_ref).max()) > 0


def test_block_padding_irrelevant():
    """NC not divisible by B: the lane padding must not change results."""
    params, grid, field = _scene("frictionless")
    edge = edge_ok_table(grid.dims)
    f16, _ = pallas_cell_forces(params, grid, field, edge, B=16,
                                interpret=True)
    f64, _ = pallas_cell_forces(params, grid, field, edge, B=64,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(f16), np.asarray(f64),
                               rtol=1e-5, atol=1e-6)


def test_advance_backend_parity():
    """Full advance cycles: pallas backend tracks the XLA backend."""
    from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries

    rng = np.random.default_rng(3)
    radius = 0.05
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13, dims=(4, 4, 4))
    n = 100
    pos = rng.uniform(0.07, 0.45, (n, 3)).astype(np.float32)
    params = DEMParams(
        radius=jnp.asarray(radius), mass=jnp.asarray(1.0),
        material=DEMMaterial(), wall_material=DEMMaterial(),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(2e-5),
        friction_mode="single_step", rebuild_every=4,
    )
    bcs = DEMBoundaries(planes=box_boundaries((0, 0, 0), (0.52, 0.52, 0.52)))
    adv_x = make_cell_dense_advance(params, bcs, grid, backend="xla")
    adv_p = make_cell_dense_advance(params, bcs, grid, backend="pallas",
                                    pallas_block=16, pallas_interpret=True)
    z = jnp.zeros((n, 3))
    px, vx, ox, ovx = adv_x(jnp.asarray(pos), z, z, 3)
    pp, vp, op_, ovp = adv_p(jnp.asarray(pos), z, z, 3)
    assert int(ovx) == 0 and int(ovp) == 0
    np.testing.assert_allclose(np.asarray(pp), np.asarray(px),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx),
                               rtol=1e-3, atol=1e-4)


# ---------------- v2 pencil-layout kernel ----------------

from chrono_tpu.dem.cell_dense import pallas_pencil_forces
from chrono_tpu.ops.pallas.dem_pencil_kernel import edge_ok_xy


@pytest.mark.parametrize("friction_mode", ["frictionless", "single_step"])
def test_pencil_parity_with_jnp(friction_mode):
    params, grid, field = _scene(friction_mode)
    f_ref, t_ref = cell_dense_forces(params, grid, field)
    edge = edge_ok_xy(grid.dims)
    f_pal, t_pal = pallas_pencil_forces(params, grid, field, edge, nzp=128,
                                        Bxy=4, interpret=True)
    f_scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-5 * f_scale)
    t_atol = 1e-5 * max(float(jnp.abs(t_ref).max()),
                        float(params.radius) * f_scale)
    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                               rtol=1e-4, atol=t_atol)
    assert f_scale > 0


def test_pencil_advance_backend_parity():
    """Full advance cycles: pencil backend tracks the XLA backend."""
    from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries

    rng = np.random.default_rng(3)
    radius = 0.05
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13, dims=(4, 4, 4))
    n = 100
    pos = rng.uniform(0.07, 0.45, (n, 3)).astype(np.float32)
    params = DEMParams(
        radius=jnp.asarray(radius), mass=jnp.asarray(1.0),
        material=DEMMaterial(), wall_material=DEMMaterial(),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(2e-5),
        friction_mode="single_step", rebuild_every=4,
    )
    bcs = DEMBoundaries(planes=box_boundaries((0, 0, 0), (0.52, 0.52, 0.52)))
    adv_x = make_cell_dense_advance(params, bcs, grid, backend="xla")
    adv_p = make_cell_dense_advance(params, bcs, grid, backend="pencil",
                                    pallas_block=4, pallas_interpret=True)
    z = jnp.zeros((n, 3))
    px, vx, ox, ovx = adv_x(jnp.asarray(pos), z, z, 3)
    pp, vp, op_, ovp = adv_p(jnp.asarray(pos), z, z, 3)
    assert int(ovx) == 0 and int(ovp) == 0
    np.testing.assert_allclose(np.asarray(pp), np.asarray(px),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx),
                               rtol=1e-3, atol=1e-4)


# ---------------- v4 symmetric half-stencil kernel ----------------


@pytest.mark.parametrize("friction_mode", ["frictionless", "single_step"])
def test_sym_advance_parity(friction_mode):
    """Full advance cycles: the symmetric half-stencil backend (each pair
    evaluated once, reactions scattered through the rolling window) tracks
    the XLA 27-roll backend."""
    from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries

    rng = np.random.default_rng(3)
    radius = 0.05
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13, dims=(4, 4, 4))
    n = 100
    pos = rng.uniform(0.07, 0.45, (n, 3)).astype(np.float32)
    params = DEMParams(
        radius=jnp.asarray(radius), mass=jnp.asarray(1.0),
        material=DEMMaterial(), wall_material=DEMMaterial(),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(2e-5),
        friction_mode=friction_mode, rebuild_every=4,
    )
    bcs = DEMBoundaries(planes=box_boundaries((0, 0, 0), (0.52, 0.52, 0.52)))
    adv_x = make_cell_dense_advance(params, bcs, grid, backend="xla")
    adv_s = make_cell_dense_advance(params, bcs, grid, backend="sym",
                                    pallas_block=4, pallas_interpret=True)
    z = jnp.zeros((n, 3))
    px, vx, ox, ovx = adv_x(jnp.asarray(pos), z, z, 3)
    ps, vs, os_, ovs = adv_s(jnp.asarray(pos), z, z, 3)
    assert int(ovx) == 0 and int(ovs) == 0
    np.testing.assert_allclose(np.asarray(ps), np.asarray(px),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vx),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(os_), np.asarray(ox),
                               rtol=1e-3, atol=1e-4)


def test_sym_block_boundary_reactions():
    """Pairs straddling Bxy-block boundaries (reaction rows in the rolling
    window, not the local block): a tall thin grid forces cross-pencil
    contacts across blocks."""
    from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries

    rng = np.random.default_rng(11)
    radius = 0.05
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13, dims=(6, 3, 2))
    lo, hi = 0.07, None
    n = 90
    pos = np.stack([rng.uniform(0.07, 6 * 0.13 - 0.07, n),
                    rng.uniform(0.07, 3 * 0.13 - 0.07, n),
                    rng.uniform(0.07, 2 * 0.13 - 0.07, n)],
                   axis=1).astype(np.float32)
    params = DEMParams(
        radius=jnp.asarray(radius), mass=jnp.asarray(1.0),
        material=DEMMaterial(), wall_material=DEMMaterial(),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(2e-5),
        friction_mode="single_step", rebuild_every=2,
    )
    bcs = DEMBoundaries(planes=box_boundaries(
        (0, 0, 0), (6 * 0.13, 3 * 0.13, 2 * 0.13)))
    adv_x = make_cell_dense_advance(params, bcs, grid, backend="xla",
                                    capacity=16)
    adv_s = make_cell_dense_advance(params, bcs, grid, backend="sym",
                                    capacity=16, pallas_block=2,
                                    pallas_interpret=True)
    z = jnp.zeros((n, 3))
    px, vx, _, ovx = adv_x(jnp.asarray(pos), z, z, 2)
    ps, vs, _, ovs = adv_s(jnp.asarray(pos), z, z, 2)
    assert int(ovx) == 0 and int(ovs) == 0
    np.testing.assert_allclose(np.asarray(ps), np.asarray(px),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vx),
                               rtol=1e-3, atol=1e-4)


# ---------------- v5 flat-lane kernel ----------------


@pytest.mark.parametrize("friction_mode", ["frictionless", "single_step"])
def test_flat_advance_parity(friction_mode):
    """Full advance cycles: the flat-lane backend (rows = x, lane = y*SZ+z,
    dem_flat_kernel on the flatlane scaffold) tracks the XLA 27-roll
    backend — pairs across x-rows exercise the rolling window, y/z column
    crossings the pad-lane masking."""
    from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries

    rng = np.random.default_rng(7)
    radius = 0.05
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13, dims=(5, 4, 3))
    n = 120
    pos = np.stack([rng.uniform(0.07, 5 * 0.13 - 0.07, n),
                    rng.uniform(0.07, 4 * 0.13 - 0.07, n),
                    rng.uniform(0.07, 3 * 0.13 - 0.07, n)],
                   axis=1).astype(np.float32)
    params = DEMParams(
        radius=jnp.asarray(radius), mass=jnp.asarray(1.0),
        material=DEMMaterial(), wall_material=DEMMaterial(),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(2e-5),
        friction_mode=friction_mode, rebuild_every=4,
    )
    bcs = DEMBoundaries(planes=box_boundaries(
        (0, 0, 0), (5 * 0.13, 4 * 0.13, 3 * 0.13)))
    adv_x = make_cell_dense_advance(params, bcs, grid, backend="xla",
                                    capacity=16)
    adv_f = make_cell_dense_advance(params, bcs, grid, backend="flat",
                                    capacity=16, pallas_block=2,
                                    pallas_interpret=True)
    z = jnp.zeros((n, 3))
    px, vx, ox, ovx = adv_x(jnp.asarray(pos), z, z, 3)
    pf, vf, of_, ovf = adv_f(jnp.asarray(pos), z, z, 3)
    assert int(ovx) == 0 and int(ovf) == 0
    np.testing.assert_allclose(np.asarray(pf), np.asarray(px),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vx),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(of_), np.asarray(ox),
                               rtol=1e-3, atol=1e-4)


def test_flat_migrate_parity():
    """v6 in-plane migration: the sort-free rebuild (migrate_flat — 3
    axis-split roll/rank/place passes) must reproduce the full argsort
    rebuild EXACTLY (both are pure data movement between identical
    substeps).  Deep cycles so plenty of particles cross cell faces."""
    from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries

    rng = np.random.default_rng(11)
    radius = 0.05
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13, dims=(5, 4, 3))
    n = 120
    pos = np.stack([rng.uniform(0.07, 5 * 0.13 - 0.07, n),
                    rng.uniform(0.07, 4 * 0.13 - 0.07, n),
                    rng.uniform(0.07, 3 * 0.13 - 0.07, n)],
                   axis=1).astype(np.float32)
    params = DEMParams(
        radius=jnp.asarray(radius), mass=jnp.asarray(1.0),
        material=DEMMaterial(), wall_material=DEMMaterial(),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(2e-5),
        friction_mode="single_step", rebuild_every=4,
    )
    bcs = DEMBoundaries(planes=box_boundaries(
        (0, 0, 0), (5 * 0.13, 4 * 0.13, 3 * 0.13)))
    adv_f = make_cell_dense_advance(params, bcs, grid, backend="flat",
                                    capacity=16, pallas_block=2,
                                    pallas_interpret=True)
    adv_m = make_cell_dense_advance(params, bcs, grid, backend="flat",
                                    capacity=16, pallas_block=2,
                                    pallas_interpret=True, migrate=True)
    z = jnp.zeros((n, 3))
    pf, vf, of_, ovf = adv_f(jnp.asarray(pos), z, z, 6)
    pm, vm, om, ovm = adv_m(jnp.asarray(pos), z, z, 6)
    assert int(ovf) == 0 and int(ovm) == 0
    # slot order inside a cell differs between the two rebinning schemes, so
    # pair-sum association differs at the ulp level — otherwise identical
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pf),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vf),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(om), np.asarray(of_),
                               rtol=1e-6, atol=1e-6)
