"""Pallas cell-dense DEM kernel: parity vs the jnp reference implementation
(interpret mode on CPU; compiled mode is exercised on real TPU hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.params import DEMParams, DEMMaterial, hertz_coefficients
from chrono_tpu.dem.cell_dense import to_cells, cell_dense_forces
from chrono_tpu.ops.pallas.dem_cell_kernel import (
    dem_cell_forces_pallas, edge_ok_table,
)


class TestPallasDEMKernel:
    def test_parity_with_jnp(self):
        rng = np.random.default_rng(5)
        radius = 0.05
        grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13,
                        dims=(4, 4, 4))
        n = 120
        pos = rng.uniform(0.05, 0.47, (n, 3)).astype(np.float32)
        vel = rng.normal(0, 0.1, (n, 3)).astype(np.float32)

        params = DEMParams(
            radius=jnp.asarray(radius), mass=jnp.asarray(1.0),
            material=DEMMaterial(), wall_material=DEMMaterial(),
            gravity=jnp.zeros(3), dt=jnp.asarray(1e-5),
            friction_mode="frictionless",
        )
        C = 8
        field = to_cells(grid, C, jnp.asarray(pos), jnp.asarray(vel),
                         jnp.zeros((n, 3)))
        assert int(field.overflow) == 0

        # jnp reference
        f_ref, _ = cell_dense_forces(params, grid, field)

        # pallas kernel
        kn, gn, _, _ = hertz_coefficients(params.material, 0.5 * params.mass,
                                          0.5 * params.radius)
        edge = edge_ok_table(grid.dims)
        f_pal = dem_cell_forces_pallas(
            field.pos.reshape(-1, 3), field.vel.reshape(-1, 3),
            field.mask.reshape(-1, C), edge,
            float(radius), float(kn), float(gn),
            grid_dims=grid.dims, C=C, B=16, interpret=True)

        np.testing.assert_allclose(
            np.asarray(f_pal).reshape(f_ref.shape), np.asarray(f_ref),
            rtol=1e-4, atol=1e-4)
        # forces are actually nonzero somewhere (particles do touch)
        assert float(jnp.abs(f_ref).max()) > 0
