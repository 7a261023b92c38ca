"""Cell-dense (roll-based, gather-free) DEM backend: parity vs the
neighbor-list backend — the cross-backend agreement pattern of the reference's
unit_tests/smc_contact."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.dem import DEMSystem
from chrono_tpu.dem.cell_dense import (
    to_cells, from_cells, make_cell_dense_advance,
)
from chrono_tpu.utils.samplers import grid_sample_box


class TestBinning:
    def test_roundtrip(self):
        from chrono_tpu.collision.cell_list import GridSpec
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.uniform(0.1, 0.9, (50, 3)).astype(np.float32))
        vel = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        grid = GridSpec(origin=(0., 0., 0.), cell_size=0.25, dims=(4, 4, 4))
        field = to_cells(grid, 8, pos, vel, jnp.zeros_like(vel))
        assert int(field.overflow) == 0
        p2, v2 = from_cells(field, field.pos, field.vel)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(pos), atol=1e-7)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(vel), atol=1e-7)
        assert int(field.mask.sum()) == 50


class TestBackendParity:
    def test_settling_parity(self):
        """Same scene, both backends, single-step friction: trajectories must
        agree (cross-backend oracle)."""
        radius = 0.05
        box = ((0, 0, 0), (0.6, 0.6, 0.6))
        pts = grid_sample_box((0.07, 0.07, 0.07), (0.53, 0.53, 0.4), 0.12,
                              jitter=0.04, seed=3)
        sys_ = DEMSystem(radius=radius, density=2500, box=box,
                         friction_mode="single_step", rebuild_every=4,
                         max_neighbors=12)
        sys_.set_material(youngs=5e6, restitution=0.4, mu_s=0.4)
        sys_.set_wall_material(youngs=5e6, restitution=0.4, mu_s=0.4)
        sys_.create_particles(pts)
        n_cycles = 30

        ref_state, ov = sys_._advance(sys_.state, n_cycles)
        assert int(ov) == 0
        ref = np.asarray(ref_state.pos)

        adv = make_cell_dense_advance(sys_.params, sys_.bcs, sys_.grid,
                                      capacity=8)
        p, v, o, ov2 = adv(jnp.asarray(pts, jnp.float32),
                           jnp.zeros((len(pts), 3), jnp.float32),
                           jnp.zeros((len(pts), 3), jnp.float32), n_cycles)
        assert int(ov2) == 0
        np.testing.assert_allclose(np.asarray(p), ref, atol=5e-4)
