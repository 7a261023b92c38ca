"""Spatial domain-decomposition tests on the virtual 8-device CPU mesh:
migration, halo correctness, and cross-slab physics parity vs one device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import PartitionSpec as P
from jax import shard_map

from chrono_tpu.parallel.mesh import make_mesh
from chrono_tpu.parallel.domains import (
    SlabSpec, distribute, make_exchange, make_sharded_dem_advance,
)


def _wrap_exchange(spec, mesh):
    ex = make_exchange(spec, n_halo_extra_cols=3)
    return shard_map(
        ex, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"),) * 10,
    )


class TestExchange:
    def test_migration_moves_particle(self):
        mesh = make_mesh(4)
        spec = SlabSpec(x0=0.0, width=1.0, n_slabs=4, capacity=8,
                        halo_capacity=4, migrate_capacity=4, cutoff=0.1)
        # one particle in slab 0 that has crossed into slab 1
        pos = np.full((4, 8, 3), 1e30, np.float32)
        vel = np.zeros((4, 8, 3), np.float32)
        extra = np.zeros((4, 8, 3), np.float32)
        valid = np.zeros((4, 8), bool)
        pos[0, 0] = [1.2, 0.5, 0.5]     # belongs to slab 1
        extra[0, 0] = [7.0, 8.0, 9.0]
        valid[0, 0] = True
        fn = _wrap_exchange(spec, mesh)
        p2, v2, e2, m2, hp, hv, hx, hm, hidx, ov = fn(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(extra),
            jnp.asarray(valid))
        m2 = np.asarray(m2)
        assert m2[0].sum() == 0, "slab 0 should have released the particle"
        assert m2[1].sum() == 1, "slab 1 should have received it"
        k = np.where(m2[1])[0][0]
        np.testing.assert_allclose(np.asarray(p2)[1, k], [1.2, 0.5, 0.5])
        np.testing.assert_allclose(np.asarray(e2)[1, k], [7, 8, 9])
        assert int(np.asarray(ov).max()) == 0

    def test_halo_visibility(self):
        mesh = make_mesh(4)
        spec = SlabSpec(x0=0.0, width=1.0, n_slabs=4, capacity=8,
                        halo_capacity=4, migrate_capacity=4, cutoff=0.2)
        pos = np.full((4, 8, 3), 1e30, np.float32)
        vel = np.zeros((4, 8, 3), np.float32)
        extra = np.zeros((4, 8, 3), np.float32)
        valid = np.zeros((4, 8), bool)
        pos[1, 0] = [1.05, 0.5, 0.5]    # near slab 1's LEFT face
        pos[1, 1] = [1.95, 0.5, 0.5]    # near slab 1's RIGHT face
        pos[1, 2] = [1.5, 0.5, 0.5]     # interior — no halo export
        valid[1, :3] = True
        fn = _wrap_exchange(spec, mesh)
        p2, v2, e2, m2, hp, hv, hx, hm, hidx, ov = fn(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(extra),
            jnp.asarray(valid))
        hm = np.asarray(hm)
        hp = np.asarray(hp)
        # slab 0 sees the particle near x=1.05 in its halo
        assert hm[0].sum() == 1
        np.testing.assert_allclose(hp[0][hm[0]][0], [1.05, 0.5, 0.5])
        # slab 2 sees the particle near x=1.95
        assert hm[2].sum() == 1
        np.testing.assert_allclose(hp[2][hm[2]][0], [1.95, 0.5, 0.5])


class TestShardedDEM:
    def test_parity_with_single_device(self):
        """Cross-slab collision: sharded result matches unsharded DEM."""
        from chrono_tpu.dem import DEMSystem
        from chrono_tpu.dem.system import _n_walls

        D = 4
        radius = 0.05
        box = ((0.0, 0.0, 0.0), (4.0, 0.5, 0.5))
        # two rows of particles straddling slab boundaries
        pts = []
        for x in np.arange(0.85, 3.2, 0.11):
            pts.append([x, 0.25, 0.06])
        pts = np.asarray(pts)

        # reference: single-device run (single_step friction to match)
        sys_ = DEMSystem(radius=radius, density=2500, box=box,
                         friction_mode="single_step", rebuild_every=4,
                         max_neighbors=8)
        sys_.set_material(youngs=5e6, restitution=0.4, mu_s=0.3)
        sys_.set_wall_material(youngs=5e6, restitution=0.4, mu_s=0.3)
        sys_.create_particles(pts)
        n_cycles = 40
        ref_state, _ = sys_._advance(sys_.state, n_cycles)
        ref = np.asarray(ref_state.pos)

        # sharded run with identical params
        mesh = make_mesh(D)
        spec = SlabSpec(x0=0.0, width=1.0, n_slabs=D, capacity=32,
                        halo_capacity=16, migrate_capacity=8,
                        cutoff=2 * radius * 1.3)
        sp = distribute(spec, pts, np.zeros_like(pts))
        omega = jnp.zeros_like(sp.pos)
        adv = make_sharded_dem_advance(spec, mesh, sys_.params, sys_.bcs,
                                       sys_.grid)
        p, v, o, m, ov = adv(sp.pos, sp.vel, omega, sp.valid, n_cycles)
        assert int(ov) == 0
        got = np.asarray(p)[np.asarray(m)]
        assert got.shape[0] == len(pts)

        # compare as multisets (sort by x then y then z)
        def canon(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(canon(got), canon(ref), atol=2e-4)

    def test_parity_multistep_friction(self):
        """FULL-fidelity parity: multi-step friction history survives
        migration (gid re-keying) and halos refresh per substep — the
        sharded trajectory matches the single-device one."""
        from chrono_tpu.dem import DEMSystem

        D = 4
        radius = 0.05
        box = ((0.0, 0.0, 0.0), (4.0, 0.5, 0.5))
        rng = np.random.default_rng(2)
        pts = []
        for x in np.arange(0.85, 3.2, 0.11):
            pts.append([x, 0.25, 0.06])
            pts.append([x + 0.02, 0.25, 0.17])   # second layer → shear
        pts = np.asarray(pts)
        pts = pts + rng.normal(0, 1e-3, pts.shape)

        sys_ = DEMSystem(radius=radius, density=2500, box=box,
                         friction_mode="multi_step", rebuild_every=4,
                         max_neighbors=8)
        sys_.set_material(youngs=5e6, restitution=0.4, mu_s=0.5)
        sys_.set_wall_material(youngs=5e6, restitution=0.4, mu_s=0.5)
        sys_.create_particles(pts)
        n_cycles = 30
        ref_state, _ = sys_._advance(sys_.state, n_cycles)
        ref = np.asarray(ref_state.pos)

        mesh = make_mesh(D)
        spec = SlabSpec(x0=0.0, width=1.0, n_slabs=D, capacity=64,
                        halo_capacity=16, migrate_capacity=8,
                        cutoff=2 * radius * 1.3)
        sp = distribute(spec, pts, np.zeros_like(pts))
        omega = jnp.zeros_like(sp.pos)
        adv = make_sharded_dem_advance(spec, mesh, sys_.params, sys_.bcs,
                                       sys_.grid)
        p, v, o, m, ov = adv(sp.pos, sp.vel, omega, sp.valid, n_cycles)
        assert int(ov) == 0
        got = np.asarray(p)[np.asarray(m)]
        assert got.shape[0] == len(pts)

        def canon(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(canon(got), canon(ref), atol=5e-5)

    def test_local_coords_far_domain_parity(self):
        """Slab-local coordinates (SlabSpec.local_coords — the fp32 role of
        the reference's int64 fixed-point subdomain coords,
        /root/reference/src/chrono_dem/gpu/ChDemDefines.h) reproduce the
        near-origin trajectory with the whole domain moved to x = 2²¹ m,
        where GLOBAL fp32 x has 0.25 m resolution — 5 radii — and the
        simulation could not even represent the initial positions."""
        from chrono_tpu.collision.cell_list import GridSpec
        from chrono_tpu.dem import DEMSystem
        from chrono_tpu.parallel.domains import gather_global
        from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries

        D = 4
        radius = 0.05
        X0 = float(2 ** 21)                   # fp32-exact slab origins
        box = ((0.0, 0.0, 0.0), (4.0, 0.5, 0.5))
        pts = []
        for x in np.arange(0.85, 3.2, 0.11):
            pts.append([x, 0.25, 0.06])
        pts = np.asarray(pts)

        # reference: near-origin single-device run
        sys_ = DEMSystem(radius=radius, density=2500, box=box,
                         friction_mode="single_step", rebuild_every=4,
                         max_neighbors=8)
        sys_.set_material(youngs=5e6, restitution=0.4, mu_s=0.3)
        sys_.set_wall_material(youngs=5e6, restitution=0.4, mu_s=0.3)
        sys_.create_particles(pts)
        n_cycles = 40
        ref_state, _ = sys_._advance(sys_.state, n_cycles)
        ref = np.asarray(ref_state.pos)

        # far-domain sharded run in slab-local coordinates
        mesh = make_mesh(D)
        cutoff = 2 * radius * 1.3
        spec = SlabSpec(x0=X0, width=1.0, n_slabs=D, capacity=32,
                        halo_capacity=16, migrate_capacity=8,
                        cutoff=cutoff, local_coords=True)
        pts_far = np.asarray(pts, np.float64) + np.asarray([X0, 0.0, 0.0])
        sp = distribute(spec, pts_far, np.zeros_like(pts))
        omega = jnp.zeros_like(sp.pos)
        # slab-local grid: x ∈ [−2 cells, width + 2 cells], same cell size
        cell = float(sys_.grid.cell_size)
        nxl = int(np.ceil((1.0 + 4 * cell) / cell))
        grid_local = GridSpec(
            origin=(-2 * cell, sys_.grid.origin[1], sys_.grid.origin[2]),
            cell_size=cell,
            dims=(nxl, sys_.grid.dims[1], sys_.grid.dims[2]))
        # walls GLOBAL (re-expressed per slab in-program)
        bcs_far = DEMBoundaries(planes=box_boundaries(
            (X0, 0.0, 0.0), (X0 + 4.0, 0.5, 0.5)))
        adv = make_sharded_dem_advance(spec, mesh, sys_.params, bcs_far,
                                       grid_local)
        p, v, o, m, ov = adv(sp.pos, sp.vel, omega, sp.valid, n_cycles)
        assert int(ov) == 0
        pg = gather_global(spec, p) - np.asarray([X0, 0.0, 0.0])
        got = pg[np.asarray(m)]
        assert got.shape[0] == len(pts)

        def canon(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(canon(got), canon(ref), atol=2e-4)


class TestShardedSPH:
    def test_sph_parity_with_single_device(self):
        """Sharded WCSPH column (4 slabs, halo + migration + persistent
        boundary density) matches the single-device trajectory."""
        from chrono_tpu.fsi.sph import SPHParams, make_sph_state
        from chrono_tpu.fsi.sph.system import make_sph_advance_fn
        from chrono_tpu.collision.cell_list import GridSpec
        from chrono_tpu.parallel.domains import (
            SlabSpec, distribute, distribute_static,
            make_sharded_sph_advance)
        from chrono_tpu.utils.samplers import grid_sample_box

        d0 = 0.05
        D = 4
        params = SPHParams(
            d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
            rho0=jnp.asarray(1000.0), mu=jnp.asarray(0.5),
            c_s=jnp.asarray(12.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
            dt=jnp.asarray(2e-4), viscosity_model="laminar",
            max_neighbors=64, max_per_cell=48, rebuild_every=2,
            integrator="symplectic", xsph_eps=0.2, shifting="xsph")

        # shallow water strip along x with floor BCE
        fluid = grid_sample_box((0.1, 0.05, 0.025), (1.9, 0.2, 0.15), d0)
        floor = grid_sample_box((0.0, 0.0, -3 * d0), (2.0, 0.25, 0.0), d0)

        cell = 2.4 * d0
        grid = GridSpec(origin=(-cell, -cell, -4 * d0), cell_size=cell,
                        dims=(int(np.ceil(2.1 / cell)),
                              int(np.ceil(0.4 / cell)),
                              int(np.ceil(0.4 / cell))))

        # single-device reference
        st = make_sph_state(params, fluid, boundary_pts=floor)
        adv1 = make_sph_advance_fn(params, grid)
        n_cycles = 10
        st, ovf1 = adv1(st, n_cycles)
        assert int(ovf1) == 0
        nf = len(fluid)
        ref = np.asarray(st.pos[:nf])

        # sharded
        spec = SlabSpec(x0=0.0, width=2.0 / D, n_slabs=D,
                        capacity=int(1.8 * nf / D), halo_capacity=160,
                        migrate_capacity=64, cutoff=2.0 * 1.2 * d0)
        sp = distribute(spec, fluid, np.zeros_like(fluid))
        bpos, bval = distribute_static(spec, floor, capacity=220)
        mesh = make_mesh(D)
        rho0 = jnp.full(sp.pos.shape[:2], 1000.0) * sp.valid
        rho0 = jnp.where(sp.valid, rho0, 1000.0)
        adv = make_sharded_sph_advance(spec, mesh, params, grid, bpos, bval)
        p, v, r, m, ov = adv(sp.pos, sp.vel, rho0, sp.valid, n_cycles)
        assert int(ov) == 0
        got = np.asarray(p)[np.asarray(m)]
        assert got.shape[0] == nf

        def canon(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(canon(got), canon(ref), atol=5e-4)


class TestShardedFlatPallas:
    """VERDICT r2 item 2: the multi-chip path must certify the SAME engine
    the benches measure — the flat-lane symmetric Pallas kernel
    (ops.pallas.dem_flat_kernel), not the gather/XLA backend."""

    def test_sharded_flat_parity_with_single_chip_flat(self):
        from chrono_tpu.collision.cell_list import GridSpec
        from chrono_tpu.dem import DEMSystem
        from chrono_tpu.dem.cell_dense import make_cell_dense_advance
        from chrono_tpu.parallel.pallas_dem import (
            make_sharded_flat_dem_advance,
        )
        from chrono_tpu.utils.samplers import grid_sample_box

        D = 4
        radius = 0.05
        cell = 2 * radius * 1.45
        nx, ny, nz = 8, 5, 5
        origin = (-cell, -cell, -cell)
        # box walls well inside the grid; particles straddle all 3 slab faces
        box = ((0.0, 0.0, 0.0),
               (nx * cell - 2 * cell, ny * cell - 2 * cell,
                nz * cell - 2 * cell))
        grid = GridSpec(origin=origin, cell_size=cell, dims=(nx, ny, nz))
        pts = grid_sample_box((0.06, 0.06, 0.06),
                              (box[1][0] - 0.06, box[1][1] - 0.06,
                               box[1][2] - 0.1),
                              0.115, jitter=0.03, seed=7)
        sys_ = DEMSystem(radius=radius, density=2500, box=box,
                         friction_mode="single_step", rebuild_every=4,
                         max_neighbors=12)
        sys_.set_material(youngs=5e6, restitution=0.4, mu_s=0.4)
        sys_.set_wall_material(youngs=5e6, restitution=0.4, mu_s=0.4)
        sys_.create_particles(pts)
        n_cycles = 8

        # single-chip flat-lane Pallas reference (interpret on CPU)
        adv1 = make_cell_dense_advance(sys_.params, sys_.bcs, grid,
                                       capacity=8, backend="flat",
                                       pallas_interpret=True)
        p1, v1, o1, ov1 = adv1(jnp.asarray(pts, jnp.float32),
                               jnp.zeros((len(pts), 3), jnp.float32),
                               jnp.zeros((len(pts), 3), jnp.float32),
                               n_cycles)
        assert int(ov1) == 0
        ref = np.asarray(p1)

        # sharded flat-lane Pallas over 4 slabs
        spec = SlabSpec(x0=origin[0], width=(nx // D) * cell, n_slabs=D,
                        capacity=64, halo_capacity=32, migrate_capacity=16,
                        cutoff=cell)
        sp = distribute(spec, pts, np.zeros_like(pts))
        omega = jnp.zeros_like(sp.pos)
        adv = make_sharded_flat_dem_advance(
            spec, make_mesh(D), sys_.params, sys_.bcs, grid,
            capacity=8, interpret=True)
        p, v, o, m, ov = adv(sp.pos, sp.vel, omega, sp.valid, n_cycles)
        assert int(ov) == 0
        got = np.asarray(p)[np.asarray(m)]
        assert got.shape[0] == len(pts)

        def canon(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(canon(got), canon(ref), atol=5e-4)


class TestShardedCRM:
    """Sharded CRM granular terrain (parallel.crm_shard) vs the
    single-device flat-lane CRM engine — the capstone scale-out path
    (BASELINE config #5 'single multi-chip TPU program')."""

    def _scene(self):
        from chrono_tpu.collision.cell_list import GridSpec
        from chrono_tpu.fsi.sph.state import SPHParams, FLUID, BOUNDARY
        from chrono_tpu.fsi.sph.crm import CRMParams, CRMState
        from chrono_tpu.utils.samplers import grid_sample_box

        d0 = 0.05
        params = SPHParams(
            d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
            rho0=jnp.asarray(1700.0), mu=jnp.asarray(0.0),
            c_s=jnp.asarray(20.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
            dt=jnp.asarray(5e-5), max_neighbors=48, max_per_cell=32,
            rebuild_every=2, integrator="symplectic")
        crm = CRMParams(youngs=jnp.asarray(1.3e6),
                        poisson=jnp.asarray(0.3),
                        friction_angle=jnp.asarray(0.6),
                        cohesion=jnp.asarray(0.0))
        cell = 2.4 * d0
        nx, ny, nz = 8, 5, 4
        origin = (0.0, 0.0, -4 * d0)
        grid = GridSpec(origin=origin, cell_size=cell, dims=(nx, ny, nz))
        Lx = nx * cell
        bed = grid_sample_box((0.08, 0.08, 0.5 * d0),
                              (Lx - 0.08, ny * cell - 0.2, 0.2), d0,
                              jitter=0.01, seed=3)
        floor = grid_sample_box((0.02, 0.02, -3 * d0),
                                (Lx - 0.02, ny * cell - 0.14, -d0), d0)
        pos = np.concatenate([bed, floor])
        kind = np.concatenate([np.full(len(bed), FLUID),
                               np.full(len(floor), BOUNDARY)])
        n = len(pos)
        st = CRMState(
            pos=jnp.asarray(pos, jnp.float32),
            vel=jnp.zeros((n, 3), jnp.float32),
            rho=jnp.full((n,), 1700.0, jnp.float32),
            kind=jnp.asarray(kind, jnp.int32),
            body_id=jnp.zeros((n,), jnp.int32),
            bce_local=jnp.zeros((n, 3), jnp.float32),
            tau_d=jnp.zeros((n, 3), jnp.float32),
            tau_o=jnp.zeros((n, 3), jnp.float32),
            nbr=None, time=jnp.asarray(0.0))
        return params, crm, grid, st, len(bed)

    def test_sharded_crm_parity_with_single_device(self):
        from chrono_tpu.fsi.sph.crm_pencil import make_crm_pencil_engine
        from chrono_tpu.fsi.sph.crm_pencil import pencils_to_crm_state
        from chrono_tpu.parallel.crm_shard import (
            make_sharded_crm_advance, crm_slab_extra)

        params, crm, grid, st, n_bed = self._scene()
        D = 4
        n_substeps, n_cycles = 2, 3
        cap = 32

        # single-device flat-lane engine, re-binned per cycle (the same
        # schedule the sharded path runs)
        eng = make_crm_pencil_engine(params, crm, grid, capacity=cap,
                                     Bxy=2, interpret=True, layout="flat")
        ref = st
        for _ in range(n_cycles):
            feat, _x, perm, ov = eng["bin"](ref)
            assert int(ov) == 0
            for _ in range(n_substeps):
                feat = eng["substep"](feat)
            ref = pencils_to_crm_state(feat, perm, ref)
        ref_pos = np.asarray(ref.pos)

        # sharded over 4 slabs
        cell = float(grid.cell_size)
        nxl = grid.dims[0] // D
        spec = SlabSpec(x0=grid.origin[0], width=nxl * cell, n_slabs=D,
                        capacity=256, halo_capacity=128,
                        migrate_capacity=32, cutoff=cell)
        sp = distribute(spec, np.asarray(st.pos), np.zeros_like(st.pos))
        # redistribute the extra columns with the same slab assignment
        extra_all = np.asarray(crm_slab_extra(st))
        slab = np.clip(((np.asarray(st.pos)[:, 0] - spec.x0)
                        / spec.width).astype(int), 0, D - 1)
        extra = np.zeros((D, spec.capacity, 8), np.float32)
        for d in range(D):
            idx = np.where(slab == d)[0]
            extra[d, :len(idx)] = extra_all[idx]
        adv = make_sharded_crm_advance(spec, make_mesh(D), params, crm,
                                       grid, n_substeps, capacity=cap,
                                       Bxy=2, interpret=True)
        p, v, x2, m, ov = adv(sp.pos, sp.vel, jnp.asarray(extra),
                              sp.valid, n_cycles)
        assert int(ov) == 0
        got = np.asarray(p)[np.asarray(m)]
        assert got.shape[0] == st.pos.shape[0]

        def canon(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(canon(got), canon(ref_pos), atol=5e-4)


class TestShardedCRMVehicle:
    """ONE multi-chip vehicle-on-CRM program
    (parallel.crm_shard.make_sharded_crm_vehicle_advance): the MBS rides
    replicated inside the sharded terrain program, wheel-BCE kinematics
    applied on the owning slab, per-body loads psum'd over the mesh —
    D=2 slabs must match D=1 (same code, halo/psum/migration exercised).
    Reference role: cosim/ChVehicleCosimBaseNode.h:96-196 (their MPI
    answer), here a single SPMD program."""

    def _vehicle_scene(self):
        from chrono_tpu.collision.cell_list import GridSpec
        from chrono_tpu.fsi.sph.state import (
            SPHParams, FLUID, BOUNDARY, RIGID_BCE,
        )
        from chrono_tpu.fsi.sph.crm import CRMParams, CRMState
        from chrono_tpu.fsi.crm_terrain import wheel_bce_markers
        from chrono_tpu.utils.samplers import grid_sample_box
        from chrono_tpu.physics.builder import SystemBuilder

        d0 = 0.05
        params = SPHParams(
            d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
            rho0=jnp.asarray(1700.0), mu=jnp.asarray(0.0),
            c_s=jnp.asarray(20.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
            dt=jnp.asarray(5e-5), max_neighbors=48, max_per_cell=32,
            rebuild_every=2, integrator="symplectic")
        crm = CRMParams(youngs=jnp.asarray(1.3e6), poisson=jnp.asarray(0.3),
                        friction_angle=jnp.asarray(0.6),
                        cohesion=jnp.asarray(0.0))
        cell = 2.4 * d0
        nx, ny, nz = 8, 5, 5
        grid = GridSpec(origin=(0.0, 0.0, -4 * d0), cell_size=cell,
                        dims=(nx, ny, nz))
        Lx = nx * cell
        bed = grid_sample_box((0.08, 0.08, 0.5 * d0),
                              (Lx - 0.08, ny * cell - 0.2, 0.2), d0,
                              jitter=0.01, seed=3)
        floor = grid_sample_box((0.02, 0.02, -3 * d0),
                                (Lx - 0.02, ny * cell - 0.14, -d0), d0)

        # chassis + one revolute wheel resting just above the bed surface
        r_w, w_w = 0.09, 0.08
        x_w = (0.45, 0.25, 0.2 + r_w + 0.5 * d0)
        bld = SystemBuilder()
        bld.set_gravity((0, 0, -9.81))
        chassis = bld.add_body(mass=4.0, inertia=(0.2, 0.2, 0.2),
                               pos=(x_w[0], x_w[1], x_w[2] + 0.12))
        wheel = bld.add_body(mass=2.0, inertia=(0.01, 0.016, 0.01),
                             pos=x_w)
        bld.add_joint("revolute", chassis, wheel, world_pos=x_w,
                      world_axis=(0, 1, 0))
        model, bodies = bld.finalize()
        wl = wheel_bce_markers(r_w, w_w, d0)

        pos = np.concatenate([bed, floor, wl + np.asarray(x_w)])
        kind = np.concatenate([np.full(len(bed), FLUID),
                               np.full(len(floor), BOUNDARY),
                               np.full(len(wl), RIGID_BCE)])
        bid = np.concatenate([np.full(len(bed) + len(floor), -1),
                              np.full(len(wl), wheel)])
        loc = np.concatenate([np.zeros((len(bed) + len(floor), 3)), wl])
        n = len(pos)
        st = CRMState(
            pos=jnp.asarray(pos, jnp.float32),
            vel=jnp.zeros((n, 3), jnp.float32),
            rho=jnp.full((n,), 1700.0, jnp.float32),
            kind=jnp.asarray(kind, jnp.int32),
            body_id=jnp.asarray(bid, jnp.int32),
            bce_local=jnp.asarray(loc, jnp.float32),
            tau_d=jnp.zeros((n, 3), jnp.float32),
            tau_o=jnp.zeros((n, 3), jnp.float32),
            nbr=None, time=jnp.asarray(0.0))
        return params, crm, grid, st, model, bodies, wheel, chassis

    def _run(self, D, params, crm, grid, st, model, bodies, wheel):
        from chrono_tpu.parallel.crm_shard import (
            make_sharded_crm_vehicle_advance, crm_vehicle_slab_extra,
        )

        cell = float(grid.cell_size)
        nxl = grid.dims[0] // D
        spec = SlabSpec(x0=grid.origin[0], width=nxl * cell, n_slabs=D,
                        capacity=1024, halo_capacity=256,
                        migrate_capacity=64, cutoff=cell)
        sp = distribute(spec, np.asarray(st.pos), np.zeros_like(st.pos))
        extra_all = np.asarray(crm_vehicle_slab_extra(st))
        slab = np.clip(((np.asarray(st.pos)[:, 0] - spec.x0)
                        / spec.width).astype(int), 0, D - 1)
        extra = np.zeros((D, spec.capacity, 12), np.float32)
        for d in range(D):
            idx = np.where(slab == d)[0]
            extra[d, :len(idx)] = extra_all[idx]
        adv = make_sharded_crm_vehicle_advance(
            spec, make_mesh(D), params, crm, grid, model, [wheel],
            n_substeps=2, capacity=32, Bxy=2, interpret=True)
        p, v, x2, m, bod, t, ov = adv(sp.pos, sp.vel, jnp.asarray(extra),
                                      sp.valid, bodies, jnp.zeros(()), 3)
        assert int(ov) == 0
        return np.asarray(p)[np.asarray(m)], bod

    def test_sharded_vehicle_parity_d2_vs_d1(self):
        params, crm, grid, st, model, bodies, wheel, chassis = \
            self._vehicle_scene()
        got2, bod2 = self._run(2, params, crm, grid, st, model, bodies,
                               wheel)
        got1, bod1 = self._run(1, params, crm, grid, st, model, bodies,
                               wheel)
        assert got1.shape[0] == st.pos.shape[0]
        assert got2.shape[0] == st.pos.shape[0]
        # the wheel must have sunk/settled (forces actually coupled)
        assert float(jnp.abs(bod1.v[wheel]).max()) > 0.0
        np.testing.assert_allclose(np.asarray(bod2.x), np.asarray(bod1.x),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bod2.v), np.asarray(bod1.v),
                                   rtol=1e-4, atol=1e-5)

        def canon(a):
            return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]

        np.testing.assert_allclose(canon(got2), canon(got1), atol=5e-4)
