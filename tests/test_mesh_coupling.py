"""Native mesh library + DEM↔trimesh coupling tests
(mirrors the reference's mesh-cosim behaviors: rolling on mesh, force feedback
— demo_DEM_ballCosim pattern)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.native import load_obj, bin_triangles, weld_vertices, get_lib
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.mesh import (
    make_triangle_mesh, mesh_world_triangles, sphere_mesh_forces, MeshBins,
    bin_triangles_numpy,
)
from chrono_tpu.dem.params import DEMParams, DEMMaterial


def write_quad_obj(path, size=1.0, z=0.0):
    with open(path, "w") as f:
        f.write(f"v {-size} {-size} {z}\nv {size} {-size} {z}\n"
                f"v {size} {size} {z}\nv {-size} {size} {z}\n"
                "f 1 2 3 4\n")


class TestNativeMeshLib:
    def test_builds(self):
        assert get_lib() is not None, "native meshlib failed to build"

    def test_load_obj(self, tmp_path):
        p = str(tmp_path / "quad.obj")
        write_quad_obj(p)
        v, f = load_obj(p)
        assert v.shape == (4, 3)
        assert f.shape == (2, 3)  # quad fan-triangulated

    def test_load_obj_matches_fallback(self, tmp_path):
        from chrono_tpu.dem.mesh import load_obj_numpy
        p = str(tmp_path / "quad.obj")
        write_quad_obj(p)
        v1, f1 = load_obj(p)
        v2, f2 = load_obj_numpy(p)
        np.testing.assert_allclose(v1, v2)
        np.testing.assert_array_equal(f1, f2)

    def test_binning_matches_numpy(self, tmp_path):
        rng = np.random.default_rng(0)
        n = 40
        v0 = rng.uniform(0, 2, (n, 3)).astype(np.float32)
        v1 = v0 + rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
        v2 = v0 + rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
        grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.5, dims=(5, 5, 5))
        table_c, maxc_c = bin_triangles(v0, v1, v2, grid.origin,
                                        grid.cell_size, grid.dims, cap=32)
        bins_np, maxc_np = bin_triangles_numpy(grid, (v0, v1, v2), cap=32)
        assert maxc_c == maxc_np
        # same triangle sets per cell (order may differ)
        tc = np.sort(np.asarray(table_c), axis=1)
        tn = np.sort(np.asarray(bins_np.tri_ids), axis=1)
        np.testing.assert_array_equal(tc, tn)

    def test_weld(self):
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [1e-9, 0, 0], [0, 1, 0]],
                           np.float32)
        faces = np.asarray([[0, 1, 3], [2, 1, 3]], np.int32)
        v2, f2 = weld_vertices(verts, faces, tol=1e-6)
        assert len(v2) == 3
        assert f2.max() < 3
        # the two faces now reference the same welded vertex
        assert f2[0, 0] == f2[1, 0]


class TestSphereMeshForces:
    def _setup(self):
        params = DEMParams(
            radius=jnp.asarray(0.05), mass=jnp.asarray(1.0),
            material=DEMMaterial(), wall_material=DEMMaterial(),
            gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(1e-4),
        )
        # a flat 2-triangle floor at z=0
        verts = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                           np.float32)
        faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        mesh = make_triangle_mesh(verts, faces)
        grid = GridSpec(origin=(-1.2, -1.2, -0.5), cell_size=0.2,
                        dims=(12, 12, 6))
        v0w, v1w, v2w = mesh_world_triangles(mesh)
        table, maxc = bin_triangles(np.asarray(v0w), np.asarray(v1w),
                                    np.asarray(v2w), grid.origin,
                                    grid.cell_size, grid.dims, cap=4,
                                    margin=0.1)
        bins = MeshBins(tri_ids=jnp.asarray(table), cap=4)
        return params, grid, bins, mesh

    def test_penetrating_sphere_pushed_up(self):
        params, grid, bins, mesh = self._setup()
        pos = jnp.asarray([[0.1, 0.1, 0.04]])     # 1cm penetration
        f, tau, fm, tm = sphere_mesh_forces(
            params, grid, bins, mesh, pos, jnp.zeros((1, 3)),
            jnp.zeros((1, 3)))
        assert float(f[0, 2]) > 0, "sphere must be pushed up"
        # Newton's third law on the mesh
        np.testing.assert_allclose(float(fm[2]), -float(f[0, 2]), rtol=1e-5)

    def test_separated_no_force(self):
        params, grid, bins, mesh = self._setup()
        pos = jnp.asarray([[0.0, 0.0, 0.2]])
        f, tau, fm, tm = sphere_mesh_forces(
            params, grid, bins, mesh, pos, jnp.zeros((1, 3)),
            jnp.zeros((1, 3)))
        np.testing.assert_allclose(np.asarray(f), 0.0)

    def test_moving_mesh_drags(self):
        # mesh moving +x under a resting sphere exerts +x friction
        params, grid, bins, mesh = self._setup()
        mesh = mesh.replace(frame_vel=jnp.asarray([1.0, 0.0, 0.0]))
        pos = jnp.asarray([[0.0, 0.0, 0.045]])
        f, tau, fm, tm = sphere_mesh_forces(
            params, grid, bins, mesh, pos, jnp.zeros((1, 3)),
            jnp.zeros((1, 3)))
        assert float(f[0, 0]) > 0, "friction should drag the sphere along"

    def test_ball_settles_on_mesh(self):
        # integrate a single particle falling onto the mesh floor
        params, grid, bins, mesh = self._setup()
        pos = jnp.asarray([[0.0, 0.0, 0.3]])
        vel = jnp.zeros((1, 3))
        omega = jnp.zeros((1, 3))
        h = float(params.dt)

        @jax.jit
        def step(pos, vel, omega):
            f, tau, _, _ = sphere_mesh_forces(params, grid, bins, mesh,
                                              pos, vel, omega)
            acc = f / params.mass + params.gravity
            vel = vel + h * acc
            omega = omega + h * tau / params.inertia
            return pos + h * vel, vel, omega

        for _ in range(6000):
            pos, vel, omega = step(pos, vel, omega)
        # rests at r above the plane (minus small static overlap)
        assert 0.044 < float(pos[0, 2]) < 0.051, f"z={float(pos[0,2])}"
        assert abs(float(vel[0, 2])) < 0.05
