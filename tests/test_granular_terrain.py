"""GranularTerrain (DEM patch + vehicle wheels) tests.

The reference's GranularTerrain role
(src/chrono_vehicle/terrain/GranularTerrain.h): wheel-shaped moving boundary
conditions on the DEM bed with reaction feedback to the MBS.  Checks the
wheel-cylinder SDF geometry, the moving-surface velocity, and the coupled
behavior (a loaded driven wheel settles onto the bed, is supported by it, and
drives forward)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from chrono_tpu.dem.bc import WheelBCs, wheel_contacts
from chrono_tpu.dem.params import DEMParams, DEMMaterial
from chrono_tpu.physics import SystemBuilder
from chrono_tpu.vehicle.granular_terrain import (
    make_granular_terrain_state, make_granular_advance_fn, GranularFSIState,
)


def one_wheel(center=(0.0, 0.0, 0.0), axis=(0.0, 1.0, 0.0), R=0.2, hw=0.05,
              vel=(0.0, 0.0, 0.0), omega=(0.0, 0.0, 0.0)):
    return WheelBCs(center=jnp.asarray([center]), axis=jnp.asarray([axis]),
                    radius=jnp.asarray([R]), half_width=jnp.asarray([hw]),
                    vel=jnp.asarray([vel]), omega=jnp.asarray([omega]))


class TestWheelSDF:
    def test_lateral(self):
        bc = one_wheel()
        c = wheel_contacts(bc, jnp.asarray([[0.25, 0.0, 0.0]]), 0.03)
        np.testing.assert_allclose(float(c.gap[0, 0]), 0.25 - 0.2 - 0.03,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c.normal[0, 0]), [1, 0, 0],
                                   atol=1e-5)

    def test_below_tread(self):
        bc = one_wheel()
        c = wheel_contacts(bc, jnp.asarray([[0.0, 0.0, -0.22]]), 0.03)
        np.testing.assert_allclose(float(c.gap[0, 0]), 0.02 - 0.03, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c.normal[0, 0]), [0, 0, -1],
                                   atol=1e-5)

    def test_cap(self):
        bc = one_wheel()
        c = wheel_contacts(bc, jnp.asarray([[0.0, 0.09, 0.0]]), 0.01)
        np.testing.assert_allclose(float(c.gap[0, 0]), 0.04 - 0.01, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c.normal[0, 0]), [0, 1, 0],
                                   atol=1e-5)

    def test_edge(self):
        bc = one_wheel()
        p = jnp.asarray([[0.2 + 0.03, 0.05 + 0.04, 0.0]])
        c = wheel_contacts(bc, p, 0.0)
        np.testing.assert_allclose(float(c.gap[0, 0]), 0.05, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c.normal[0, 0]),
                                   [0.6, 0.8, 0.0], atol=1e-5)

    def test_penetrating(self):
        bc = one_wheel()
        c = wheel_contacts(bc, jnp.asarray([[0.0, 0.0, -0.19]]), 0.03)
        assert float(c.gap[0, 0]) < 0  # −0.01−0.03
        np.testing.assert_allclose(float(c.gap[0, 0]), -0.01 - 0.03,
                                   atol=1e-5)

    def test_surface_velocity_spin(self):
        # wheel spinning about +y at ω: bottom surface point moves at −ω·R x̂
        w = 3.0
        bc = one_wheel(omega=(0.0, w, 0.0), vel=(1.0, 0.0, 0.0))
        c = wheel_contacts(bc, jnp.asarray([[0.0, 0.0, -0.25]]), 0.03)
        np.testing.assert_allclose(np.asarray(c.vel[0, 0]),
                                   [1.0 - w * 0.2, 0.0, 0.0], atol=1e-5)


class TestCoupledWheel:
    def test_wheel_settles_and_drives(self):
        r = 0.01
        density = 2500.0
        mass = density * 4 / 3 * np.pi * r**3
        mat = DEMMaterial(youngs=2e6, poisson=0.3, restitution=0.4,
                          mu_s=0.6, mu_r=0.1)
        params = DEMParams(
            radius=jnp.asarray(r), mass=jnp.asarray(mass),
            material=mat, wall_material=mat,
            gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(2e-5),
            max_neighbors=16, max_per_cell=8, rebuild_every=20,
            friction_mode="single_step", rolling_mode="schwartz",
            integrator="centered_difference")

        R_w, W_w = 0.08, 0.05
        bed = (0.5, 0.14)
        depth = 0.06
        x0 = 0.14
        z0 = depth + R_w - 0.005

        def carve(pts):
            dxz = pts[:, [0, 2]] - np.array([x0, z0])
            in_r = np.linalg.norm(dxz, axis=1) < (R_w + r)
            in_y = np.abs(pts[:, 1] - bed[1] / 2) < (W_w / 2 + r)
            return ~(in_r & in_y)

        terrain, grid, bcs = make_granular_terrain_state(
            params, bed, depth, R_w, W_w, n_wheels=1, carve_fn=carve)
        n = terrain.pos.shape[0]
        assert n > 400

        bld = SystemBuilder()
        bld.set_gravity((0, 0, -9.81))
        wheel = bld.add_body(mass=3.0, inertia=(0.01, 0.015, 0.01),
                             pos=(x0, bed[1] / 2, z0))
        model, bodies = bld.finalize()

        def drive(t, b):
            f = jnp.zeros((model.n_bodies, 3))
            tau = jnp.zeros((model.n_bodies, 3))
            tau = tau.at[wheel, 1].add(jnp.where(t > 0.06, 0.35, 0.0))
            # keep the single wheel upright/on-track (the chassis's job in a
            # full vehicle): damp lateral drift
            f = f.at[wheel, 1].add(-20.0 * b.v[wheel, 1])
            return f, tau

        adv = make_granular_advance_fn(model, params, bcs, grid,
                                       n_substeps=params.rebuild_every,
                                       wheel_bodies=[wheel], f_ext_fn=drive)
        state = GranularFSIState(bodies=bodies, terrain=terrain,
                                 time=jnp.zeros(()))
        state, ovf = adv(state, 550)   # 0.22 s
        assert int(ovf) == 0
        zw = float(state.bodies.x[wheel, 2])
        xw = float(state.bodies.x[wheel, 0])
        wy = float(state.bodies.w[wheel, 1])
        # supported by the bed: not fallen through, settled near/below start
        assert zw > depth + R_w - 0.03, zw
        assert zw < z0 + 0.01, zw
        # wheel spun up and moved forward
        assert wy > 1.2, wy
        assert xw > x0 + 0.005, xw
        # particles stay in the box
        p = np.asarray(state.terrain.pos)
        assert p[:, 2].min() > -0.01 and np.isfinite(p).all()
