"""Granular DEM physical-behavior tests.

Mirrors the reference's DEM test strategy (unit_tests/dem: ballistic, stacking,
pyramid friction-dependence) with analytic fixtures sized for CPU test runs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.dem import DEMSystem
from chrono_tpu.dem.neighbors import NeighborList, migrate_history
from chrono_tpu.utils.samplers import grid_sample_box, hcp_sample_box


def make_system(radius=0.05, box=((0, 0, 0), (1, 1, 1)), **kw):
    sys = DEMSystem(radius=radius, density=2500, box=box, **kw)
    sys.set_material(youngs=5e6, poisson=0.3, restitution=0.4, mu_s=0.5)
    sys.set_wall_material(youngs=5e6, poisson=0.3, restitution=0.4, mu_s=0.5)
    return sys


class TestDEMBasics:
    def test_ballistic_single(self):
        # one particle in free flight: parabola (no contacts at all)
        sys = make_system(box=((0, 0, 0), (2, 2, 4)))
        sys.create_particles(np.array([[1.0, 1.0, 3.0]]))
        t = 0.3
        sys.advance(t)
        t_actual = float(sys.state.time)
        # exact kick-drift (semi-implicit Euler) free-fall sum: z0 − g/2·t(t+h)
        z_expect = 3.0 - 0.5 * 9.81 * t_actual * (t_actual + sys.dt)
        np.testing.assert_allclose(sys.positions[0, 2], z_expect, rtol=1e-5)

    def test_bounce_restitution(self):
        # drop from h, restitution e: rebound apex ≈ e² h (Hertz damping is
        # velocity-dependent so equality is approximate)
        sys = make_system(radius=0.05, box=((0, 0, 0), (1, 1, 2)))
        e = 0.6
        sys.set_material(restitution=e)
        sys.set_wall_material(restitution=e)
        sys.create_particles(np.array([[0.5, 0.5, 0.55]]))
        h0 = 0.55 - 0.05  # drop height above ground contact
        apex = 0.0
        bounced = False
        for _ in range(160):
            sys.advance(0.01)
            z = sys.positions[0, 2]
            vz = sys.velocities[0, 2]
            if bounced:
                apex = max(apex, z)
            if not bounced and vz > 0.1:
                bounced = True
        h1 = apex - 0.05
        ratio = h1 / h0
        assert 0.7 * e**2 < ratio < 1.1 * e**2, f"rebound ratio {ratio}"

    def test_two_particle_head_on(self):
        # symmetric head-on: momentum conserved (zero), KE reduced by e²
        sys = make_system(radius=0.05, box=((0, 0, 0), (2, 1, 1)))
        sys.set_material(restitution=0.8, mu_s=0.0)
        sys = sys  # gravity off:
        sys._gravity = (0, 0, 0)
        sys.create_particles(
            np.array([[0.8, 0.5, 0.5], [1.2, 0.5, 0.5]]),
            vel=np.array([[1.0, 0, 0], [-1.0, 0, 0]]))
        sys.advance(0.25)
        v = sys.velocities
        np.testing.assert_allclose(v[0, 0] + v[1, 0], 0.0, atol=1e-4)
        e_meas = -v[0, 0] / 1.0
        assert 0.6 < e_meas <= 0.92, f"restitution {e_meas}"

    def test_settles_on_floor(self):
        sys = make_system(radius=0.05, box=((0, 0, 0), (0.5, 0.5, 1)))
        pts = grid_sample_box((0.05, 0.05, 0.05), (0.45, 0.45, 0.45), 0.11,
                              jitter=0.05, seed=1)
        sys.create_particles(pts)
        sys.advance(2.0)
        z = sys.positions[:, 2]
        # soft spheres (E=5e6) rest with ~1mm static Hertz overlap under load
        assert z.min() > 0.047, "particle through the floor"
        assert z.max() < 0.5, "particles should settle low"
        ke = sys.kinetic_energy() / len(pts)
        assert ke < 1e-3, f"not settled, KE/particle={ke}"

    def test_column_stack_friction(self):
        # two-sphere column stays stacked (no lateral drift) with friction
        sys = make_system(radius=0.05, box=((0, 0, 0), (0.4, 0.4, 1)))
        sys.create_particles(np.array([[0.2, 0.2, 0.0501],
                                       [0.2, 0.2, 0.1502]]))
        sys.advance(0.5)
        p = sys.positions
        np.testing.assert_allclose(p[:, 0], 0.2, atol=1e-3)
        np.testing.assert_allclose(p[1, 2] - p[0, 2], 0.1, atol=2e-3)

    def test_energy_decays_no_gain(self):
        sys = make_system(radius=0.05, box=((0, 0, 0), (0.5, 0.5, 0.5)))
        pts = hcp_sample_box((0.02, 0.02, 0.02), (0.48, 0.48, 0.3), 0.051)
        rng = np.random.default_rng(3)
        vel = rng.normal(0, 0.5, (len(pts), 3))
        sys.create_particles(pts, vel=vel)
        sys._gravity = (0, 0, 0)
        sys.create_particles(pts, vel=vel)  # rebuild with gravity off
        e0 = sys.kinetic_energy()
        for _ in range(5):
            sys.advance(0.05)
            e1 = sys.kinetic_energy()
            assert e1 < e0 * 1.01, "energy gained"
            e0 = e1


class TestNeighborMigration:
    def test_history_carries_and_zeroes(self):
        K = 4
        old = NeighborList(
            idx=jnp.asarray([[3, 7, -1, -1], [0, -1, -1, -1]]),
            valid=jnp.asarray([[True, True, False, False],
                               [True, False, False, False]]),
            overflow=jnp.zeros((), jnp.int32))
        hist = jnp.zeros((2, K, 3)).at[0, 0].set([1., 2., 3.]) \
                                   .at[0, 1].set([4., 5., 6.]) \
                                   .at[1, 0].set([7., 8., 9.])
        new = NeighborList(
            idx=jnp.asarray([[7, 2, 3, -1], [1, 0, -1, -1]]),
            valid=jnp.asarray([[True, True, True, False],
                               [True, True, False, False]]),
            overflow=jnp.zeros((), jnp.int32))
        out = np.asarray(migrate_history(old, hist, new))
        np.testing.assert_allclose(out[0, 0], [4, 5, 6])   # partner 7 carried
        np.testing.assert_allclose(out[0, 1], 0.0)         # new partner 2
        np.testing.assert_allclose(out[0, 2], [1, 2, 3])   # partner 3 carried
        np.testing.assert_allclose(out[1, 0], 0.0)         # new partner 1
        np.testing.assert_allclose(out[1, 1], [7, 8, 9])   # partner 0 carried


class TestSamplers:
    def test_grid_density(self):
        pts = grid_sample_box((0, 0, 0), (1, 1, 1), 0.1)
        assert len(pts) == 1000

    def test_hcp_spacing(self):
        pts = hcp_sample_box((0, 0, 0), (0.5, 0.5, 0.5), 0.05)
        assert len(pts) > 50
        from scipy.spatial import cKDTree  # noqa — scipy is available with jax
        d, _ = cKDTree(pts).query(pts, k=2)
        assert d[:, 1].min() > 0.099  # no overlap

    def test_poisson_min_dist(self):
        from chrono_tpu.utils.samplers import poisson_disk_sample_box
        pts = poisson_disk_sample_box((0, 0, 0), (0.5, 0.5, 0.5), 0.08, seed=2)
        from scipy.spatial import cKDTree
        d, _ = cKDTree(pts).query(pts, k=2)
        assert d[:, 1].min() >= 0.08 * 0.999
        assert len(pts) > 50


class TestConeBC:
    def test_funnel_holds_particle(self):
        """A particle dropped into an upward-opening cone funnel settles on
        the cone wall (the reference's cone BC behavior)."""
        from chrono_tpu.dem import DEMSystem, ConeBCs
        sys = make_system(radius=0.05, box=((-1, -1, 0), (1, 1, 2)))
        sys.set_boundaries(cones=ConeBCs(
            apex=jnp.asarray([[0.0, 0.0, 0.2]]),
            slope=jnp.asarray([1.0]),        # 45° half-angle, opens +z
            vel=jnp.zeros((1, 3))))
        # drop off-axis so it slides down the cone wall toward the apex
        sys.create_particles(np.array([[0.5, 0.0, 1.5]]))
        sys.advance(2.0)
        p = sys.positions[0]
        # settled deep in the funnel, near (not through) the apex region
        r_xy = np.hypot(p[0], p[1])
        h = p[2] - 0.2
        # on the wall: distance to surface ≈ radius
        dist = (h - r_xy) / np.sqrt(2.0)
        np.testing.assert_allclose(dist, 0.05, atol=0.01)
        assert np.abs(sys.velocities[0]).max() < 0.1


class TestIntegrators:
    """All four reference integrator types (ChDemDefines.h:42) agree on a
    smooth trajectory and stay stable through a bounce."""

    @pytest.mark.parametrize("integrator", [
        "forward_euler", "centered_difference", "extended_taylor", "chung"])
    def test_bounce_stable_and_consistent(self, integrator):
        sys = make_system(radius=0.05, box=((0, 0, 0), (1, 1, 2)),
                          integrator=integrator)
        sys.create_particles(np.array([[0.5, 0.5, 0.4]]))
        sys.advance(1.5)
        z = float(sys.positions[0, 2])
        assert np.isfinite(z)
        # settled on the floor: center ≈ radius (small Hertz compression)
        assert 0.03 < z < 0.08, f"{integrator}: z={z}"

    def test_chung_matches_euler_free_flight(self):
        out = {}
        for integ in ("forward_euler", "chung", "extended_taylor"):
            sys = make_system(box=((0, 0, 0), (2, 2, 4)), integrator=integ)
            sys.create_particles(np.array([[1.0, 1.0, 3.0]]))
            sys.advance(0.3)
            out[integ] = float(sys.positions[0, 2])
            out["t_actual"] = float(sys.state.time)
            out["dt"] = float(sys.dt)
        # constant-acceleration flight: 2nd-order schemes agree with the
        # exact parabola up to advance() cycle rounding of the end time and
        # the Chung startup (a_old = 0) offset, both O(h)
        t = out["t_actual"]
        h = out["dt"]
        z_exact = 3.0 - 0.5 * 9.81 * t * t
        tol = 2.0 * 9.81 * t * h
        assert abs(out["chung"] - z_exact) < tol
        assert abs(out["extended_taylor"] - z_exact) < tol


class TestConveyor:
    def test_conveyor_drags_particle(self):
        """A particle resting on a moving conveyor plane accelerates along
        the surface direction through friction (ChConveyor role)."""
        from chrono_tpu.dem.bc import DEMBoundaries, conveyor_plane
        from chrono_tpu.dem import DEMSystem

        sys = DEMSystem(radius=0.05, density=2500,
                        box=((0, 0, 0), (4, 1, 1)),
                        friction_mode="single_step")
        sys.set_material(youngs=5e6, poisson=0.3, restitution=0.1, mu_s=0.8)
        sys.set_wall_material(youngs=5e6, poisson=0.3, restitution=0.1,
                              mu_s=0.8)
        # conveyor surface ABOVE the (static) box floor so only the moving
        # plane touches the particle
        sys.set_boundaries(planes=conveyor_plane(
            (0, 0, 0.2), (0, 0, 1), (1.5, 0, 0)))
        sys.create_particles(np.array([[0.5, 0.5, 0.249]]))
        sys.advance(0.6)
        vx = float(sys.velocities[0, 0])
        wy = float(np.asarray(sys.state.omega)[0, 1])
        # a free ball on a belt rolls without slip: contact-point velocity
        # (v − ω r) matches the belt, translating at a fraction of belt speed
        v_contact = vx - wy * 0.05
        np.testing.assert_allclose(v_contact, 1.5, rtol=0.05)
        assert vx > 0.3, f"conveyor did not drag particle: vx={vx}"


class TestElasticPlasticRolling:
    def test_rolling_resistance_stops_a_rolling_ball(self):
        """A ball rolling on the floor: elastic-plastic rolling torque decays
        its spin; without it, rolling persists (ChDemDefines ELASTIC_PLASTIC).
        """
        def run(mode, mu_r):
            sys = make_system(radius=0.05, box=((0, 0, 0), (4, 1, 1)),
                              friction_mode="multi_step", rolling_mode=mode)
            sys.set_material(youngs=5e6, poisson=0.3, restitution=0.1,
                             mu_s=0.6, mu_r=mu_r)
            sys.set_wall_material(youngs=5e6, poisson=0.3, restitution=0.1,
                                  mu_s=0.6, mu_r=mu_r)
            sys.create_particles(np.array([[0.5, 0.5, 0.0495]]))
            st = sys.state
            # rolling without slip: v = ω r
            st = st.replace(vel=jnp.asarray([[1.0, 0.0, 0.0]]),
                            omega=jnp.asarray([[0.0, 20.0, 0.0]]))
            sys.state = st
            sys.advance(1.2)
            return float(sys.velocities[0, 0])

        v_free = run("none", 0.0)
        v_rr = run("elastic_plastic", 0.2)
        assert v_free > 0.8, f"free rolling should persist: v={v_free}"
        assert v_rr < 0.6 * v_free, \
            f"rolling resistance ineffective: {v_rr} vs {v_free}"
