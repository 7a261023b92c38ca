"""NSC (DVI) contact pipeline tests: narrowphase analytics, broadphase
correctness vs brute force, and physical-behavior fixtures (ball drop, friction
slide/stick, small settling pile) in the spirit of the reference's
unit_tests/multicore contact tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.collision import (
    GridSpec, SphereShapes, BoxShapes, CollisionModel, detect_contacts, nsc_step,
)
from chrono_tpu.collision import narrowphase as nph
from chrono_tpu.collision.cell_list import (
    build_cell_list, cell_ijk, neighbor_candidates, compact_rows,
)


class TestNarrowphase:
    def test_sphere_sphere(self):
        gap, n, p = nph.sphere_sphere(
            jnp.asarray([0.0, 0, 0]), jnp.asarray(1.0),
            jnp.asarray([1.5, 0, 0]), jnp.asarray(1.0))
        np.testing.assert_allclose(float(gap), -0.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(p), [0.75, 0, 0], atol=1e-6)

    def test_sphere_plane(self):
        gap, n, p = nph.sphere_plane(
            jnp.asarray([0.0, 0, 0.8]), jnp.asarray(1.0),
            jnp.asarray([0.0, 0, 0]), jnp.asarray([0.0, 0, 1.0]))
        np.testing.assert_allclose(float(gap), -0.2, atol=1e-6)
        np.testing.assert_allclose(np.asarray(n), [0, 0, -1], atol=1e-6)

    def test_sphere_box_outside_face(self):
        gap, n, p = nph.sphere_box(
            jnp.asarray([0.0, 0, 1.4]), jnp.asarray(0.5),
            jnp.zeros(3), Q.qidentity(), jnp.asarray([1.0, 1.0, 1.0]))
        np.testing.assert_allclose(float(gap), -0.1, atol=1e-6)
        np.testing.assert_allclose(np.asarray(n), [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(p), [0, 0, 1.0], atol=1e-6)

    def test_sphere_box_corner(self):
        c = jnp.asarray([2.0, 2.0, 2.0])
        gap, n, p = nph.sphere_box(
            c, jnp.asarray(0.5),
            jnp.zeros(3), Q.qidentity(), jnp.asarray([1.0, 1.0, 1.0]))
        d = np.sqrt(3.0)  # corner at (1,1,1), distance sqrt(3)
        np.testing.assert_allclose(float(gap), d - 0.5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(n), -np.ones(3) / np.sqrt(3),
                                   atol=1e-5)

    def test_sphere_box_inside(self):
        gap, n, p = nph.sphere_box(
            jnp.asarray([0.0, 0, 0.9]), jnp.asarray(0.2),
            jnp.zeros(3), Q.qidentity(), jnp.asarray([1.0, 1.0, 1.0]))
        assert float(gap) < -0.2  # fully penetrating
        np.testing.assert_allclose(np.asarray(n), [0, 0, -1], atol=1e-5)

    def test_sphere_box_rotated(self):
        rot = Q.q_from_axis_angle(jnp.asarray([0.0, 0, 1.0]), jnp.pi / 4)
        gap, n, p = nph.sphere_box(
            jnp.asarray([2.0, 0, 0.0]), jnp.asarray(0.5),
            jnp.zeros(3), rot, jnp.asarray([1.0, 1.0, 1.0]))
        # rotated box: nearest feature is the edge at distance 2 - sqrt(2)
        np.testing.assert_allclose(float(gap), 2 - np.sqrt(2) - 0.5, atol=1e-5)

    def test_sphere_triangle_face_edge_vertex(self):
        v0 = jnp.asarray([0.0, 0, 0])
        v1 = jnp.asarray([2.0, 0, 0])
        v2 = jnp.asarray([0.0, 2, 0])
        # face
        gap, n, p = nph.sphere_triangle(jnp.asarray([0.5, 0.5, 0.3]),
                                        jnp.asarray(0.5), v0, v1, v2)
        np.testing.assert_allclose(float(gap), -0.2, atol=1e-5)
        # vertex region
        gap, n, p = nph.sphere_triangle(jnp.asarray([-1.0, -1.0, 0.0]),
                                        jnp.asarray(0.5), v0, v1, v2)
        np.testing.assert_allclose(float(gap), np.sqrt(2) - 0.5, atol=1e-5)
        # edge region
        gap, n, p = nph.sphere_triangle(jnp.asarray([1.0, -1.0, 0.0]),
                                        jnp.asarray(0.5), v0, v1, v2)
        np.testing.assert_allclose(float(gap), 1.0 - 0.5, atol=1e-5)


class TestBroadphase:
    def test_vs_bruteforce(self):
        rng = np.random.default_rng(42)
        n = 200
        pos = jnp.asarray(rng.uniform(0.5, 7.5, size=(n, 3)).astype(np.float32))
        r = 0.3
        grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.7, dims=(12, 12, 12))
        cl = build_cell_list(grid, pos)
        qc = cell_ijk(grid, pos)
        cand, valid = neighbor_candidates(grid, cl, qc, max_per_cell=8)
        i = np.broadcast_to(np.arange(n)[:, None], cand.shape)
        j = np.asarray(cand)
        ok = np.asarray(valid) & (j > i)
        d = np.linalg.norm(np.asarray(pos)[i] - np.asarray(pos)[np.maximum(j, 0)],
                           axis=-1)
        found = set(map(tuple, np.stack([i[ok & (d < 2 * r)],
                                         j[ok & (d < 2 * r)]], axis=1)))
        # brute force
        P = np.asarray(pos)
        expect = set()
        for a in range(n):
            for b in range(a + 1, n):
                if np.linalg.norm(P[a] - P[b]) < 2 * r:
                    expect.add((a, b))
        assert found == expect

    def test_compact_rows(self):
        cand = jnp.asarray([[5, 7, 9, 11], [1, 2, 3, 4]])
        valid = jnp.asarray([[True, False, True, True], [False, False, False, True]])
        out, mask = compact_rows(cand, valid, k_out=3)
        np.testing.assert_array_equal(np.asarray(out), [[5, 9, 11], [4, -1, -1]])
        np.testing.assert_array_equal(np.asarray(mask),
                                      [[True, True, True], [True, False, False]])


def drop_scene(mu=0.5, n_spheres=1, solver="apgd", mu_roll=0.0,
               mu_spin=0.0):
    """Sphere(s) dropped in a box on the ground."""
    b = SystemBuilder()
    g = b.add_ground()
    ids = []
    for k in range(n_spheres):
        ids.append(b.add_body(mass=1.0, inertia=(0.4 * 0.5**2,) * 3,
                              pos=(0.1 * k, 0.07 * k, 1.0 + 1.2 * k)))
    model, state = b.finalize()
    spheres = SphereShapes(
        body=jnp.asarray(ids, jnp.int32),
        offset=jnp.zeros((n_spheres, 3)),
        radius=jnp.full((n_spheres,), 0.5),
        mu=jnp.full((n_spheres,), mu),
    )
    boxes = BoxShapes(
        body=jnp.asarray([g], jnp.int32),
        pos=jnp.asarray([[0.0, 0.0, -0.5]]),
        rot=Q.qidentity((1,)),
        half=jnp.asarray([[10.0, 10.0, 0.5]]),
        mu=jnp.asarray([mu]),
    )
    coll = CollisionModel(
        spheres=spheres, boxes=boxes,
        grid=GridSpec(origin=(-12.0, -12.0, -2.0), cell_size=1.2,
                      dims=(20, 20, 8)),
        max_per_cell=8, max_contacts=64,
        mu_roll=mu_roll, mu_spin=mu_spin,
    )
    return model, coll, state


def run_contact(model, coll, state, h, n, settings):
    @jax.jit
    def step_n(state):
        def body(carry, k):
            st, t = carry
            st, contacts, info = nsc_step(model, coll, st, t, h, settings)
            return (st, t + h), None

        (st, _), _ = jax.lax.scan(body, (state, jnp.asarray(0.0)),
                                  jnp.arange(n))
        return st

    return step_n(state)


class TestContactDynamics:
    def test_ball_rests_on_ground(self):
        model, coll, state = drop_scene()
        settings = SolverSettings(solver="apgd", max_iter=80, tol=1e-7,
                                  stab_factor=0.2)
        final = run_contact(model, coll, state, 5e-3, 400, settings)
        # ball falls 0.5m then rests at z=0.5 (radius above ground plane at 0)
        np.testing.assert_allclose(float(final.x[1, 2]), 0.5, atol=0.01)
        assert abs(float(final.v[1, 2])) < 0.05

    def test_frictionless_slide(self):
        # ball on ground with horizontal initial velocity, mu=0: keeps sliding
        model, coll, state = drop_scene(mu=0.0)
        state = state.replace(v=state.v.at[1, 0].set(2.0),
                              x=state.x.at[1, 2].set(0.5))
        settings = SolverSettings(solver="apgd", max_iter=80, tol=1e-7,
                                  stab_factor=0.2)
        final = run_contact(model, coll, state, 5e-3, 200, settings)
        np.testing.assert_allclose(float(final.v[1, 0]), 2.0, atol=0.02)

    def test_friction_stops_sliding(self):
        # mu=0.5 dissipates the slide; v→rolling or stopped, x < frictionless
        model, coll, state = drop_scene(mu=0.5)
        state = state.replace(v=state.v.at[1, 0].set(2.0),
                              x=state.x.at[1, 2].set(0.5))
        settings = SolverSettings(solver="apgd", max_iter=150, tol=1e-8,
                                  stab_factor=0.2)
        final = run_contact(model, coll, state, 5e-3, 300, settings)
        # with friction, sliding transitions to rolling: v = 2/(1+2/5) ≈ 1.43
        v_roll = 2.0 / (1.0 + 2.0 / 5.0)
        np.testing.assert_allclose(float(final.v[1, 0]), v_roll, atol=0.05)
        # rolling without slipping: v + ω×r_c = 0 with r_c = (0,0,-r) → ω_y = +v/r
        np.testing.assert_allclose(float(final.w[1, 1]),
                                   v_roll / 0.5, atol=0.15)

    def test_stack_settles(self):
        model, coll, state = drop_scene(mu=0.4, n_spheres=3)
        settings = SolverSettings(solver="apgd", max_iter=120, tol=1e-7,
                                  stab_factor=0.2)
        final = run_contact(model, coll, state, 5e-3, 600, settings)
        z = np.sort(np.asarray(final.x[1:, 2]))
        # three balls settle onto the ground (offsets make them tumble apart);
        # all end at z≈0.5.  Without rolling resistance they may keep ROLLING,
        # but contact-point slip must be ~zero (stick) and vertical motion dead.
        assert np.all(z > 0.45) and np.all(z < 0.55)
        assert np.abs(np.asarray(final.v[1:, 2])).max() < 0.02
        from chrono_tpu.core import quaternion as Q2
        w_world = np.asarray(Q2.qrotate(final.q[1:], final.w[1:]))
        v_xy = np.asarray(final.v[1:, :2])
        slip = v_xy + np.cross(w_world, np.array([0.0, 0.0, -0.5]))[:, :2]
        assert np.abs(slip).max() < 0.1, f"contact slip {slip}"

    def test_rolling_friction_stops_rolling(self):
        """NSC rolling-resistance rows (ChContactNSCrolling role): a sphere
        rolling without slip keeps rolling forever with μ_r=0, but μ_r>0
        decelerates it at a = μ_r·N/(r·m·(1+I/(m r²))) until it stops."""
        v_roll = 2.0 / (1.0 + 2.0 / 5.0)  # post-slide rolling speed
        settings = SolverSettings(solver="apgd", max_iter=150, tol=1e-8,
                                  stab_factor=0.2)

        def run(mu_roll, n):
            model, coll, state = drop_scene(mu=0.5, mu_roll=mu_roll)
            state = state.replace(
                x=state.x.at[1, 2].set(0.5),
                v=state.v.at[1, 0].set(v_roll),
                w=state.w.at[1, 1].set(v_roll / 0.5))
            return run_contact(model, coll, state, 5e-3, n, settings)

        free = run(0.0, 300)
        np.testing.assert_allclose(float(free.v[1, 0]), v_roll, atol=0.05)

        # μ_r=0.1 m → a = 0.1·9.81/(0.5·1.4) = 1.40 m/s²: stopped well
        # within 1.5 s
        resisted = run(0.1, 300)
        assert abs(float(resisted.v[1, 0])) < 0.1, \
            f"still rolling: v={float(resisted.v[1, 0])}"
        assert abs(float(resisted.w[1, 1])) < 0.25
        # deceleration magnitude at ~0.5 s (still rolling): v ≈ v0 − a·t
        mid = run(0.1, 100)
        np.testing.assert_allclose(float(mid.v[1, 0]),
                                   v_roll - 1.4014 * 0.5, atol=0.1)

    def test_spinning_friction_stops_spin(self):
        """μ_spin resists rotation about the contact normal: α = μ_s·N/I."""
        settings = SolverSettings(solver="apgd", max_iter=150, tol=1e-8,
                                  stab_factor=0.2)

        def run(mu_spin, n):
            model, coll, state = drop_scene(mu=0.5, mu_spin=mu_spin)
            state = state.replace(x=state.x.at[1, 2].set(0.5),
                                  w=state.w.at[1, 2].set(3.0))
            return run_contact(model, coll, state, 5e-3, n, settings)

        free = run(0.0, 200)
        np.testing.assert_allclose(float(free.w[1, 2]), 3.0, atol=0.05)
        # μ_s=0.05 → α = 0.05·9.81/0.1 = 4.9 rad/s²: stops at ~0.61 s
        spun = run(0.05, 200)
        assert abs(float(spun.w[1, 2])) < 0.2, \
            f"still spinning: w={float(spun.w[1, 2])}"
        mid = run(0.05, 60)  # 0.3 s: w ≈ 3 − 4.9·0.3 = 1.53
        np.testing.assert_allclose(float(mid.w[1, 2]), 1.53, atol=0.15)

    def test_contact_count(self):
        model, coll, state = drop_scene()
        state = state.replace(x=state.x.at[1, 2].set(0.49))
        contacts = detect_contacts(coll, state)
        assert int(contacts.count) == 1
        assert bool(contacts.active[0])
        np.testing.assert_allclose(float(contacts.gap[0]), -0.01, atol=1e-5)


def test_apgd_history_records_convergence():
    """Per-iteration violation/Δγ histories (ChIterativeSolverVI.h:74-90)."""
    import jax.numpy as jnp
    from chrono_tpu.solver.vi import solve_apgd, solve_apgd_with_history

    rng = np.random.default_rng(0)
    n = 24
    A = rng.standard_normal((n, n)).astype(np.float32)
    N = A @ A.T + n * np.eye(n, dtype=np.float32)
    r = rng.standard_normal(n).astype(np.float32)
    Nop = lambda g: jnp.asarray(N) @ g
    project = lambda g: jnp.maximum(g, 0.0)     # simple NCP cone
    g0 = jnp.zeros((n,))
    sol, hist = solve_apgd_with_history(Nop, jnp.asarray(r), project, g0,
                                        max_iter=120, tol=1e-8)
    v = np.asarray(hist.violation)
    assert v[-1] < 5e-3 * v[0]                  # converged (fp32 floor)
    assert np.asarray(hist.delta_gamma).shape == (120,)
    # matches the while-loop solver's answer
    ref = solve_apgd(Nop, jnp.asarray(r), project, g0, 400, 1e-10)
    np.testing.assert_allclose(np.asarray(sol.gamma), np.asarray(ref.gamma),
                               atol=2e-3)


class TestConvexNSC:
    """MPR convex shapes wired into the NSC pipeline
    (ChNarrowphaseMPR.cpp:584 role inside the multicore contact flow)."""

    def _scene(self):
        from chrono_tpu.collision.pipeline import ConvexShapes
        from chrono_tpu.collision import mpr

        b = SystemBuilder()
        g = b.add_ground()
        cap = b.add_body(mass=2.0, inertia=(0.1, 0.15, 0.15),
                         pos=(0.0, 0.0, 0.6))
        model, state = b.finalize()
        # capsule axis is local z; rotate it to world x (about y by 90°)
        qy = np.array([np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0])
        V = 8
        convex = ConvexShapes(
            body=jnp.asarray([g, cap], jnp.int32),
            kind=jnp.asarray([mpr.BOX, mpr.CAPSULE], jnp.int32),
            pos=jnp.asarray([[0.0, 0.0, -0.5], [0.0, 0.0, 0.0]]),
            rot=jnp.asarray([[1.0, 0, 0, 0], qy], jnp.float32),
            data=jnp.asarray([[10.0, 10.0, 0.5], [0.25, 0.3, 0.0]]),
            verts=jnp.zeros((2, V, 3)),
            mu=jnp.asarray([0.5, 0.5]),
        )
        spheres = SphereShapes(body=jnp.zeros((0,), jnp.int32),
                               offset=jnp.zeros((0, 3)),
                               radius=jnp.zeros((0,)), mu=jnp.zeros((0,)))
        coll = CollisionModel(
            spheres=spheres, boxes=None, convex=convex,
            grid=GridSpec(origin=(-12.0, -12.0, -2.0), cell_size=1.2,
                          dims=(20, 20, 8)),
            max_per_cell=8, max_contacts=16,
        )
        return model, coll, state, cap

    def test_capsule_box_detection(self):
        model, coll, state, cap = self._scene()
        # sink the capsule into the floor: center at z = 0.2 < r = 0.25
        state = state.replace(x=state.x.at[cap, 2].set(0.2))
        c = detect_contacts(coll, state)
        assert int(c.count) == 1
        k = int(jnp.argmax(c.active))
        assert float(c.gap[k]) < 0.0
        n = np.asarray(c.normal[k])
        # ground is body A or B; normal must be ±z up to MPR tolerance
        assert abs(abs(n[2]) - 1.0) < 0.05, n

    def test_capsule_settles_on_floor(self):
        model, coll, state, cap = self._scene()
        settings = SolverSettings(solver="apgd", max_iter=120,
                                  stab_factor=0.2)
        st = run_contact(model, coll, state, 2e-3, 600, settings)
        z = float(st.x[cap, 2])
        assert np.isfinite(z)
        assert abs(z - 0.25) < 0.03, f"capsule rest height {z}"
