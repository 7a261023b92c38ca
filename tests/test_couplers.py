"""New joint types (point_plane, rev_spherical, oldham) and velocity-level
transmission couplers (gear, pulley, rack_pinion, screw).

Reference roles: ChLinkLockPointPlane / ChLinkRevoluteSpherical /
ChLinkLockOldham / ChLinkLockGear / ChLinkLockPulley / ChLinkRackpinion /
ChLinkLockScrew (/root/reference/src/chrono/physics/ChLinkLock.h,
ChLinkRevoluteSpherical.h, ChLinkRackpinion.h).  Each test uses an analytic
kinematic oracle and runs the whole trajectory as one compiled scan.
"""

import numpy as np

from chrono_tpu.core.functions import FConst
from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.system import SolverSettings, simulate
from chrono_tpu.physics.joints import joint_violation

SET = SolverSettings(solver="direct")


def test_point_plane_slides_on_tilted_plane():
    """Ball constrained to a tilted plane under gravity stays on the plane."""
    normal = np.array([0.3, 0.0, 1.0])
    normal /= np.linalg.norm(normal)
    bld = SystemBuilder()
    g = bld.add_ground()
    b = bld.add_body(mass=1.0, pos=(0, 0, 0))
    bld.add_joint("point_plane", g, b, world_pos=(0, 0, 0), world_axis=normal)
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 400, SET)
    p = np.asarray(state.x[b])
    # stayed in the plane through the origin
    assert abs(float(p @ normal)) < 2e-3
    # but slid downhill a macroscopic distance
    assert np.linalg.norm(p) > 0.05


def test_rev_spherical_keeps_distance_and_plane():
    """Point mass at distance r from a vertical axis, swinging under gravity."""
    r = 0.4
    bld = SystemBuilder()
    g = bld.add_ground()
    b = bld.add_body(mass=2.0, pos=(r, 0, 0), vel=(0, 0.5, 0))
    bld.add_rev_spherical(g, b, axis_point_world=(0, 0, 0),
                          axis_world=(0, 0, 1))
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 500, SET)
    p = np.asarray(state.x[b])
    assert abs(p[2]) < 2e-3                       # in the z=0 plane
    np.testing.assert_allclose(np.hypot(p[0], p[1]), r, atol=2e-3)
    # circular motion persisted
    assert abs(p[1]) > 0.1


def test_oldham_locks_rotation_allows_inplane_offset():
    bld = SystemBuilder()
    g = bld.add_ground()
    b = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.1), pos=(0.1, 0.05, 0))
    bld.add_joint("oldham", g, b, world_pos=(0, 0, 0), world_axis=(0, 0, 1))
    bld.set_gravity((0.5, 0, -9.81))
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 300, SET)
    q = np.asarray(state.q[b])
    # rotation fully locked (quaternion stays identity)
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=2e-3)
    # z translation locked, in-plane translation moved with gravity x-component
    assert abs(float(state.x[b, 2])) < 2e-3
    assert float(state.x[b, 0]) > 0.11
    viol = np.asarray(joint_violation("oldham", model.joints["oldham"],
                                      state.x, state.q))
    assert np.abs(viol).max() < 5e-3


def test_gear_external_counter_rotates():
    """External gear r_a/r_b = 2: ω_b = −2 ω_a, driven by torque on a."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    g = bld.add_ground()
    a = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.2), pos=(0, 0, 0))
    b = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.5), pos=(0.3, 0, 0))
    bld.add_joint("revolute", g, a, world_pos=(0, 0, 0), world_axis=(0, 0, 1))
    bld.add_joint("revolute", g, b, world_pos=(0.3, 0, 0),
                  world_axis=(0, 0, 1))
    bld.add_gear(a, b, ratio=2.0)
    bld.add_motor_rotation_torque(g, a, (0, 0, 0), (0, 0, 1), FConst(0.5),
                                  add_joint=False)
    model, state = bld.finalize()
    h, n = 1e-3, 300
    state, _ = simulate(model, state, h, n, SET)
    wa = float(state.w[a, 2])
    wb = float(state.w[b, 2])
    assert wa > 0.05
    np.testing.assert_allclose(wb, -2.0 * wa, rtol=1e-4)
    # effective inertia: J_a + 4 J_b
    np.testing.assert_allclose(wa, 0.5 * n * h / (0.2 + 4 * 0.5), rtol=1e-3)


def test_pulley_co_rotates():
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    g = bld.add_ground()
    a = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.2))
    b = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.4), pos=(0.5, 0, 0))
    bld.add_joint("revolute", g, a, world_pos=(0, 0, 0), world_axis=(0, 0, 1))
    bld.add_joint("revolute", g, b, world_pos=(0.5, 0, 0),
                  world_axis=(0, 0, 1))
    bld.add_pulley(a, b, ratio=3.0)
    bld.add_motor_rotation_torque(g, a, (0, 0, 0), (0, 0, 1), FConst(1.0),
                                  add_joint=False)
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 200, SET)
    np.testing.assert_allclose(float(state.w[b, 2]),
                               3.0 * float(state.w[a, 2]), rtol=1e-4)
    assert float(state.w[a, 2]) > 0.05


def test_rack_pinion_velocity_coupling():
    """Pinion spin about z drives rack translation along x: v = -r ω."""
    r = 0.1
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    g = bld.add_ground()
    pin = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.2))
    rack = bld.add_body(mass=2.0, pos=(0, 0, -r))
    bld.add_joint("revolute", g, pin, world_pos=(0, 0, 0),
                  world_axis=(0, 0, 1))
    bld.add_joint("prismatic", g, rack, world_pos=(0, 0, -r),
                  world_axis=(1, 0, 0))
    bld.add_rack_pinion(pin, rack, radius=r, pinion_axis=(0, 0, 1),
                        rack_dir=(1, 0, 0))
    bld.add_motor_rotation_torque(g, pin, (0, 0, 0), (0, 0, 1), FConst(0.2),
                                  add_joint=False)
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 300, SET)
    w = float(state.w[pin, 2])
    v = float(state.v[rack, 0])
    assert w > 0.05
    np.testing.assert_allclose(v, -r * w, rtol=1e-4)


def test_screw_advance_per_revolution():
    """Nut on a driven screw advances pitch per revolution."""
    pitch = 0.02
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    g = bld.add_ground()
    nut = bld.add_body(mass=1.0, inertia=(0.05, 0.05, 0.05), pos=(0, 0, 0))
    bld.add_screw(g, nut, pitch=pitch, world_pos=(0, 0, 0),
                  world_axis=(0, 0, 1))
    # spin the nut with a motor about the screw axis
    bld.add_motor_rotation_speed(g, nut, (0, 0, 0), (0, 0, 1),
                                 FConst(4.0), add_joint=False)
    model, state = bld.finalize()
    h, n = 1e-3, 500
    state, _ = simulate(model, state, h, n, SET)
    turns = 4.0 * n * h / (2 * np.pi)
    np.testing.assert_allclose(float(state.x[nut, 2]), pitch * turns,
                               rtol=2e-3, atol=1e-5)


def test_align_locks_rotation_frees_translation():
    """ChLinkLockAlign role: orientation welded, translation free-falls."""
    bld = SystemBuilder()
    g = bld.add_ground()
    b = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.1), pos=(0.2, 0, 0))
    bld.add_joint("align", g, b, world_pos=(0.2, 0, 0), world_axis=(0, 0, 1))
    bld.set_gravity((0.0, 0.0, -9.81))
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 300, SET)
    q = np.asarray(state.q[b])
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=2e-3)
    # fell freely: z ~ -g t^2 / 2
    z = float(state.x[b, 2])
    np.testing.assert_allclose(z, -0.5 * 9.81 * 0.3**2, rtol=0.05)


def test_rev_prismatic_frees_x_translation_and_z_rotation():
    """ChLinkLockRevolutePrismatic role: slide along x + spin about z only."""
    bld = SystemBuilder()
    g = bld.add_ground()
    b = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.1), pos=(0, 0, 0),
                     vel=(0.3, 0, 0), omega_local=(0, 0, 2.0))
    bld.add_joint("rev_prismatic", g, b, world_pos=(0, 0, 0),
                  world_axis=(0, 0, 1))
    bld.set_gravity((0.0, 0.2, -9.81))
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 300, SET)
    p = np.asarray(state.x[b])
    # x slid; y and z locked despite gravity components
    assert p[0] > 0.05
    assert abs(p[1]) < 2e-3 and abs(p[2]) < 2e-3
    # still spinning about z; z axis stayed aligned
    w = np.asarray(state.w[b])
    assert w[2] > 1.0
    from chrono_tpu.core import quaternion as Q
    import jax.numpy as jnp
    ez = np.asarray(Q.qrotate(jnp.asarray(state.q[b]),
                              jnp.asarray([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(ez, [0, 0, 1], atol=2e-3)


def test_mate_xdistance_holds_offset():
    """ChLinkMateXdistance role: point held at distance d along the axis."""
    d = 0.15
    bld = SystemBuilder()
    g = bld.add_ground()
    b = bld.add_body(mass=1.0, pos=(0.0, 0.0, d))
    # frame a at the ground origin, anchor = body-b CENTER (explicit
    # per-frame placement; a single world_pos would anchor b at the
    # ground origin instead)
    bld.add_joint_frames("mate_xdistance", g, b, fa_pos=(0, 0, 0),
                         fb_pos=(0, 0, 0), aux=d)
    bld.set_gravity((0.3, 0.0, -9.81))
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 300, SET)
    p = np.asarray(state.x[b])
    np.testing.assert_allclose(p[2], d, atol=2e-3)   # offset held
    assert p[0] > 0.01                               # free in-plane
