"""Solid-axle, semi-trailing-arm and five-link suspension templates
(reference: ChSolidAxle.h, ChSemiTrailingArm.h, ChMultiLink.h)."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.system import SolverSettings, simulate
from chrono_tpu.vehicle.suspension import (
    SolidAxleHardpoints, add_solid_axle, add_semi_trailing_arm_corner,
    add_five_link_corner, WishboneHardpoints, wheel_camber,
)

SET = SolverSettings(solver="direct")


def test_solid_axle_settles_and_rolls_together():
    bld = SystemBuilder()
    chassis = bld.add_ground()
    hp = SolidAxleHardpoints()
    ax = add_solid_axle(bld, chassis, (0, 0, 0), hp)
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 600, SET)
    # axle settled below assembly height by ~weight/(2k)
    m_tot = hp.axle_mass + 2 * hp.wheel_mass
    sag_ref = m_tot * 9.81 / (2 * hp.spring_k)
    sag = 0.35 - float(state.x[ax.axle, 2])
    np.testing.assert_allclose(sag, sag_ref, rtol=0.25)
    # both wheels move WITH the axle (rigid connection)
    np.testing.assert_allclose(float(state.x[ax.wheel_l, 2]),
                               float(state.x[ax.axle, 2]), atol=2e-3)
    np.testing.assert_allclose(float(state.x[ax.wheel_r, 2]),
                               float(state.x[ax.axle, 2]), atol=2e-3)
    assert np.isfinite(np.asarray(state.x)).all()


def test_semi_trailing_arm_camber_with_travel():
    """Swept pivot axis → bump travel produces camber (the template's
    kinematic signature; a pure trailing arm, sweep=0, produces none)."""

    def run(sweep):
        bld = SystemBuilder()
        chassis = bld.add_ground()
        c = add_semi_trailing_arm_corner(bld, chassis, (0, 0, 0),
                                         sweep_deg=sweep, spring_k=30e3)
        model, state = bld.finalize()
        state, _ = simulate(model, state, 1e-3, 500, SET)
        dz = float(state.x[c.wheel, 2]) - 0.35
        cam = float(wheel_camber(state.q[c.wheel]))
        return dz, cam

    dz0, cam0 = run(0.0)
    dz30, cam30 = run(30.0)
    assert dz0 < -0.01 and dz30 < -0.01            # both sagged
    assert abs(cam0) < 0.01                        # pure trailing: no camber
                          # swept: camber appears
    assert abs(cam30) > 5 * abs(cam0)


def test_five_link_single_dof_travel():
    bld = SystemBuilder()
    chassis = bld.add_ground()
    hp = WishboneHardpoints(spring_k=60e3, spring_c=4e3)
    c = add_five_link_corner(bld, chassis, (0, 0, 0), hp)
    model, state = bld.finalize()
    st, _ = simulate(model, state, 1e-3, 600, SET)
    # upright travelled down but stayed located laterally/longitudinally
    assert float(st.x[c.upright, 2]) < 0.35 - 0.005
    assert abs(float(st.x[c.upright, 0]) - 0.0) < 0.02
    assert abs(float(st.x[c.upright, 1]) - 0.0) < 0.03
    # all five rods hold their lengths
    from chrono_tpu.physics.joints import joint_violation
    viol = np.asarray(joint_violation(
        "distance", model.joints["distance"], st.x, st.q))
    assert np.abs(viol).max() < 1e-3
    assert np.isfinite(np.asarray(st.x)).all()


# ---------------------------------------------------------------------------
# round-3 template breadth (reference suspension/Ch*.h families)
# ---------------------------------------------------------------------------

import pytest
from chrono_tpu.vehicle.suspension import (
    add_single_wishbone_corner, add_double_wishbone_reduced_corner,
    add_leafspring_axle, add_sae_leafspring_axle, add_dedion_axle,
    add_pushpipe_axle, add_rigid_panhard_axle, add_rigid_pinned_axle,
    add_rigid_suspension, add_solid_three_link_axle,
    add_three_link_irs_corner, add_hendrickson_primaxx,
)

CORNER_TEMPLATES = [
    ("single_wishbone", add_single_wishbone_corner),
    ("wishbone_reduced", add_double_wishbone_reduced_corner),
    ("three_link_irs", add_three_link_irs_corner),
]

AXLE_TEMPLATES = [
    ("leafspring", add_leafspring_axle),
    ("sae_leafspring", add_sae_leafspring_axle),
    ("dedion", add_dedion_axle),
    ("pushpipe", add_pushpipe_axle),
    ("rigid_panhard", add_rigid_panhard_axle),
    ("solid_three_link", add_solid_three_link_axle),
    ("hendrickson", add_hendrickson_primaxx),
]


@pytest.mark.parametrize("name,builder", CORNER_TEMPLATES,
                         ids=[t[0] for t in CORNER_TEMPLATES])
def test_corner_template_settles(name, builder):
    """Each independent corner assembles, settles on its spring under
    gravity (finite, bounded sag, wheel spin axis stays near lateral)."""
    bld = SystemBuilder()
    chassis = bld.add_ground()
    if name == "three_link_irs":
        c = builder(bld, chassis, (0, 0, 0))
        z0 = 0.35
    else:
        c = builder(bld, chassis, (0, 0, 0))
        z0 = WishboneHardpoints().spindle[2]
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 500, SET)
    assert np.isfinite(np.asarray(state.x)).all()
    dz = float(state.x[c.wheel, 2]) - z0
    assert -0.25 < dz < 0.005, dz          # sags, doesn't fall through
    cam = float(wheel_camber(state.q[c.wheel]))
    assert abs(cam) < 0.35                 # spin axis still near lateral


@pytest.mark.parametrize("name,builder", AXLE_TEMPLATES,
                         ids=[t[0] for t in AXLE_TEMPLATES])
def test_axle_template_settles(name, builder):
    """Each axle template assembles and settles; both wheels stay level
    with the beam (or the chassis height for the rigid templates)."""
    bld = SystemBuilder()
    chassis = bld.add_ground()
    hp = SolidAxleHardpoints()
    ax = builder(bld, chassis, (0, 0, 0), hp)
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 600, SET)
    assert np.isfinite(np.asarray(state.x)).all()
    zl = float(state.x[ax.wheel_l, 2])
    zr = float(state.x[ax.wheel_r, 2])
    assert 0.1 < zl < 0.4 and 0.1 < zr < 0.4, (zl, zr)
    assert abs(zl - zr) < 0.01             # symmetric settle
    if ax.axle >= 0:
        np.testing.assert_allclose(zl, float(state.x[ax.axle, 2]), atol=5e-3)


def test_rigid_pinned_axle_pure_roll():
    """ChRigidPinnedAxle signature: the beam can only roll about the pin —
    an asymmetric vertical wheel load rolls it without vertical travel."""
    bld = SystemBuilder()
    chassis = bld.add_ground()
    hp = SolidAxleHardpoints()
    ax = add_rigid_pinned_axle(bld, chassis, (0, 0, 0), hp)
    model, state = bld.finalize()
    import jax.numpy as jnp
    from chrono_tpu.physics.system import step_euler_implicit_linearized

    def f_ext(t, st):
        f = jnp.zeros((model.n_bodies, 3))
        return f.at[ax.wheel_l, 2].set(-2000.0), jnp.zeros((model.n_bodies, 3))

    st = state
    t = 0.0
    for _ in range(400):
        f, tau = f_ext(t, st)
        st, _ = step_euler_implicit_linearized(
            model, st, t, 1e-3, SET, f_ext=f, tau_ext=tau)
        t += 1e-3
    assert np.isfinite(np.asarray(st.x)).all()
    # center did not translate, wheels moved antisymmetrically (roll)
    np.testing.assert_allclose(float(st.x[ax.axle, 2]), hp.axle_z, atol=2e-3)
    dzl = float(st.x[ax.wheel_l, 2]) - hp.axle_z
    dzr = float(st.x[ax.wheel_r, 2]) - hp.axle_z
    assert dzl < -0.005 and dzr > 0.005
    np.testing.assert_allclose(dzl, -dzr, rtol=0.1)


def test_rigid_suspension_wheels_fixed_to_chassis():
    bld = SystemBuilder()
    chassis = bld.add_ground()
    hp = SolidAxleHardpoints()
    ax = add_rigid_suspension(bld, chassis, (0, 0, 0), hp)
    model, state = bld.finalize()
    state, _ = simulate(model, state, 1e-3, 300, SET)
    # spindles cannot translate at all
    np.testing.assert_allclose(float(state.x[ax.wheel_l, 2]), hp.axle_z,
                               atol=1e-4)
    np.testing.assert_allclose(float(state.x[ax.wheel_r, 2]), hp.axle_z,
                               atol=1e-4)


def test_toebar_knuckles_steer_both_wheels():
    """The ToeBar* variants' steering mechanism: moving the drag-link body
    steers BOTH knuckles through the tie rod."""
    from chrono_tpu.core import quaternion as Q

    def run(rack_dx):
        bld = SystemBuilder()
        chassis = bld.add_ground()
        # drag-link anchor body on a prismatic y-rail, driven by a motor
        hp = SolidAxleHardpoints()
        steer = bld.add_body(mass=2.0, pos=(0.45, hp.track / 2 - 0.13, 0.35))
        bld.add_joint("prismatic", chassis, steer,
                      world_pos=(0.45, hp.track / 2 - 0.13, 0.35),
                      world_axis=(1, 0, 0))
        bld.add_motor_linear_speed(
            chassis, steer, world_pos=(0.45, hp.track / 2 - 0.13, 0.35),
            world_axis=(1, 0, 0), profile=rack_dx, add_joint=False)
        ax, kn = add_rigid_panhard_axle(bld, chassis, (0, 0, 0), hp,
                                        toebar=True, draglink_body=steer)
        model, state = bld.finalize()
        state, _ = simulate(model, state, 1e-3, 400, SET)
        import jax.numpy as jnp
        yaw = []
        for k in kn:
            ex = np.asarray(Q.qrotate(state.q[k], jnp.asarray([1., 0., 0.])))
            yaw.append(float(np.arctan2(ex[1], ex[0])))
        return yaw

    yaw_straight = run(0.0)
    assert max(abs(y) for y in yaw_straight) < 0.03
    # 0.05 m/s: ~0.18 rad steer over the run; faster rack speeds drive the
    # drag link over-center in this generic geometry (real steering stops
    # exist for the same reason)
    yaw_steered = run(0.05)
    # both knuckles rotate the same direction, appreciably
    assert abs(yaw_steered[0]) > 0.05 and abs(yaw_steered[1]) > 0.05
    assert np.sign(yaw_steered[0]) == np.sign(yaw_steered[1])
