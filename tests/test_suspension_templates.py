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
