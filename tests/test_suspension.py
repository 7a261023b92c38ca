"""Geometric double-wishbone suspension: assembly integrity and bump-camber
kinematics against an independent planar four-bar solution.

Role of the reference's suspension template tests (ChDoubleWishbone.h
kinematics; utest-style oracle built from the front-view linkage geometry).
"""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.system import (
    SolverSettings, step_euler_implicit_linearized,
)
from chrono_tpu.physics.joints import joint_violation
from chrono_tpu.vehicle.suspension import (
    WishboneHardpoints, add_double_wishbone_corner, add_macpherson_corner,
)
from chrono_tpu.core import quaternion as Q

SET = SolverSettings(solver="direct")


def _fourbar_camber(hp: WishboneHardpoints, dz: float) -> float:
    """Independent oracle: front-view (y,z) four-bar camber at bump dz.

    Solves the UCA/LCA circle intersection for the upright orientation when
    the LCA ball is raised so the wheel center moves up ~dz.
    """
    A = np.array([hp.uca_front[1], hp.uca_front[2]])   # chassis pivots
    B = np.array([hp.lca_front[1], hp.lca_front[2]])
    a0 = np.array([hp.uca_ball[1], hp.uca_ball[2]])    # balls at design
    b0 = np.array([hp.lca_ball[1], hp.lca_ball[2]])
    Lu = np.linalg.norm(a0 - A)
    Ll = np.linalg.norm(b0 - B)
    Lk = np.linalg.norm(a0 - b0)                       # upright (knuckle)

    def solve(theta_l):
        b = B + Ll * np.array([np.cos(theta_l), np.sin(theta_l)])
        # intersect circle(A, Lu) with circle(b, Lk); take the solution
        # closest to the design ball position
        d = np.linalg.norm(A - b)
        x = (d * d + Lu * Lu - Lk * Lk) / (2 * d)
        h2 = Lu * Lu - x * x
        if h2 < 0:
            return None
        e = (b - A) / d
        p = A + x * e
        n = np.array([-e[1], e[0]])
        cands = [p + np.sqrt(h2) * n, p - np.sqrt(h2) * n]
        a = min(cands, key=lambda c: np.linalg.norm(c - a0))
        return a, b

    th0 = np.arctan2(b0[1] - B[1], b0[0] - B[0])
    # find theta_l that lifts the LCA ball by ~dz (wheel rides the upright)
    target = b0[1] + dz
    lo, hi = th0, th0 + 0.6
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        sol = solve(mid)
        if sol is None or sol[1][1] < target:
            lo = mid
        else:
            hi = mid
    a, b = solve(0.5 * (lo + hi))
    v0 = a0 - b0
    v1 = a - b
    # camber change = rotation of the upright in the front view
    return float(np.arctan2(np.cross(v0, v1), np.dot(v0, v1)))


def _corner():
    hp = WishboneHardpoints()
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    chassis = bld.add_ground()
    corner = add_double_wishbone_corner(bld, chassis, (0, 0.8, 0), hp,
                                        side=+1)
    model, state = bld.finalize()
    return hp, model, state, corner


def _settle(model, state, f_wheel_z, wheel, n=400, h=1e-3):
    t = 0.0
    step = jax.jit(lambda s, t, fz: step_euler_implicit_linearized(
        model, s, t, h, SET,
        f_ext=jnp.zeros((model.n_bodies, 3)).at[wheel, 2].set(fz))[0])
    for _ in range(n):
        state = step(state, t, f_wheel_z)
        t += h
    return state


def test_assembly_and_constraint_integrity():
    hp, model, state, corner = _corner()
    state = _settle(model, state, 0.0, corner.wheel)
    # all joints hold
    for kind, data in model.joints.items():
        C = joint_violation(kind, data, state.x, state.q)
        assert float(jnp.abs(C).max()) < 1e-4, (kind, np.asarray(C))
    # corner settled (droop under gravity), still bounded
    z = float(state.x[corner.wheel, 2])
    assert 0.1 < z < 0.4


def test_bump_camber_matches_fourbar():
    hp, model, state, corner = _corner()
    state0 = _settle(model, state, 0.0, corner.wheel)
    z0 = float(state0.x[corner.wheel, 2])
    ey0 = np.asarray(Q.qrotate(state0.q[corner.upright],
                               jnp.asarray([0.0, 1.0, 0.0])))
    cam0 = np.arctan2(ey0[2], ey0[1])

    # push the wheel up with a vertical force (bump)
    state1 = _settle(model, state0, 3000.0, corner.wheel)
    z1 = float(state1.x[corner.wheel, 2])
    dz = z1 - z0
    assert 0.01 < dz < 0.2, f"bump travel {dz:.4f}"
    ey1 = np.asarray(Q.qrotate(state1.q[corner.upright],
                               jnp.asarray([0.0, 1.0, 0.0])))
    cam1 = np.arctan2(ey1[2], ey1[1])
    dcam_mbs = cam1 - cam0

    dcam_ref = _fourbar_camber(hp, dz)
    # SLA geometry: camber change is significant and matches the four-bar
    # within 25 % (3D caster/tie-rod effects are outside the planar oracle)
    assert abs(dcam_ref) > 1e-3
    assert np.sign(dcam_mbs) == np.sign(dcam_ref)
    assert abs(dcam_mbs - dcam_ref) < 0.25 * abs(dcam_ref) + 2e-3, \
        (np.degrees(dcam_mbs), np.degrees(dcam_ref))


def test_macpherson_assembles_and_settles():
    hp = WishboneHardpoints()
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    chassis = bld.add_ground()
    corner = add_macpherson_corner(bld, chassis, (0, 0.8, 0), hp, side=+1)
    model, state = bld.finalize()
    state = _settle(model, state, 500.0, corner.wheel, n=300)
    assert np.isfinite(np.asarray(state.x)).all()
    for kind, data in model.joints.items():
        C = joint_violation(kind, data, state.x, state.q)
        assert float(jnp.abs(C).max()) < 1e-3, kind
