"""Industrial robot arms: analytic/numerical kinematics, trajectories, and
the driven 6-dof MBS arm (reference: chrono_models/robot/industrial/)."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.core import quaternion as Q
from chrono_tpu.models.industrial import (
    Arm6R, fk_6r, ik_6r, ArmSCARA, fk_scara, ik_scara, ik_newton,
    make_trajectory, traj_eval, create_arm_6dof,
    joint_programs_from_trajectory,
)

ARM = Arm6R.make(H=0.4, L1=0.6, L2=0.5, L3=0.15)


def _random_q(rng, n):
    """Joint samples away from singularities (|th5| > 0.15, elbow bent)."""
    q = np.stack([
        rng.uniform(-np.pi, np.pi, n),
        rng.uniform(-1.2, 1.2, n),
        rng.uniform(0.3, 2.4, n),          # elbow-up bend
        rng.uniform(-np.pi, np.pi, n),
        rng.uniform(0.15, np.pi - 0.15, n),
        rng.uniform(-np.pi, np.pi, n),
    ], axis=1).astype(np.float32)
    return jnp.asarray(q)


def test_fk_zero_configuration():
    p, r = fk_6r(ARM, jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(p), [0, 0, 0.4 + 0.6 + 0.5 + 0.15],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), [1, 0, 0, 0], atol=1e-6)


def test_ik_fk_roundtrip_batched():
    """vmapped IK recovers the FK pose for 64 random reachable targets."""
    rng = np.random.default_rng(0)
    q = _random_q(rng, 64)
    p, r = jax.vmap(lambda qq: fk_6r(ARM, qq))(q)
    q2 = jax.vmap(lambda pp, rr: ik_6r(ARM, pp, rr))(p, r)
    p2, r2 = jax.vmap(lambda qq: fk_6r(ARM, qq))(q2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=2e-5)
    # quaternion match up to sign
    dot = np.abs(np.sum(np.asarray(r2) * np.asarray(r), axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_ik_elbow_down_branch():
    rng = np.random.default_rng(1)
    q = _random_q(rng, 8)
    p, r = jax.vmap(lambda qq: fk_6r(ARM, qq))(q)
    qd = jax.vmap(lambda pp, rr: ik_6r(ARM, pp, rr, elbow_up=False))(p, r)
    pd, rd = jax.vmap(lambda qq: fk_6r(ARM, qq))(qd)
    np.testing.assert_allclose(np.asarray(pd), np.asarray(p), atol=2e-5)
    assert np.all(np.asarray(qd[:, 2]) <= 0)   # elbow-down solution


def test_ik_gimbal_lock():
    """th5 = 0 (tool aligned with forearm): IK still reproduces the pose."""
    q = jnp.asarray([0.7, 0.4, 1.1, 0.3, 0.0, 0.5], jnp.float32)
    p, r = fk_6r(ARM, q)
    q2 = ik_6r(ARM, p, r)
    p2, r2 = fk_6r(ARM, q2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=2e-5)
    assert abs(float(jnp.sum(r2 * r))) > 1.0 - 1e-5


def test_ik_offset_base():
    arm = Arm6R.make(H=0.4, L1=0.6, L2=0.5, L3=0.15,
                     base_pos=(1.0, -0.5, 0.2),
                     base_rot=Q.q_from_axis_angle(jnp.asarray([0., 0., 1.]),
                                                  jnp.asarray(0.9)))
    q = jnp.asarray([0.3, 0.5, 1.0, -0.4, 0.8, 1.2], jnp.float32)
    p, r = fk_6r(arm, q)
    q2 = ik_6r(arm, p, r)
    p2, r2 = fk_6r(arm, q2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=2e-5)
    assert abs(float(jnp.sum(r2 * r))) > 1.0 - 1e-5


def test_scara_roundtrip():
    arm = ArmSCARA.make(H=0.5, L1=0.35, L2=0.25, D=0.08)
    rng = np.random.default_rng(2)
    u = np.stack([rng.uniform(-2, 2, 16), rng.uniform(0.3, 2.6, 16),
                  rng.uniform(-2, 2, 16), rng.uniform(0.0, 0.2, 16)],
                 axis=1).astype(np.float32)
    p, r = jax.vmap(lambda uu: fk_scara(arm, uu))(jnp.asarray(u))
    yaw = jnp.asarray(u[:, 0] + u[:, 1] + u[:, 2])
    u2 = jax.vmap(lambda pp, yy: ik_scara(arm, pp, yy))(p, yaw)
    p2, _ = jax.vmap(lambda uu: fk_scara(arm, uu))(u2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(u2[:, 3]), u[:, 3], atol=2e-5)


def test_ik_newton_converges():
    """Damped-Newton IK (autodiff Jacobian) reaches an FK target pose from a
    perturbed start — the NdofNumerical role without analytic structure."""
    q_true = jnp.asarray([0.5, 0.3, 1.2, -0.7, 0.9, 0.4], jnp.float32)
    p, r = fk_6r(ARM, q_true)
    q0 = q_true + 0.25 * jnp.asarray([1, -1, 0.5, 1, -0.5, 1], jnp.float32)
    q, ok = ik_newton(lambda qq: fk_6r(ARM, qq), q0, p, r, tol=1e-5)
    assert bool(ok)
    p2, r2 = fk_6r(ARM, q)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-4)


def test_trajectory_endpoints_and_smoothness():
    wp = jnp.asarray([[0.5, 0.0, 0.8], [0.5, 0.4, 0.9], [0.2, 0.4, 0.6]])
    qs = jnp.stack([Q.qidentity(),
                    Q.q_from_axis_angle(jnp.asarray([0., 0., 1.]),
                                        jnp.asarray(0.8)),
                    Q.q_from_axis_angle(jnp.asarray([0., 1., 0.]),
                                        jnp.asarray(-0.5))])
    traj = make_trajectory(wp, qs, total_time=2.0, law="poly345")
    p0, r0 = traj_eval(traj, 0.0)
    p1, r1 = traj_eval(traj, 2.0)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(wp[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(wp[-1]), atol=1e-5)
    assert abs(float(jnp.sum(r1 * qs[-1]))) > 1.0 - 1e-5
    # poly345 law: zero path speed at segment boundaries
    ts = jnp.linspace(0.0, 2.0, 401)
    ps, _ = jax.vmap(lambda t: traj_eval(traj, t))(ts)
    sp = np.linalg.norm(np.diff(np.asarray(ps), axis=0), axis=1) / float(
        ts[1] - ts[0])
    assert sp[0] < 0.05 and sp[-1] < 0.05 and sp.max() > 0.2
    # durations split proportional to chord length
    seg = np.diff(np.asarray(traj.t_cum))
    chord = np.linalg.norm(np.diff(np.asarray(wp), axis=0), axis=1)
    np.testing.assert_allclose(seg / seg.sum(), chord / chord.sum(),
                               rtol=1e-5)


def test_driven_arm_tracks_trajectory():
    """The dynamic 6-dof arm (angle motors from IK programs) tracks the
    operation-space trajectory with its TCP."""
    from chrono_tpu.physics.system import (
        SolverSettings, step_euler_implicit_linearized,
    )

    q_a = jnp.asarray([0.0, 0.25, 0.9, 0.0, 0.6, 0.0], jnp.float32)
    q_b = jnp.asarray([0.8, 0.45, 1.3, 0.4, 0.9, -0.5], jnp.float32)
    pa, ra = fk_6r(ARM, q_a)
    pb, rb = fk_6r(ARM, q_b)
    T = 1.0
    traj = make_trajectory(jnp.stack([pa, pb]), jnp.stack([ra, rb]),
                           total_time=T, law="cycloidal")
    progs = joint_programs_from_trajectory(ARM, traj, n_samples=33)
    # programs start at the IK of the start pose
    model, state, tool, tool_off = create_arm_6dof(ARM, progs)
    # pre-pose the arm at the start configuration? The zero config IS q=0;
    # start the trajectory from the zero-adjacent pose by simulating the
    # angle motors (stabilized) from q_a's neighborhood: here simply verify
    # tracking after the initial transient.
    settings = SolverSettings(solver="direct")
    h = 2e-3
    step = jax.jit(lambda s, tt: step_euler_implicit_linearized(
        model, s, tt, h, settings)[0])
    t = 0.0
    # settle onto the trajectory start (motors hold angle at t=0)
    for _ in range(150):
        state = step(state, 0.0)
    for _ in range(int(T / h)):
        state = step(state, t)
        t += h
    p_end = np.asarray(state.x[tool] + Q.qrotate(state.q[tool], tool_off))
    p_ref, _ = traj_eval(traj, jnp.asarray(T))
    err = np.linalg.norm(p_end - np.asarray(p_ref))
    assert err < 0.02, f"TCP tracking error {err:.4f} m"
