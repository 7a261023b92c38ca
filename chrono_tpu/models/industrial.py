"""Industrial robot arms: analytic + numerical kinematics, trajectory
interpolation, and a driven 6-dof dynamic model.

Capability parity with the reference's chrono_models industrial family
(/root/reference/src/chrono_models/robot/industrial/: IndustrialKinematics
6dofSpherical.h:30 analytic 6R spherical-wrist FK/IK, IndustrialKinematics
SCARA.h:30 RRRP FK/IK, IndustrialKinematicsNdofNumerical.h:30 Newton IK
over a numeric Jacobian, TrajectoryInterpolator.h operation-space paths,
IndustrialRobot6dof.h:30 the assembled MBS arm), re-designed TPU-first:

* kinematics are pure, branch-free jnp functions — batched over targets
  with ``vmap``, differentiable end to end (the numerical IK uses
  ``jax.jacfwd`` instead of the reference's finite-difference Jacobian);
* the zero configuration is the straight-up arm with the tool along the
  forearm; joints: yaw(z) · shoulder(y) · elbow(y) · roll(z) · pitch(y) ·
  roll(z) — a spherical wrist, so position/orientation decouple and the
  wrist angles are a ZYZ Euler factorization;
* the dynamic arm is a SystemBuilder chain of link bodies with
  angle-driven rotation motors, so a whole pick-and-place program runs as
  one jitted scan.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core import quaternion as Q


# ---------------------------------------------------------------------------
# 6R spherical-wrist arm
# ---------------------------------------------------------------------------

@pytree_dataclass
class Arm6R:
    """Geometry of a 6R spherical-wrist arm (lengths in the zero/vertical
    configuration): base→shoulder ``H`` along z, upper arm ``L1``, forearm
    ``L2`` (shoulder and elbow both pitch about y), tool offset ``L3`` from
    the wrist center along the tool z-axis."""

    H: Array
    L1: Array
    L2: Array
    L3: Array
    base_pos: Array = None   # (3,) world position of the base
    base_rot: Array = None   # (4,) world orientation of the base

    @staticmethod
    def make(H, L1, L2, L3, base_pos=(0.0, 0.0, 0.0), base_rot=None):
        return Arm6R(H=jnp.asarray(H, jnp.float32),
                     L1=jnp.asarray(L1, jnp.float32),
                     L2=jnp.asarray(L2, jnp.float32),
                     L3=jnp.asarray(L3, jnp.float32),
                     base_pos=jnp.asarray(base_pos, jnp.float32),
                     base_rot=(Q.qidentity() if base_rot is None
                               else jnp.asarray(base_rot, jnp.float32)))


_EZ = jnp.asarray([0.0, 0.0, 1.0])
_EY = jnp.asarray([0.0, 1.0, 0.0])


def _rz(a):
    return Q.q_from_axis_angle(_EZ, a)


def _ry(a):
    return Q.q_from_axis_angle(_EY, a)


def fk_6r(arm: Arm6R, q: Array):
    """Forward kinematics: joint angles (…, 6) → (tcp_pos (…, 3),
    tcp_rot (…, 4)).  Also differentiable (for Jacobians / numerical IK)."""
    th1, th2, th3, th4, th5, th6 = [q[..., i] for i in range(6)]
    # orientation chain: Rz(1) Ry(2) Ry(3) Rz(4) Ry(5) Rz(6)
    q01 = _rz(th1)
    q03 = Q.qmul(q01, _ry(th2 + th3))
    q04 = Q.qmul(q03, _rz(th4))
    q05 = Q.qmul(q04, _ry(th5))
    q06 = Q.qmul(q05, _rz(th6))
    # positions: shoulder → elbow along the (yaw·pitch)-rotated z
    up = jnp.broadcast_to(_EZ, q.shape[:-1] + (3,))
    shoulder = arm.H[..., None] * up
    elbow = shoulder + arm.L1[..., None] * Q.qrotate(Q.qmul(q01, _ry(th2)), up)
    wrist = elbow + arm.L2[..., None] * Q.qrotate(q03, up)
    tcp = wrist + arm.L3[..., None] * Q.qrotate(q06, up)
    pos = arm.base_pos + Q.qrotate(arm.base_rot, tcp)
    rot = Q.qmul(arm.base_rot, q06)
    return pos, rot


def ik_6r(arm: Arm6R, target_pos: Array, target_rot: Array,
          elbow_up: bool = True):
    """Analytic inverse kinematics for the spherical-wrist 6R arm.

    Branch-free (gimbal lock handled with ``where``), batched over leading
    axes.  Returns joint angles (…, 6); unreachable targets are clamped to
    the workspace boundary (straight arm), mirroring the reference's
    acos-clamp behavior."""
    # target in base coordinates
    T = Q.qrotate_inv(arm.base_rot, target_pos - arm.base_pos)
    R06 = Q.qmul(Q.qconj(arm.base_rot), target_rot)
    # wrist center: TCP minus tool offset along the tool z axis
    W = T - arm.L3[..., None] * Q.qrotate(R06, _EZ)

    wx, wy, wz = W[..., 0], W[..., 1], W[..., 2]
    th1 = jnp.arctan2(wy, wx)
    r2 = wx * wx + wy * wy
    s = wz - arm.H
    # elbow interior rotation e: law of cosines on (r, s)
    D = (r2 + s * s - arm.L1**2 - arm.L2**2) / (2.0 * arm.L1 * arm.L2)
    e = jnp.arccos(jnp.clip(D, -1.0, 1.0))
    e = e if elbow_up else -e
    beta = jnp.arctan2(arm.L2 * jnp.sin(e), arm.L1 + arm.L2 * jnp.cos(e))
    phi = jnp.arctan2(jnp.sqrt(r2), s)          # tilt from vertical
    th2 = phi - beta
    th3 = e

    # wrist: R36 = (Rz(th1) Ry(th2+th3))^T R06 = Rz(th4) Ry(th5) Rz(th6)
    q03 = Q.qmul(_rz(th1), _ry(th2 + th3))
    R36 = Q.q_to_matrix(Q.qmul(Q.qconj(q03), R06))
    c5 = jnp.clip(R36[..., 2, 2], -1.0, 1.0)
    th5 = jnp.arccos(c5)
    normal = jnp.abs(jnp.abs(c5) - 1.0) > 1e-6
    th4 = jnp.where(normal,
                    jnp.arctan2(R36[..., 1, 2], R36[..., 0, 2]),
                    # gimbal lock: all roll into th4 (th6 := 0)
                    jnp.arctan2(jnp.sign(c5) * R36[..., 1, 0], R36[..., 0, 0]))
    th6 = jnp.where(normal,
                    jnp.arctan2(R36[..., 2, 1], -R36[..., 2, 0]),
                    jnp.zeros_like(th4))
    return jnp.stack([th1, th2, th3, th4, th5, th6], axis=-1)


# ---------------------------------------------------------------------------
# SCARA (RRRP) arm
# ---------------------------------------------------------------------------

@pytree_dataclass
class ArmSCARA:
    """SCARA geometry: column height ``H``, horizontal links ``L1``/``L2``
    (both revolute about z), tool-yaw joint with vertical drop ``D``, then a
    prismatic plunge ``d ≥ 0`` down to the TCP at ``z = H − D − d``."""

    H: Array
    L1: Array
    L2: Array
    D: Array
    right_elbow: bool = static_field(default=True)

    @staticmethod
    def make(H, L1, L2, D, right_elbow=True):
        return ArmSCARA(H=jnp.asarray(H, jnp.float32),
                        L1=jnp.asarray(L1, jnp.float32),
                        L2=jnp.asarray(L2, jnp.float32),
                        D=jnp.asarray(D, jnp.float32),
                        right_elbow=right_elbow)


def fk_scara(arm: ArmSCARA, u: Array):
    """u = (th1, th2, th3, d) → (tcp_pos, tcp_rot).  Planar 3R + plunge."""
    th1, th2, th3, d = [u[..., i] for i in range(4)]
    a12 = th1 + th2
    x = arm.L1 * jnp.cos(th1) + arm.L2 * jnp.cos(a12)
    y = arm.L1 * jnp.sin(th1) + arm.L2 * jnp.sin(a12)
    z = arm.H - arm.D - d + jnp.zeros_like(x)
    rot = _rz(a12 + th3)
    return jnp.stack([x, y, z], axis=-1), rot


def ik_scara(arm: ArmSCARA, target_pos: Array, yaw: Array):
    """Analytic RRRP inverse kinematics: (x, y, z, tool yaw) → (…, 4)."""
    x, y, z = target_pos[..., 0], target_pos[..., 1], target_pos[..., 2]
    D2 = (x * x + y * y - arm.L1**2 - arm.L2**2) / (2.0 * arm.L1 * arm.L2)
    th2 = jnp.arccos(jnp.clip(D2, -1.0, 1.0))
    th2 = th2 if arm.right_elbow else -th2
    th1 = (jnp.arctan2(y, x)
           - jnp.arctan2(arm.L2 * jnp.sin(th2), arm.L1 + arm.L2 * jnp.cos(th2)))
    th3 = yaw - th1 - th2
    d = arm.H - arm.D - z
    return jnp.stack([th1, th2, th3, d], axis=-1)


# ---------------------------------------------------------------------------
# N-dof numerical IK (Newton over the autodiff Jacobian)
# ---------------------------------------------------------------------------

def ik_newton(fk_fn, q0: Array, target_pos: Array, target_rot: Array,
              tol: float = 1e-6, max_iter: int = 50, damping: float = 1e-6):
    """Damped-Newton IK for an arbitrary ``fk_fn(q) -> (pos, rot)``.

    The reference's IndustrialKinematicsNdofNumerical builds the Jacobian
    by finite differences (NumJacobian); here it is exact via jacfwd.
    Residual = [Δpos; rotation-vector of q_err].  Returns (q, converged)."""
    def resid(q):
        p, r = fk_fn(q)
        dr = Q.qlog2(Q.qmul(Q.qconj(target_rot), r))
        return jnp.concatenate([p - target_pos, dr])

    Jfn = jax.jacfwd(resid)

    def cond(carry):
        q, it, err = carry
        return jnp.logical_and(it < max_iter, err > tol)

    def body(carry):
        q, it, _ = carry
        r = resid(q)
        J = Jfn(q)
        # damped least squares (Levenberg): (JᵀJ + λI) dq = −Jᵀ r
        JtJ = J.T @ J + damping * jnp.eye(q.shape[0], dtype=q.dtype)
        dq = jnp.linalg.solve(JtJ, -J.T @ r)
        q2 = q + dq
        return q2, it + 1, jnp.linalg.norm(resid(q2))

    err0 = jnp.linalg.norm(resid(q0))
    q, _, err = lax.while_loop(cond, body, (q0, jnp.zeros((), jnp.int32),
                                            err0))
    return q, err <= tol


# ---------------------------------------------------------------------------
# Trajectory interpolation (operation space)
# ---------------------------------------------------------------------------

@pytree_dataclass
class Trajectory:
    """Operation-space trajectory through waypoints: piecewise-linear
    positions + slerp orientations, each segment time-scaled by a smooth
    motion law (TrajectoryInterpolatorOperationSpace role).  Durations are
    supplied or auto-split proportional to segment chord length
    (AutoComputeTrajectoryDurations role)."""

    pos: Array        # (K, 3) waypoints
    rot: Array        # (K, 4) waypoint quaternions
    t_cum: Array      # (K,) cumulative times, t_cum[0] = 0
    law: str = static_field(default="poly345")


def make_trajectory(waypoints_pos, waypoints_rot, total_time,
                    durations: Sequence[float] = None,
                    law: str = "poly345") -> Trajectory:
    pos = jnp.asarray(waypoints_pos, jnp.float32)
    rot = jnp.asarray(waypoints_rot, jnp.float32)
    K = pos.shape[0]
    if durations is None:
        chords = np.linalg.norm(np.diff(np.asarray(pos), axis=0), axis=1)
        chords = np.maximum(chords, 1e-9)
        durations = chords / chords.sum() * float(total_time)
    t_cum = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                             jnp.cumsum(jnp.asarray(durations, jnp.float32))])
    assert t_cum.shape[0] == K
    return Trajectory(pos=pos, rot=rot, t_cum=t_cum, law=law)


def _law_s(law: str, x):
    """Normalized motion law s(x): s(0)=0, s(1)=1, ṡ(0)=ṡ(1)=0."""
    x = jnp.clip(x, 0.0, 1.0)
    if law == "linear":
        return x
    if law == "poly345":
        return x**3 * (10.0 - 15.0 * x + 6.0 * x * x)
    if law == "cycloidal":
        return x - jnp.sin(2.0 * jnp.pi * x) / (2.0 * jnp.pi)
    raise ValueError(f"unknown motion law {law!r}")


def traj_eval(traj: Trajectory, t):
    """(pos (…,3), rot (…,4)) at time t (traced OK; clamped to the ends)."""
    t = jnp.asarray(t, jnp.float32)
    K = traj.pos.shape[0]
    i = jnp.clip(jnp.searchsorted(traj.t_cum, t, side="right") - 1, 0, K - 2)
    t0 = traj.t_cum[i]
    t1 = traj.t_cum[i + 1]
    s = _law_s(traj.law, (t - t0) / jnp.maximum(t1 - t0, 1e-9))
    p = traj.pos[i] + s[..., None] * (traj.pos[i + 1] - traj.pos[i])
    # slerp via the quaternion log/exp maps
    qa, qb = traj.rot[i], traj.rot[i + 1]
    # shortest path
    dot = jnp.sum(qa * qb, axis=-1, keepdims=True)
    qb = jnp.where(dot < 0, -qb, qb)
    dq = Q.qmul(Q.qconj(qa), qb)
    r = Q.qmul(qa, Q.qexp_half(s[..., None] * Q.qlog2(dq)))
    return p, Q.qnormalize(r)


# ---------------------------------------------------------------------------
# Dynamic arm model (IndustrialRobot6dof role)
# ---------------------------------------------------------------------------

def create_arm_6dof(arm: Arm6R, joint_programs, link_mass=(12.0, 8.0, 5.0),
                    wrist_mass=1.5):
    """Assemble the 6R arm as an MBS: base column + upper arm + forearm +
    three wrist bodies, each joint an angle-driven rotation motor following
    its ``joint_programs[i]`` MotionFunction.  Returns (model, state,
    tool_body_id, tool_offset_local).  Zero configuration = straight up
    (matches fk_6r)."""
    from chrono_tpu.physics.builder import SystemBuilder

    H, L1, L2, L3 = (float(arm.H), float(arm.L1), float(arm.L2),
                     float(arm.L3))
    b = SystemBuilder()
    ground = b.add_ground()
    # link bodies, COMs at segment midpoints (zero config: straight up)
    col = b.add_body(mass=link_mass[0], inertia=(0.3, 0.3, 0.1),
                     pos=(0, 0, 0.5 * H), name="column")
    upper = b.add_body(mass=link_mass[1], inertia=(0.2, 0.2, 0.05),
                       pos=(0, 0, H + 0.5 * L1), name="upper_arm")
    fore = b.add_body(mass=link_mass[2], inertia=(0.1, 0.1, 0.02),
                      pos=(0, 0, H + L1 + 0.5 * L2), name="forearm")
    wz = H + L1 + L2
    w1 = b.add_body(mass=wrist_mass, inertia=(0.01,) * 3, pos=(0, 0, wz),
                    name="wrist_roll")
    w2 = b.add_body(mass=wrist_mass, inertia=(0.01,) * 3, pos=(0, 0, wz),
                    name="wrist_pitch")
    tool = b.add_body(mass=wrist_mass, inertia=(0.01,) * 3,
                      pos=(0, 0, wz + 0.5 * L3), name="tool")

    b.add_motor_rotation_angle(ground, col, (0, 0, 0), (0, 0, 1),
                               joint_programs[0])
    b.add_motor_rotation_angle(col, upper, (0, 0, H), (0, 1, 0),
                               joint_programs[1])
    b.add_motor_rotation_angle(upper, fore, (0, 0, H + L1), (0, 1, 0),
                               joint_programs[2])
    b.add_motor_rotation_angle(fore, w1, (0, 0, wz), (0, 0, 1),
                               joint_programs[3])
    b.add_motor_rotation_angle(w1, w2, (0, 0, wz), (0, 1, 0),
                               joint_programs[4])
    b.add_motor_rotation_angle(w2, tool, (0, 0, wz), (0, 0, 1),
                               joint_programs[5])
    model, state = b.finalize()
    return model, state, tool, jnp.asarray([0.0, 0.0, 0.5 * L3], jnp.float32)


def joint_programs_from_trajectory(arm: Arm6R, traj: Trajectory,
                                   n_samples: int = 64, elbow_up=True):
    """Sample IK along the trajectory into per-joint FInterp programs, with
    per-joint 2π-unwrapping so angle targets are continuous."""
    from chrono_tpu.core.functions import FInterp

    ts = jnp.linspace(0.0, float(traj.t_cum[-1]), n_samples)
    p, r = jax.vmap(lambda t: traj_eval(traj, t))(ts)
    qs = jax.vmap(lambda pp, rr: ik_6r(arm, pp, rr, elbow_up=elbow_up))(p, r)
    qs = jnp.asarray(np.unwrap(np.asarray(qs), axis=0))
    return [FInterp(ts=ts, ys=qs[:, j]) for j in range(6)]
