"""RoboSimian-class limbed robot: 4 limbs x 8 driven joints on a free
chassis, wheels rolling on ground through NSC contact, actuated by the
reference's recorded gait programs.

Capability parity with the reference's RoboSimian model
(/root/reference/src/chrono_models/robot/robosimian/RoboSimian.h:409
RoboSimian, :306 RS_Limb 8-motor chains, :580 RS_Driver phase-sequenced
actuation from recorded files).  TPU-first design differences:

* the limb is a DATA table (joint offsets/axes, public JPL RoboSimian
  geometry — same status as the HMMWV wheelbase) driven through one batched
  FK routine, not 11 shared_ptr link objects;
* all 32 motors are angle/speed-driven rotation motors in the one system
  descriptor, so the whole robot steps as a single jitted NSC program;
* the RS_Driver role (start → cycle xN phases, per-motor interpolation) is
  a stack of FInterp programs built directly from the reference's
  ``data/robot/robosimian/actuation/*.txt`` files;
* contact: wheel spheres + a ground box through the NSC pipeline (the
  reference uses cylinder collision shapes on a Bullet backend).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from chrono_tpu.core import quaternion as Q

# Driven-joint chain per limb (public RoboSimian kinematics): offset of the
# joint frame in the parent joint frame, URDF rpy of that frame, rotation
# axis in the joint frame.  Fixed force-torque adapter links are merged.
_LIMB_JOINTS = [
    # offset                    rpy                 axis
    ((0.17203, 0.0, 0.0), (np.pi, 0.0, 0.0), (1, 0, 0)),      # joint1 roll
    ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0, -1, 0)),           # joint2 pitch
    ((0.28650, -0.117, 0.0), (0.0, 0.0, 0.0), (1, 0, 0)),     # joint3 roll
    ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0, -1, 0)),           # joint4 pitch
    ((0.28650, -0.117, 0.0), (0.0, 0.0, 0.0), (1, 0, 0)),     # joint5 roll
    ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0, -1, 0)),           # joint6 pitch
    ((0.19250, -0.117, 0.0), (0.0, 0.0, 0.0), (1, 0, 0)),     # joint7 roll
    ((0.12024, 0.172, 0.0), (-np.pi / 2, 0.0, 0.0), (0, 0, 1)),  # joint8 whl
]

# limb mount frames on the chassis: FR, RR, RL, FL
_LIMB_MOUNTS = [
    ((+0.29326, +0.20940, 0.03650), (0.0, -1.5708, -0.26180)),
    ((-0.29326, +0.20940, 0.03650), (0.0, -1.5708, +0.26180)),
    ((-0.29326, -0.20940, 0.03650), (0.0, -1.5708, +2.87979)),
    ((+0.29326, -0.20940, 0.03650), (0.0, -1.5708, +3.40339)),
]

WHEEL_RADIUS = 0.12


def _q_rpy_urdf(rpy):
    """URDF fixed-axis rpy: R = Rz(yaw) Ry(pitch) Rx(roll)."""
    r, p, y = rpy
    qz = Q.q_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(y))
    qy = Q.q_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(p))
    qx = Q.q_from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(r))
    return Q.qmul(Q.qmul(qz, qy), qx)


def limb_fk(mount_pos, mount_rpy, angles):
    """World-from-chassis frames of the 8 joint bodies of one limb at the
    given joint angles.  Returns (pos (8,3), rot (8,4), axis_world (8,3))."""
    p = jnp.asarray(mount_pos, jnp.float32)
    q = _q_rpy_urdf(mount_rpy)
    out_p, out_q, out_ax = [], [], []
    for (off, rpy, axis), th in zip(_LIMB_JOINTS, angles):
        p = p + Q.qrotate(q, jnp.asarray(off, jnp.float32))
        q = Q.qmul(q, _q_rpy_urdf(rpy))
        ax_w = Q.qrotate(q, jnp.asarray(axis, jnp.float32))
        q = Q.qmul(q, Q.q_from_axis_angle(jnp.asarray(axis, jnp.float32),
                                          jnp.asarray(th, jnp.float32)))
        out_p.append(p)
        out_q.append(q)
        out_ax.append(ax_w)
    return (jnp.stack(out_p), jnp.stack(out_q), jnp.stack(out_ax))


def load_actuation(path, n_limbs=4, n_joints=8):
    """Read a reference actuation file: (times (T,), angles (T, 32))."""
    data = np.loadtxt(path)
    assert data.shape[1] == 1 + n_limbs * n_joints
    return data[:, 0], data[:, 1:]


def gait_programs(cycle_path, n_cycles=1, start_path=None, scale_time=1.0):
    """RS_Driver role: per-motor FInterp programs from recorded phases
    (optional start phase, then the cycle repeated ``n_cycles`` times).
    Angles are re-based so every program starts at 0 (motors are added at
    the already-posed configuration).  Returns (programs list of 32 FInterp,
    posture (32,) initial angles, total_time)."""
    from chrono_tpu.core.functions import FInterp

    ts, qs = load_actuation(cycle_path)
    if start_path is not None:
        ts0, qs0 = load_actuation(start_path)
        t_parts = [ts0]
        q_parts = [qs0]
        t_off = ts0[-1] + (ts0[-1] - ts0[-2])
    else:
        t_parts, q_parts, t_off = [], [], 0.0
    for _ in range(n_cycles):
        t_parts.append(ts + t_off)
        q_parts.append(qs)
        t_off = t_parts[-1][-1] + (ts[1] - ts[0])
    T = np.concatenate(t_parts) * scale_time
    A = np.concatenate(q_parts, axis=0)
    posture = A[0].copy()
    A = np.unwrap(A - posture[None, :], axis=0)
    progs = [FInterp(ts=jnp.asarray(T, jnp.float32),
                     ys=jnp.asarray(A[:, j], jnp.float32))
             for j in range(A.shape[1])]
    return progs, posture, float(T[-1])


def create_robosimian(posture, wheel_speeds, joint_programs=None,
                      chassis_mass=45.0, link_mass=2.5, wheel_mass=1.5,
                      ground_mu=0.8):
    """Assemble the robot at the given 32-angle ``posture`` standing on the
    ground plane (z = 0).  Limb joints 1-7 are angle motors (holding the
    posture, or following ``joint_programs`` relative to it); joint 8 is a
    speed motor at ``wheel_speeds[limb]`` (the reference's driving mode:
    ActuationMode::SPEED wheels, RoboSimian.cpp:1251).

    Returns (model, state, coll, chassis_id, wheel_ids)."""
    from chrono_tpu.physics.builder import SystemBuilder
    from chrono_tpu.collision.pipeline import (
        SphereShapes, BoxShapes, CollisionModel,
    )
    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.core.functions import FConst

    posture = np.asarray(posture, np.float32).reshape(4, 8)
    # the robot is deployed flipped pi about x (limbs extend +z in chassis
    # coordinates, downward in world) — exactly how the reference demos
    # initialize it (demo_ROBOT_RoboSimian_Rigid.cpp:257 QuatFromAngleX(PI))
    q_flip = jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32)
    # chassis height: wheels (lowest limb points) touch the ground
    max_z = max(float(limb_fk(m[0], m[1], posture[i])[0][-1, 2])
                for i, m in enumerate(_LIMB_MOUNTS))
    ch_z = WHEEL_RADIUS + max_z

    b = SystemBuilder()
    ground = b.add_ground()
    chassis = b.add_body(mass=chassis_mass, inertia=(2.0, 3.0, 4.0),
                         pos=(0.0, 0.0, ch_z),
                         rot=tuple(float(v) for v in q_flip),
                         name="chassis")
    wheel_ids = []
    sph_body, sph_off, sph_r, sph_mu = [], [], [], []
    for li, (mpos, mrpy) in enumerate(_LIMB_MOUNTS):
        pos, rot, axes = limb_fk(mpos, mrpy, posture[li])
        pos = Q.qrotate(q_flip, pos)
        rot = Q.qmul(q_flip, rot)
        axes = Q.qrotate(q_flip, axes)
        parent = chassis
        for j in range(8):
            is_wheel = j == 7
            m = wheel_mass if is_wheel else link_mass
            bid = b.add_body(mass=m, inertia=(0.01, 0.01, 0.01),
                             pos=(float(pos[j][0]), float(pos[j][1]),
                                  float(pos[j][2]) + ch_z),
                             rot=tuple(float(v) for v in rot[j]),
                             name=f"limb{li + 1}_link{j + 1}")
            wp = (float(pos[j][0]), float(pos[j][1]),
                  float(pos[j][2]) + ch_z)
            wa = tuple(float(v) for v in axes[j])
            if is_wheel:
                b.add_motor_rotation_speed(parent, bid, wp, wa,
                                           FConst(c=jnp.asarray(
                                               float(wheel_speeds[li]))))
                wheel_ids.append(bid)
                sph_body.append(bid)
                sph_off.append((0.0, 0.0, 0.0))
                sph_r.append(WHEEL_RADIUS)
                sph_mu.append(ground_mu)
            else:
                prog = (FConst(c=jnp.asarray(0.0)) if joint_programs is None
                        else joint_programs[li * 8 + j])
                b.add_motor_rotation_angle(parent, bid, wp, wa, prog)
            parent = bid
    model, state = b.finalize()

    spheres = SphereShapes(
        body=jnp.asarray(sph_body, jnp.int32),
        offset=jnp.asarray(sph_off, jnp.float32),
        radius=jnp.asarray(sph_r, jnp.float32),
        mu=jnp.asarray(sph_mu, jnp.float32))
    boxes = BoxShapes(
        body=jnp.asarray([ground], jnp.int32),
        pos=jnp.asarray([[0.0, 0.0, -0.5]], jnp.float32),
        rot=Q.qidentity((1,)),
        half=jnp.asarray([[5.0, 5.0, 0.5]], jnp.float32),
        mu=jnp.asarray([ground_mu], jnp.float32))
    coll = CollisionModel(
        spheres=spheres, boxes=boxes,
        grid=GridSpec(origin=(-5.0, -5.0, -1.0), cell_size=0.5,
                      dims=(20, 20, 6)),
        max_per_cell=8, max_contacts=32)
    return model, state, coll, chassis, wheel_ids
