"""Scene construction API.

The ergonomic, Python-side layer replacing the reference's imperative scene
assembly (``ChSystem::AddBody/AddLink``, /root/reference/src/chrono/physics/
ChSystem.h): the builder accumulates plain Python lists, then ``finalize()``
freezes everything into batched ``Model``/``BodyState`` pytrees.  Build once,
step forever — construction cost never touches the hot loop.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from chrono_tpu.core import quaternion as Q
from chrono_tpu.core.functions import MotionFunction, FConst
from chrono_tpu.physics.body import BodyState, BodyProps
from chrono_tpu.physics.joints import JointData, JOINT_TYPES
from chrono_tpu.physics.motors import MotorData
from chrono_tpu.physics.force_elements import TSDAData, RSDAData
from chrono_tpu.physics.system import Model


def _as3(v):
    return np.asarray(v, dtype=np.float64).reshape(3)


def _as4(v):
    if v is None:
        return np.array([1.0, 0.0, 0.0, 0.0])
    return np.asarray(v, dtype=np.float64).reshape(4)


class SystemBuilder:
    """Accumulates bodies/joints/motors/springs; ``finalize()`` → pytrees.

    All frames follow the joint convention of :mod:`chrono_tpu.physics.joints`:
    the functional axis is the joint frame's z axis.
    """

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self._bodies = []       # dicts
        self._joints = {}       # kind -> list of dicts
        self._motors = {}       # kind -> list of dicts
        self._load_motors = {}
        self._tsda = []
        self._rsda = []
        self.gravity = np.array([0.0, 0.0, -9.81])

    # ---------------- bodies ----------------

    def add_body(self, mass=1.0, inertia=(1.0, 1.0, 1.0), pos=(0, 0, 0),
                 rot=None, vel=(0, 0, 0), omega_local=(0, 0, 0),
                 fixed=False, name=None) -> int:
        """Add a rigid body; returns its index."""
        self._bodies.append(dict(
            mass=float(mass), inertia=_as3(inertia), pos=_as3(pos),
            rot=_as4(rot), vel=_as3(vel), omega=_as3(omega_local),
            fixed=bool(fixed), name=name,
        ))
        return len(self._bodies) - 1

    def add_ground(self, name="ground") -> int:
        return self.add_body(fixed=True, name=name)

    def set_gravity(self, g):
        self.gravity = _as3(g)

    # ---------------- joints ----------------

    def _add_joint(self, kind, body_a, body_b, fa_pos, fa_rot, fb_pos, fb_rot,
                   aux=0.0):
        self._joints.setdefault(kind, []).append(dict(
            a=body_a, b=body_b, fa_pos=_as3(fa_pos), fa_rot=_as4(fa_rot),
            fb_pos=_as3(fb_pos), fb_rot=_as4(fb_rot), aux=float(aux),
        ))

    def add_joint(self, kind, body_a, body_b, world_pos=(0, 0, 0),
                  world_axis=(0, 0, 1), aux=0.0):
        """Add a joint at a WORLD anchor point with a WORLD z axis.

        Computes the per-body local joint frames from the current builder poses
        (the reference's ``ChLink::Initialize(body1, body2, csys)`` pattern).
        """
        if kind not in JOINT_TYPES:
            raise ValueError(f"unknown joint kind {kind!r}; "
                             f"available: {sorted(JOINT_TYPES)}")
        rot = _quat_z_to(world_axis)
        fa_pos, fa_rot = self._world_to_local(body_a, _as3(world_pos), rot)
        fb_pos, fb_rot = self._world_to_local(body_b, _as3(world_pos), rot)
        self._add_joint(kind, body_a, body_b, fa_pos, fa_rot, fb_pos, fb_rot, aux)

    def add_joint_frames(self, kind, body_a, body_b, fa_pos=(0, 0, 0),
                         fa_rot=None, fb_pos=(0, 0, 0), fb_rot=None, aux=0.0):
        """Add a joint with explicitly given body-local frames."""
        if kind not in JOINT_TYPES:
            raise ValueError(f"unknown joint kind {kind!r}")
        self._add_joint(kind, body_a, body_b, fa_pos, _as4(fa_rot),
                        fb_pos, _as4(fb_rot), aux)

    def add_distance(self, body_a, body_b, pa_world, pb_world, distance=None):
        pa_loc, _ = self._world_to_local(body_a, _as3(pa_world), None)
        pb_loc, _ = self._world_to_local(body_b, _as3(pb_world), None)
        if distance is None:
            distance = float(np.linalg.norm(_as3(pb_world) - _as3(pa_world)))
        self._add_joint("distance", body_a, body_b, pa_loc, None, pb_loc, None,
                        aux=distance)

    # ---------------- motors ----------------

    def _add_motor(self, registry, kind, body_a, body_b, world_pos, world_axis,
                   profile):
        rot = _quat_z_to(world_axis)
        fa_pos, fa_rot = self._world_to_local(body_a, _as3(world_pos), rot)
        fb_pos, fb_rot = self._world_to_local(body_b, _as3(world_pos), rot)
        if not isinstance(profile, MotionFunction):
            profile = FConst(c=jnp.asarray(float(profile), self.dtype))
        registry.setdefault(kind, []).append(dict(
            a=body_a, b=body_b, fa_pos=fa_pos, fa_rot=fa_rot,
            fb_pos=fb_pos, fb_rot=fb_rot, profile=profile,
        ))

    def add_motor_rotation_speed(self, body_a, body_b, world_pos, world_axis,
                                 profile, add_joint=True):
        """Speed-driven rotational motor (+ guiding revolute unless disabled)."""
        if add_joint:
            self.add_joint("revolute", body_a, body_b, world_pos, world_axis)
        self._add_motor(self._motors, "rot_speed", body_a, body_b, world_pos,
                        world_axis, profile)

    def add_motor_rotation_angle(self, body_a, body_b, world_pos, world_axis,
                                 profile, add_joint=True):
        if add_joint:
            self.add_joint("revolute", body_a, body_b, world_pos, world_axis)
        self._add_motor(self._motors, "rot_angle", body_a, body_b, world_pos,
                        world_axis, profile)

    def add_motor_rotation_torque(self, body_a, body_b, world_pos, world_axis,
                                  profile, add_joint=True):
        if add_joint:
            self.add_joint("revolute", body_a, body_b, world_pos, world_axis)
        self._add_motor(self._load_motors, "rot_torque", body_a, body_b,
                        world_pos, world_axis, profile)

    def add_motor_linear_speed(self, body_a, body_b, world_pos, world_axis,
                               profile, add_joint=True):
        if add_joint:
            self.add_joint("prismatic", body_a, body_b, world_pos, world_axis)
        self._add_motor(self._motors, "lin_speed", body_a, body_b, world_pos,
                        world_axis, profile)

    def add_motor_linear_position(self, body_a, body_b, world_pos, world_axis,
                                  profile, add_joint=True):
        if add_joint:
            self.add_joint("prismatic", body_a, body_b, world_pos, world_axis)
        self._add_motor(self._motors, "lin_pos", body_a, body_b, world_pos,
                        world_axis, profile)

    def add_motor_linear_force(self, body_a, body_b, world_pos, world_axis,
                               profile, add_joint=False):
        if add_joint:
            self.add_joint("prismatic", body_a, body_b, world_pos, world_axis)
        self._add_motor(self._load_motors, "lin_force", body_a, body_b,
                        world_pos, world_axis, profile)

    # ---------------- force elements ----------------

    def add_tsda(self, body_a, body_b, pa_world, pb_world, k=0.0, c=0.0,
                 rest_length=None, f_actuation=0.0):
        pa_loc, _ = self._world_to_local(body_a, _as3(pa_world), None)
        pb_loc, _ = self._world_to_local(body_b, _as3(pb_world), None)
        if rest_length is None:
            rest_length = float(np.linalg.norm(_as3(pb_world) - _as3(pa_world)))
        self._tsda.append(dict(a=body_a, b=body_b, pa=pa_loc, pb=pb_loc,
                               k=float(k), c=float(c), l0=float(rest_length),
                               fa=float(f_actuation)))

    def add_rsda(self, body_a, body_b, world_axis=(0, 0, 1), k=0.0, c=0.0,
                 rest_angle=0.0, t_actuation=0.0):
        rot = _quat_z_to(world_axis)
        _, fa_rot = self._world_to_local(body_a, np.zeros(3), rot)
        _, fb_rot = self._world_to_local(body_b, np.zeros(3), rot)
        self._rsda.append(dict(a=body_a, b=body_b, fa_rot=fa_rot,
                               fb_rot=fb_rot, k=float(k), c=float(c),
                               a0=float(rest_angle), ta=float(t_actuation)))

    # ---------------- finalize ----------------

    def _world_to_local(self, body_idx, world_pos, world_rot):
        b = self._bodies[body_idx]
        qb = b["rot"]
        qb_inv = qb * np.array([1.0, -1.0, -1.0, -1.0])
        loc = np.asarray(
            Q.qrotate(jnp.asarray(qb_inv), jnp.asarray(world_pos - b["pos"])))
        if world_rot is None:
            rot = None
        else:
            rot = np.asarray(Q.qmul(jnp.asarray(qb_inv), jnp.asarray(world_rot)))
        return loc, rot

    def finalize(self):
        """Freeze the scene → ``(Model, BodyState)``."""
        nb = len(self._bodies)
        if nb == 0:
            raise ValueError("empty system")
        dt = self.dtype
        arr = lambda k: jnp.asarray(
            np.stack([b[k] for b in self._bodies]), dtype=dt)
        inv_mass = jnp.asarray(
            [0.0 if b["fixed"] or b["mass"] <= 0 else 1.0 / b["mass"]
             for b in self._bodies], dtype=dt)
        inertia = arr("inertia")
        inv_inertia = jnp.where(
            inv_mass[:, None] > 0, 1.0 / jnp.maximum(inertia, 1e-30), 0.0)
        props = BodyProps(inv_mass=inv_mass, inertia=inertia,
                          inv_inertia=inv_inertia)
        state = BodyState(x=arr("pos"), q=arr("rot"), v=arr("vel"),
                          w=arr("omega"))

        def joint_data(items):
            return JointData(
                body_a=jnp.asarray([i["a"] for i in items], jnp.int32),
                body_b=jnp.asarray([i["b"] for i in items], jnp.int32),
                fa_pos=jnp.asarray(np.stack([i["fa_pos"] for i in items]), dt),
                fa_rot=jnp.asarray(np.stack([_as4(i["fa_rot"]) for i in items]), dt),
                fb_pos=jnp.asarray(np.stack([i["fb_pos"] for i in items]), dt),
                fb_rot=jnp.asarray(np.stack([_as4(i["fb_rot"]) for i in items]), dt),
                aux=jnp.asarray([i["aux"] for i in items], dt),
            )

        def motor_data(items):
            # one MotorData per kind; profiles must be identical pytree structure
            # within a kind — they are stacked leaf-wise for batched evaluation
            import jax
            profiles = [i["profile"] for i in items]
            treedefs = {jax.tree_util.tree_structure(p) for p in profiles}
            if len(treedefs) > 1:
                raise ValueError(
                    "all motors of one kind must share the same profile type; "
                    "split different profiles across motor kinds or pad")
            profile = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x, dt) for x in xs]), *profiles)
            return MotorData(
                body_a=jnp.asarray([i["a"] for i in items], jnp.int32),
                body_b=jnp.asarray([i["b"] for i in items], jnp.int32),
                fa_pos=jnp.asarray(np.stack([i["fa_pos"] for i in items]), dt),
                fa_rot=jnp.asarray(np.stack([_as4(i["fa_rot"]) for i in items]), dt),
                fb_pos=jnp.asarray(np.stack([i["fb_pos"] for i in items]), dt),
                fb_rot=jnp.asarray(np.stack([_as4(i["fb_rot"]) for i in items]), dt),
                profile=profile,
            )

        joints = {k: joint_data(v) for k, v in self._joints.items()}
        motors = {k: motor_data(v) for k, v in self._motors.items()}
        load_motors = {k: motor_data(v) for k, v in self._load_motors.items()}

        tsda = None
        if self._tsda:
            tsda = TSDAData(
                body_a=jnp.asarray([s["a"] for s in self._tsda], jnp.int32),
                body_b=jnp.asarray([s["b"] for s in self._tsda], jnp.int32),
                pa_loc=jnp.asarray(np.stack([s["pa"] for s in self._tsda]), dt),
                pb_loc=jnp.asarray(np.stack([s["pb"] for s in self._tsda]), dt),
                k=jnp.asarray([s["k"] for s in self._tsda], dt),
                c=jnp.asarray([s["c"] for s in self._tsda], dt),
                rest_len=jnp.asarray([s["l0"] for s in self._tsda], dt),
                f_act=jnp.asarray([s["fa"] for s in self._tsda], dt),
            )
        rsda = None
        if self._rsda:
            rsda = RSDAData(
                body_a=jnp.asarray([s["a"] for s in self._rsda], jnp.int32),
                body_b=jnp.asarray([s["b"] for s in self._rsda], jnp.int32),
                fa_rot=jnp.asarray(np.stack([s["fa_rot"] for s in self._rsda]), dt),
                fb_rot=jnp.asarray(np.stack([s["fb_rot"] for s in self._rsda]), dt),
                k=jnp.asarray([s["k"] for s in self._rsda], dt),
                c=jnp.asarray([s["c"] for s in self._rsda], dt),
                rest_angle=jnp.asarray([s["a0"] for s in self._rsda], dt),
                t_act=jnp.asarray([s["ta"] for s in self._rsda], dt),
            )

        model = Model(
            props=props, gravity=jnp.asarray(self.gravity, dt),
            joints=joints, motors=motors, load_motors=load_motors,
            tsda=tsda, rsda=rsda,
        )
        return model, state


def _quat_z_to(axis):
    """Quaternion (numpy) rotating +z onto ``axis``."""
    z = np.array([0.0, 0.0, 1.0])
    a = _as3(axis)
    a = a / np.linalg.norm(a)
    c = float(np.dot(z, a))
    if c > 1.0 - 1e-12:
        return np.array([1.0, 0.0, 0.0, 0.0])
    if c < -1.0 + 1e-12:
        return np.array([0.0, 1.0, 0.0, 0.0])  # 180° about x
    axis_r = np.cross(z, a)
    s = np.linalg.norm(axis_r)
    axis_r = axis_r / s
    half = 0.5 * np.arctan2(s, c)
    return np.concatenate([[np.cos(half)], axis_r * np.sin(half)])
