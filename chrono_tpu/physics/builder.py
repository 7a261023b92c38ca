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
        self._shaft_cons = {}   # kind -> list of dicts
        self._shaft_elems = []  # clutch/spring/torque elements
        self._couplers = {}     # kind -> list of dicts (gear/pulley/rack/screw)
        self._bushings = []
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

    # ---------------- shafts (1-D drivetrain) ----------------

    def add_shaft(self, inertia=1.0, speed=0.0, name=None) -> int:
        """1-DOF rotational inertia (reference ChShaft): a body whose only
        live DOF is spin about its local z axis."""
        idx = self.add_body(mass=0.0, inertia=(1.0, 1.0, float(inertia)),
                            omega_local=(0.0, 0.0, float(speed)), name=name)
        self._bodies[idx]["shaft"] = True
        return idx

    def add_shaft_gear(self, shaft_a, shaft_b, ratio):
        """ω_a = ratio · ω_b (ChShaftsGear)."""
        self._shaft_cons.setdefault("gear", []).append(
            dict(a=shaft_a, b=shaft_b, ratio=float(ratio)))

    def add_shaft_planetary(self, carrier, sun, ring, ratio):
        """Willis equation with ring/sun ratio ψ = z_ring/z_sun:
        (1+ψ) ω_c − ω_s − ψ ω_r = 0 (ChShaftsPlanetary)."""
        psi = float(ratio)
        self._shaft_cons.setdefault("planetary", []).append(
            dict(c=carrier, s=sun, r=ring,
                 cc=1.0 + psi, cs=-1.0, cr=-psi))

    def add_shaft_body(self, shaft, body, axis_local=(0, 0, 1)):
        """Lock a shaft's spin to a body's angular velocity about a
        body-local axis (ChShaftsBody)."""
        self._shaft_cons.setdefault("shaft_body", []).append(
            dict(a=shaft, b=body, axis=_as3(axis_local)))

    def add_shaft_clutch(self, shaft_a, shaft_b, torque_max, c_slip=50.0,
                         engagement=1.0):
        self._shaft_elems.append(dict(a=shaft_a, b=shaft_b, kind=0,
                                      k=float(c_slip), c=float(torque_max),
                                      rest=float(engagement)))

    def add_shaft_torsion_spring(self, shaft_a, shaft_b, k, c=0.0,
                                 rest_angle=0.0):
        self._shaft_elems.append(dict(a=shaft_a, b=shaft_b, kind=1,
                                      k=float(k), c=float(c),
                                      rest=float(rest_angle)))

    def add_shaft_torque(self, shaft_a, shaft_b, torque):
        """Constant applied torque pair (+τ on a, −τ on b)."""
        self._shaft_elems.append(dict(a=shaft_a, b=shaft_b, kind=2,
                                      k=float(torque), c=0.0, rest=0.0))

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

    def add_rev_spherical(self, body_a, body_b, axis_point_world,
                          axis_world=(0, 0, 1), point_world=None,
                          distance=None):
        """Revolute–spherical composite (ChLinkRevoluteSpherical): a point of
        body b held at fixed distance from the revolute axis on body a, in the
        plane normal to the axis.  ``point_world`` defaults to body b's
        position."""
        if point_world is None:
            point_world = self._bodies[body_b]["pos"]
        ap = _as3(axis_point_world)
        z = _as3(axis_world)
        z = z / np.linalg.norm(z)
        d = _as3(point_world) - ap
        if distance is None:
            distance = float(np.linalg.norm(d - (d @ z) * z))
        rot = _quat_z_to(z)
        fa_pos, fa_rot = self._world_to_local(body_a, ap, rot)
        fb_pos, fb_rot = self._world_to_local(body_b, _as3(point_world), rot)
        self._add_joint("rev_spherical", body_a, body_b, fa_pos, fa_rot,
                        fb_pos, fb_rot, aux=distance)

    def add_distance(self, body_a, body_b, pa_world, pb_world, distance=None):
        pa_loc, _ = self._world_to_local(body_a, _as3(pa_world), None)
        pb_loc, _ = self._world_to_local(body_b, _as3(pb_world), None)
        if distance is None:
            distance = float(np.linalg.norm(_as3(pb_world) - _as3(pa_world)))
        self._add_joint("distance", body_a, body_b, pa_loc, None, pb_loc, None,
                        aux=distance)

    # ---------------- transmission couplers (velocity-level) ----------------

    def _add_coupler(self, kind, body_a, body_b, axis_a, axis_b, aux):
        """Velocity-level transmission row (see joints.COUPLER_TYPES)."""
        _, fa_rot = self._world_to_local(body_a, np.zeros(3),
                                         _quat_z_to(axis_a))
        _, fb_rot = self._world_to_local(body_b, np.zeros(3),
                                         _quat_z_to(axis_b))
        self._couplers.setdefault(kind, []).append(dict(
            a=body_a, b=body_b, fa_pos=np.zeros(3), fa_rot=fa_rot,
            fb_pos=np.zeros(3), fb_rot=fb_rot, aux=float(aux)))

    def add_gear(self, body_a, body_b, ratio, axis_a=(0, 0, 1),
                 axis_b=(0, 0, 1), internal=False):
        """Gear pair on 6-DOF bodies (ChLinkLockGear role): rolling pitch
        circles, ratio = r_a/r_b.  External gears counter-rotate."""
        sign = -1.0 if internal else 1.0
        self._add_coupler("gear", body_a, body_b, axis_a, axis_b,
                          sign * float(ratio))

    def add_pulley(self, body_a, body_b, ratio, axis_a=(0, 0, 1),
                   axis_b=(0, 0, 1)):
        """Belt pulley pair (ChLinkLockPulley role): co-rotating, ω_b =
        ratio·ω_a."""
        self._add_coupler("pulley", body_a, body_b, axis_a, axis_b,
                          -float(ratio))

    def add_rack_pinion(self, pinion, rack, radius, pinion_axis=(0, 0, 1),
                        rack_dir=(1, 0, 0)):
        """Pinion rotation drives rack translation (ChLinkRackpinion role)."""
        self._add_coupler("rack_pinion", pinion, rack, pinion_axis, rack_dir,
                          float(radius))

    def add_screw(self, body_a, body_b, pitch, world_pos=(0, 0, 0),
                  world_axis=(0, 0, 1), add_joint=True):
        """Screw joint (ChLinkLockScrew role): cylindrical joint + pitch
        coupling (translation per revolution = pitch)."""
        if add_joint:
            self.add_joint("cylindrical", body_a, body_b, world_pos, world_axis)
        self._add_coupler("screw", body_a, body_b, world_axis, world_axis,
                          float(pitch))

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

    def add_bushing(self, body_a, body_b, world_pos, world_axis=(0, 0, 1),
                    k_t=(1e5,) * 3, c_t=(1e3,) * 3, k_r=(1e3,) * 3,
                    c_r=(10.0,) * 3):
        """Compliant 6-DOF bushing (ChLinkBushing): per-axis stiffness /
        damping in the bushing frame placed at a WORLD anchor."""
        rot = _quat_z_to(world_axis)
        fa_pos, fa_rot = self._world_to_local(body_a, _as3(world_pos), rot)
        fb_pos, fb_rot = self._world_to_local(body_b, _as3(world_pos), rot)
        self._bushings.append(dict(
            a=body_a, b=body_b, fa_pos=fa_pos, fa_rot=fa_rot,
            fb_pos=fb_pos, fb_rot=fb_rot,
            k_t=_as3(k_t), c_t=_as3(c_t), k_r=_as3(k_r), c_r=_as3(c_r)))

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
        # shafts: translationally fixed, but spin about local z stays live
        shaft_mask = np.asarray([b.get("shaft", False) for b in self._bodies])
        if shaft_mask.any():
            iz = 1.0 / np.maximum(
                np.asarray([b["inertia"][2] for b in self._bodies]), 1e-30)
            shaft_inv = np.zeros((nb, 3))
            shaft_inv[:, 2] = iz
            inv_inertia = jnp.where(jnp.asarray(shaft_mask)[:, None],
                                    jnp.asarray(shaft_inv, dt), inv_inertia)
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

        shaft_cons = {}
        if self._shaft_cons:
            from chrono_tpu.physics import shafts as sh

            for kind, items in self._shaft_cons.items():
                if kind == "gear":
                    shaft_cons[kind] = sh.ShaftGearData(
                        shaft_a=jnp.asarray([i["a"] for i in items], jnp.int32),
                        shaft_b=jnp.asarray([i["b"] for i in items], jnp.int32),
                        ratio=jnp.asarray([i["ratio"] for i in items], dt))
                elif kind == "planetary":
                    shaft_cons[kind] = sh.ShaftPlanetaryData(
                        carrier=jnp.asarray([i["c"] for i in items], jnp.int32),
                        sun=jnp.asarray([i["s"] for i in items], jnp.int32),
                        ring=jnp.asarray([i["r"] for i in items], jnp.int32),
                        c_carrier=jnp.asarray([i["cc"] for i in items], dt),
                        c_sun=jnp.asarray([i["cs"] for i in items], dt),
                        c_ring=jnp.asarray([i["cr"] for i in items], dt))
                elif kind == "shaft_body":
                    shaft_cons[kind] = sh.ShaftBodyData(
                        shaft=jnp.asarray([i["a"] for i in items], jnp.int32),
                        body=jnp.asarray([i["b"] for i in items], jnp.int32),
                        axis_local=jnp.asarray(
                            np.stack([i["axis"] for i in items]), dt))

        bushings = None
        if self._bushings:
            from chrono_tpu.physics.force_elements import BushingData

            e = self._bushings
            arr3 = lambda k: jnp.asarray(np.stack([i[k] for i in e]), dt)
            bushings = BushingData(
                body_a=jnp.asarray([i["a"] for i in e], jnp.int32),
                body_b=jnp.asarray([i["b"] for i in e], jnp.int32),
                fa_pos=arr3("fa_pos"),
                fa_rot=jnp.asarray(np.stack([_as4(i["fa_rot"]) for i in e]), dt),
                fb_pos=arr3("fb_pos"),
                fb_rot=jnp.asarray(np.stack([_as4(i["fb_rot"]) for i in e]), dt),
                k_t=arr3("k_t"), c_t=arr3("c_t"),
                k_r=arr3("k_r"), c_r=arr3("c_r"))

        shaft_elems = None
        if self._shaft_elems:
            from chrono_tpu.physics.shafts import ShaftTorqueElements

            e = self._shaft_elems
            shaft_elems = ShaftTorqueElements(
                shaft_a=jnp.asarray([i["a"] for i in e], jnp.int32),
                shaft_b=jnp.asarray([i["b"] for i in e], jnp.int32),
                kind=jnp.asarray([i["kind"] for i in e], jnp.int32),
                k=jnp.asarray([i["k"] for i in e], dt),
                c=jnp.asarray([i["c"] for i in e], dt),
                rest=jnp.asarray([i["rest"] for i in e], dt))

        model = Model(
            props=props, gravity=jnp.asarray(self.gravity, dt),
            joints=joints, motors=motors, load_motors=load_motors,
            tsda=tsda, rsda=rsda,
            shaft_constraints=shaft_cons, shaft_elements=shaft_elems,
            couplers={k: joint_data(v) for k, v in self._couplers.items()},
            bushings=bushings,
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
