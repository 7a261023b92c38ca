"""Segmented track: individual shoe bodies, pin joints, convex NSC contact.

TPU-native counterpart of the reference's segmented track assemblies
(/root/reference/src/chrono_vehicle/tracked_vehicle/track_shoe/
ChTrackShoeSinglePin.h — rigid shoe bodies joined by revolute pins, wrapped
around sprocket/idler, engaging through contact).  Design differences, by
intent:

* shoes are BOX convex shapes and the sprocket/idler are CYLINDERs in the
  batched MPR narrowphase (chrono_tpu.collision.pipeline.ConvexShapes) — one
  fixed-capacity contact buffer, the whole detect→VI-solve step is a single
  XLA program, no per-shoe C++ objects;
* engagement is friction drive on the wheel rims (the track is pressed onto
  the sprocket by gravity and vehicle weight) rather than resolved tooth
  profiles — the reference's tooth geometry exists to prevent slip at high
  torque; here a high rim μ plays that role and the discrete-shoe dynamics
  (pin kinematics, polygon effect, shoe-ground contact patch) are preserved.

Layout is an x–z plane oval: two straights + two wraps around (rear, front)
wheels.  ``add_segmented_track`` returns everything needed to build the
``CollisionModel`` via ``track_collision_shapes``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.collision import mpr
from chrono_tpu.collision.pipeline import ConvexShapes


class SegmentedTrack(NamedTuple):
    shoes: list          # body ids, ordered around the loop
    sprocket: int        # driven wheel body id
    idler: int
    pitch: float
    wheel_r: float
    shoe_half: tuple     # (hx, hy, hz) collision half extents


def _oval(c_rear, c_front, rp, n: int):
    """n equally spaced (pos, tangent-angle-about-y) samples on the oval of
    'radius' rp around the two x–z centers (counter-clockwise seen from +y:
    bottom strand runs rear→front)."""
    c_rear = np.asarray(c_rear, float)
    c_front = np.asarray(c_front, float)
    d = float(np.linalg.norm(c_front - c_rear))
    L = 2.0 * d + 2.0 * np.pi * rp
    ds = L / n
    ex = (c_front - c_rear) / d                  # unit along the straights

    pts, angs = [], []
    for i in range(n):
        s = i * ds
        if s < d:                                 # bottom strand (z = -rp)
            p = c_rear + s * ex + np.array([0.0, 0.0, -rp])
            a = 0.0
        elif s < d + np.pi * rp:                  # front wrap (CCW from -z)
            t = (s - d) / rp
            p = c_front + rp * np.array([np.sin(t), 0.0, -np.cos(t)])
            a = t
        elif s < 2 * d + np.pi * rp:              # top strand (z = +rp)
            p = c_front - (s - d - np.pi * rp) * ex + np.array([0, 0, rp])
            a = np.pi
        else:                                     # rear wrap
            t = (s - 2 * d - np.pi * rp) / rp
            p = c_rear + rp * np.array([-np.sin(t), 0.0, np.cos(t)])
            a = np.pi + t
        pts.append(p)
        angs.append(a)
    return np.asarray(pts), np.asarray(angs), ds


def add_segmented_track(bld: SystemBuilder, chassis: int,
                        c_rear, c_front, wheel_r: float,
                        n_shoes: int, shoe_h: float, shoe_w: float,
                        shoe_mass: float = 1.0, wheel_mass: float = 5.0,
                        clearance: float = 2e-3) -> SegmentedTrack:
    """Build one track: sprocket (at c_front) + idler (at c_rear) revolute on
    the chassis, ``n_shoes`` shoes pinned in a loop around both wheels."""
    rp = wheel_r + 0.5 * shoe_h + clearance      # path of shoe centers
    pts, angs, pitch = _oval(c_rear, c_front, rp, n_shoes)
    hx = 0.5 * pitch - 0.15 * shoe_h             # gap so neighbors never touch
    half = (hx, 0.5 * shoe_w, 0.5 * shoe_h)

    iner_w = (0.5 * wheel_mass * wheel_r**2,) * 3
    sprocket = bld.add_body(mass=wheel_mass, inertia=iner_w, pos=c_front)
    idler = bld.add_body(mass=wheel_mass, inertia=iner_w, pos=c_rear)
    bld.add_joint("revolute", chassis, sprocket, world_pos=c_front,
                  world_axis=(0, 1, 0))
    bld.add_joint("revolute", chassis, idler, world_pos=c_rear,
                  world_axis=(0, 1, 0))

    ish = shoe_mass * (half[0]**2 + half[2]**2) / 3.0
    shoes = []
    for p, a in zip(pts, angs):
        q = (np.cos(a / 2), 0.0, np.sin(a / 2), 0.0)
        shoes.append(bld.add_body(
            mass=shoe_mass, inertia=(ish, ish, ish), pos=tuple(p), rot=q))
    # pin joints at the midpoints between consecutive shoe centers
    for i in range(n_shoes):
        j = (i + 1) % n_shoes
        mid = 0.5 * (pts[i] + pts[j])
        bld.add_joint("revolute", shoes[i], shoes[j], world_pos=tuple(mid),
                      world_axis=(0, 1, 0))
    return SegmentedTrack(shoes=shoes, sprocket=sprocket, idler=idler,
                          pitch=pitch, wheel_r=wheel_r, shoe_half=half)


def track_collision_shapes(track: SegmentedTrack, mu_shoe: float = 0.9,
                           mu_rim: float = 1.5, extra=None) -> ConvexShapes:
    """ConvexShapes for the track (+ optional ``extra`` ConvexShapes rows,
    e.g. the ground box) for chrono_tpu.collision.pipeline.CollisionModel."""
    n = len(track.shoes)
    V = 8
    qx = (np.sqrt(0.5), np.sqrt(0.5), 0.0, 0.0)  # local z → world y (cyl axis)
    body = track.shoes + [track.sprocket, track.idler]
    kind = [mpr.BOX] * n + [mpr.CYLINDER] * 2
    data = [list(track.shoe_half)] * n + \
        [[track.wheel_r, 0.5 * track.shoe_half[1], 0.0]] * 2
    rot = [[1.0, 0, 0, 0]] * n + [list(qx)] * 2
    mu = [mu_shoe] * n + [mu_rim] * 2
    # shoes share collision family 1: pinned neighbors on the wrap arcs graze
    # at their corners and must not generate shoe-shoe contacts
    fam = [1] * n + [0] * 2
    out = ConvexShapes(
        body=jnp.asarray(body, jnp.int32),
        kind=jnp.asarray(kind, jnp.int32),
        pos=jnp.zeros((n + 2, 3)),
        rot=jnp.asarray(rot, jnp.float32),
        data=jnp.asarray(data, jnp.float32),
        verts=jnp.zeros((n + 2, V, 3)),
        mu=jnp.asarray(mu, jnp.float32),
        family=jnp.asarray(fam, jnp.int32),
    )
    if extra is not None:
        ef = (extra.family if extra.family is not None
              else jnp.zeros((extra.n,), jnp.int32))
        out = ConvexShapes(
            body=jnp.concatenate([out.body, extra.body]),
            kind=jnp.concatenate([out.kind, extra.kind]),
            pos=jnp.concatenate([out.pos, extra.pos]),
            rot=jnp.concatenate([out.rot, extra.rot]),
            data=jnp.concatenate([out.data, extra.data]),
            verts=jnp.concatenate([out.verts, extra.verts]),
            mu=jnp.concatenate([out.mu, extra.mu]),
            family=jnp.concatenate([out.family, ef]),
        )
    return out


def ground_shape(body_id: int, half=(50.0, 50.0, 0.5), z_top: float = 0.0,
                 mu: float = 0.9) -> ConvexShapes:
    V = 8
    return ConvexShapes(
        body=jnp.asarray([body_id], jnp.int32),
        kind=jnp.asarray([mpr.BOX], jnp.int32),
        pos=jnp.asarray([[0.0, 0.0, z_top - half[2]]]),
        rot=jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
        data=jnp.asarray([list(half)], jnp.float32),
        verts=jnp.zeros((1, V, 3)),
        mu=jnp.asarray([mu], jnp.float32),
    )
