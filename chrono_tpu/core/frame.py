"""Rigid frames (position + orientation) as batched pytrees.

Functional equivalent of the reference's ``ChFrame``/``ChCoordsys``
(/root/reference/src/chrono/core/ChFrame.h, ChCoordsys.h): composition, inversion and
point/direction transforms, all broadcasting over leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q


@pytree_dataclass
class Frame:
    """A rigid transform: ``p_world = pos + R(rot) · p_local``."""

    pos: Array  # (..., 3)
    rot: Array  # (..., 4) unit quaternion, scalar-first

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "Frame":
        return Frame(
            pos=jnp.zeros(tuple(shape) + (3,), dtype=dtype),
            rot=Q.qidentity(shape, dtype=dtype),
        )

    def transform_point(self, p: Array) -> Array:
        """Local point → world."""
        return self.pos + Q.qrotate(self.rot, p)

    def transform_dir(self, d: Array) -> Array:
        """Local direction → world (rotation only)."""
        return Q.qrotate(self.rot, d)

    def inv_transform_point(self, p: Array) -> Array:
        """World point → local."""
        return Q.qrotate_inv(self.rot, p - self.pos)

    def inv_transform_dir(self, d: Array) -> Array:
        return Q.qrotate_inv(self.rot, d)

    def compose(self, other: "Frame") -> "Frame":
        """``self ∘ other``: apply ``other`` in self's local space.

        ``(self ∘ other).transform_point(p) == self.transform_point(other.transform_point(p))``
        """
        return Frame(
            pos=self.transform_point(other.pos),
            rot=Q.qmul(self.rot, other.rot),
        )

    def inverse(self) -> "Frame":
        rinv = Q.qconj(self.rot)
        return Frame(pos=-Q.qrotate(rinv, self.pos), rot=rinv)


def skew(v: Array) -> Array:
    """Cross-product (hat) matrix: ``skew(v) @ u == cross(v, u)``; batched ``(...,3,3)``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))
