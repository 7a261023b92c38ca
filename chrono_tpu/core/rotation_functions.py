"""Rotation-valued motion functions: q(t) on SO(3).

Counterpart of the reference's ``ChFunctionRotation`` family
(/root/reference/src/chrono/functions/ChFunctionRotation*.h: ABCFunctions,
Axis, BSpline, SQUAD, Setpoint): time-parameterized orientation programs used
by imposed-motion links.  Each exposes ``value(t) -> quaternion (w,x,y,z)``
and ``omega(t) -> (3,) world angular velocity`` — the latter exact via
autodiff of the quaternion path (ω = 2 (q̇ ⊗ q*)_vec), replacing the
reference's hand-coded derivative estimators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q
from chrono_tpu.core.functions import MotionFunction, FConst


class RotationFunction:
    """Base: quaternion-valued function of time."""

    def value(self, t):  # pragma: no cover - abstract
        raise NotImplementedError

    def omega(self, t):
        """World angular velocity, exact: ω = 2 (q̇ ⊗ q⁻¹)_vec."""
        t = jnp.asarray(t, jnp.result_type(float))
        q, qdot = jax.jvp(self.value, (t,), (jnp.ones_like(t),))
        qc = q * jnp.asarray([1.0, -1.0, -1.0, -1.0])
        return 2.0 * Q.qmul(qdot, qc)[..., 1:4]

    def __call__(self, t):
        return self.value(t)


@pytree_dataclass
class RotConst(RotationFunction):
    """Fixed orientation (ChFunctionRotation base default)."""

    q: jnp.ndarray

    def value(self, t):
        return self.q + 0.0 * t


@pytree_dataclass
class RotAxisAngle(RotationFunction):
    """Rotation about a fixed axis by a scalar angle program
    (ChFunctionRotationAxis): q(t) = exp(axis · f(t))."""

    axis: jnp.ndarray                 # (3,) unit
    angle: MotionFunction

    def value(self, t):
        a = self.angle.value(t)
        return Q.qexp_half(self.axis * a)


@pytree_dataclass
class RotSlerp(RotationFunction):
    """Piecewise spherical-linear interpolation through key orientations at
    key times (ChFunctionRotationBSpline/SQUAD role, C0 chart)."""

    ts: jnp.ndarray                   # (K,) ascending
    qs: jnp.ndarray                   # (K, 4) unit quaternions

    def value(self, t):
        t = jnp.asarray(t)
        K = self.ts.shape[0]
        i = jnp.clip(jnp.searchsorted(self.ts, t) - 1, 0, K - 2)
        t0, t1 = self.ts[i], self.ts[i + 1]
        u = jnp.clip((t - t0) / (t1 - t0), 0.0, 1.0)
        q0, q1 = self.qs[i], self.qs[i + 1]
        # shortest-path slerp via the relative rotation's log map
        rel = Q.qmul(q1, q0 * jnp.asarray([1.0, -1.0, -1.0, -1.0]))
        rel = jnp.where(rel[0] < 0, -rel, rel)
        w = Q.qlog2(rel)
        return Q.qmul(Q.qexp_half(u * w), q0)


@pytree_dataclass
class RotABC(RotationFunction):
    """Three independent Euler-angle programs (ChFunctionRotationABCFunctions,
    Z-Y-X convention)."""

    fa: MotionFunction                # yaw   about z
    fb: MotionFunction                # pitch about y
    fc: MotionFunction                # roll  about x

    def value(self, t):
        ez = jnp.asarray([0.0, 0.0, 1.0])
        ey = jnp.asarray([0.0, 1.0, 0.0])
        ex = jnp.asarray([1.0, 0.0, 0.0])
        return Q.qmul(Q.qexp_half(ez * self.fa.value(t)),
                      Q.qmul(Q.qexp_half(ey * self.fb.value(t)),
                             Q.qexp_half(ex * self.fc.value(t))))
