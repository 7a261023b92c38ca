"""1-D motion functions used by motors and actuators.

Equivalent of the reference's ``ChFunction`` family
(/root/reference/src/chrono/functions/ChFunction*.h) re-designed as jit-safe pytree
callables: each function is a small dataclass whose parameters are traced arrays, so a
motor profile can be differentiated through or swept under ``vmap``.

All functions expose ``value(t)``, ``deriv(t)`` and ``deriv2(t)``; ``deriv`` defaults
to forward-mode autodiff of ``value`` which is exact for every function here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field


class MotionFunction:
    """Base: scalar function of time, differentiable via JAX."""

    def value(self, t):  # pragma: no cover - abstract
        raise NotImplementedError

    def deriv(self, t):
        return jax.jacfwd(self.value)(jnp.asarray(t, dtype=jnp.result_type(float)))

    def deriv2(self, t):
        return jax.jacfwd(self.deriv)(jnp.asarray(t, dtype=jnp.result_type(float)))

    def __call__(self, t):
        return self.value(t)


@pytree_dataclass
class FConst(MotionFunction):
    """f(t) = c   (reference: ChFunctionConst)."""

    c: Array

    def value(self, t):
        return self.c + 0.0 * t

    def deriv(self, t):
        return jnp.zeros_like(jnp.asarray(t, dtype=jnp.asarray(self.c).dtype))


@pytree_dataclass
class FRamp(MotionFunction):
    """f(t) = y0 + slope·t   (reference: ChFunctionRamp)."""

    y0: Array
    slope: Array

    def value(self, t):
        return self.y0 + self.slope * t

    def deriv(self, t):
        return self.slope + 0.0 * t


@pytree_dataclass
class FSine(MotionFunction):
    """f(t) = amp · sin(2π·freq·t + phase)   (reference: ChFunctionSine)."""

    amp: Array
    freq: Array
    phase: Array = 0.0

    def value(self, t):
        w = 2.0 * jnp.pi * self.freq
        return self.amp * jnp.sin(w * t + self.phase)

    def deriv(self, t):
        w = 2.0 * jnp.pi * self.freq
        return self.amp * w * jnp.cos(w * t + self.phase)


@pytree_dataclass
class FPoly(MotionFunction):
    """f(t) = Σ coeffs[k]·t^k   (reference: ChFunctionPoly)."""

    coeffs: Array  # (K,) low-order first

    def value(self, t):
        return jnp.polyval(self.coeffs[::-1], jnp.asarray(t))


@pytree_dataclass
class FInterp(MotionFunction):
    """Piecewise-linear interpolation of samples (reference: ChFunctionInterp).

    Knot tables may carry leading batch axes (``(…, K)``) — that is what a
    stack of per-motor FInterp profiles becomes after the builder stacks
    motors of one kind — in which case ``value``/``deriv`` broadcast a
    scalar ``t`` over the batch."""

    ts: Array  # (…, K) ascending along the last axis
    ys: Array  # (…, K)

    def _seg(self, t):
        K = self.ts.shape[-1]
        i = jnp.clip(jnp.sum(self.ts <= t, axis=-1) - 1, 0, K - 2)
        take = lambda a, idx: jnp.take_along_axis(
            a, idx[..., None], axis=-1)[..., 0]
        t0, t1 = take(self.ts, i), take(self.ts, i + 1)
        y0, y1 = take(self.ys, i), take(self.ys, i + 1)
        return t0, t1, y0, y1

    def value(self, t):
        if self.ts.ndim == 1:
            return jnp.interp(t, self.ts, self.ys)
        t0, t1, y0, y1 = self._seg(t)
        s = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-12), 0.0, 1.0)
        return y0 + s * (y1 - y0)

    def deriv(self, t):
        # slope of the active segment (zero outside the knot range)
        t0, t1, y0, y1 = self._seg(t)
        inside = jnp.logical_and(t >= self.ts[..., 0], t <= self.ts[..., -1])
        return jnp.where(inside, (y1 - y0) / jnp.maximum(t1 - t0, 1e-12),
                         0.0)


@pytree_dataclass
class FConstAcc(MotionFunction):
    """Trapezoidal speed profile reaching ``end`` displacement over ``duration``
    with acceleration ramps of fractional lengths aw1/aw2
    (reference: ChFunctionConstAcc)."""

    end: Array
    duration: Array
    aw1: float = static_field(default=0.3)
    aw2: float = static_field(default=0.7)

    def value(self, t):
        T = self.duration
        t = jnp.clip(t, 0.0, T)
        t1, t2 = self.aw1 * T, self.aw2 * T
        # peak velocity such that total displacement == end
        vmax = self.end / (T - 0.5 * t1 - 0.5 * (T - t2))
        u = jnp.where(
            t < t1,
            0.5 * vmax / t1 * t * t,
            jnp.where(
                t < t2,
                0.5 * vmax * t1 + vmax * (t - t1),
                0.5 * vmax * t1 + vmax * (t2 - t1)
                + vmax * (t - t2) - 0.5 * vmax / (T - t2) * (t - t2) ** 2,
            ),
        )
        return u


@pytree_dataclass
class FCycloidal(MotionFunction):
    """Cycloidal rise: f(t) = h·(x − sin(2πx)/2π), x = t/T clipped to [0,1]
    (reference: ChFunctionCycloidal) — zero velocity AND acceleration at both
    ends, the classic cam law."""

    height: Array
    width: Array

    def value(self, t):
        x = jnp.clip(t / self.width, 0.0, 1.0)
        return self.height * (x - jnp.sin(2.0 * jnp.pi * x) / (2.0 * jnp.pi))


@pytree_dataclass
class FPoly345(MotionFunction):
    """Quintic rise 10x³−15x⁴+6x⁵ (reference: ChFunctionPoly345)."""

    height: Array
    width: Array

    def value(self, t):
        x = jnp.clip(t / self.width, 0.0, 1.0)
        return self.height * (10.0 * x**3 - 15.0 * x**4 + 6.0 * x**5)


@pytree_dataclass
class FPoly23(MotionFunction):
    """Cubic rise 3x²−2x³ (reference: ChFunctionPoly23)."""

    height: Array
    width: Array

    def value(self, t):
        x = jnp.clip(t / self.width, 0.0, 1.0)
        return self.height * (3.0 * x**2 - 2.0 * x**3)


@pytree_dataclass
class FSineStep(MotionFunction):
    """Smooth step from (t1,y1) to (t2,y2) via a half-cosine
    (reference: ChFunctionSineStep)."""

    t1: Array
    y1: Array
    t2: Array
    y2: Array

    def value(self, t):
        x = jnp.clip((t - self.t1) / (self.t2 - self.t1), 0.0, 1.0)
        return self.y1 + (self.y2 - self.y1) * 0.5 * (
            1.0 - jnp.cos(jnp.pi * x))


@pytree_dataclass
class FBSpline(MotionFunction):
    """Uniform cubic B-spline through control points on [t0, t0+(K−3)·dt]
    (reference: ChFunctionBSpline role, uniform knots).  Evaluated with the
    standard cubic basis on the active span — branch-free via clipped span
    index, so it traces under jit/vmap."""

    ctrl: Array             # (K,) control points, K >= 4
    t0: Array = 0.0
    dt: Array = 1.0

    def value(self, t):
        K = self.ctrl.shape[0]
        u = (t - self.t0) / self.dt
        span = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, K - 4)
        x = u - span
        # clamp x only outside the domain (hold end values)
        x = jnp.clip(x, 0.0, 1.0) if K == 4 else jnp.where(
            u < 0, 0.0, jnp.where(u > K - 3, 1.0, x))
        b0 = (1 - x) ** 3 / 6.0
        b1 = (3 * x**3 - 6 * x**2 + 4) / 6.0
        b2 = (-3 * x**3 + 3 * x**2 + 3 * x + 1) / 6.0
        b3 = x**3 / 6.0
        c = jax.lax.dynamic_slice(self.ctrl, (span,), (4,))
        return b0 * c[0] + b1 * c[1] + b2 * c[2] + b3 * c[3]


@pytree_dataclass
class FMirror(MotionFunction):
    """f(t) = inner(2·t_mirror − t) for t > t_mirror, inner(t) otherwise
    (reference: ChFunctionMirror)."""

    inner: MotionFunction
    t_mirror: Array = 0.0

    def value(self, t):
        t = jnp.asarray(t)
        return self.inner.value(
            jnp.where(t > self.t_mirror, 2.0 * self.t_mirror - t, t))


@pytree_dataclass
class FDerivative(MotionFunction):
    """f(t) = d/dt inner(t), exact via autodiff
    (reference: ChFunctionDerivative)."""

    inner: MotionFunction

    def value(self, t):
        return self.inner.deriv(t)


@pytree_dataclass
class FIntegral(MotionFunction):
    """f(t) = c0 + ∫₀ᵗ inner(s) ds by fixed-resolution trapezoid on [0, tmax]
    (reference: ChFunctionIntegral; the reference also pre-tabulates)."""

    inner: MotionFunction
    tmax: Array = 1.0
    c0: Array = 0.0
    samples: int = static_field(default=256)

    def value(self, t):
        ts = jnp.linspace(0.0, 1.0, self.samples) * self.tmax
        ys = jax.vmap(self.inner.value)(ts)
        cum = jnp.concatenate([
            jnp.zeros((1,), ys.dtype),
            jnp.cumsum(0.5 * (ys[1:] + ys[:-1]) * jnp.diff(ts))])
        return self.c0 + jnp.interp(t, ts, cum)


@pytree_dataclass
class FRepeat(MotionFunction):
    """Periodic repetition of an inner function over window width ``width``."""

    inner: MotionFunction
    width: Array

    def value(self, t):
        return self.inner.value(jnp.mod(t, self.width))


@pytree_dataclass
class FSequence(MotionFunction):
    """Sum of scaled functions: f = Σ w_k f_k (reference: ChFunctionOperator add)."""

    fns: tuple = ()
    weights: Array = 1.0

    def value(self, t):
        w = jnp.broadcast_to(jnp.asarray(self.weights), (len(self.fns),))
        total = 0.0
        for k, f in enumerate(self.fns):
            total = total + w[k] * f.value(t)
        return total
