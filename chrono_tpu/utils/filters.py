"""Signal filters and running statistics.

Counterpart of the reference's filter utilities
(/root/reference/src/chrono/utils/ChFilters.cpp: running average, Butterworth
low/high-pass, ISO 2631 weighting infrastructure): implemented as stateless
``lax.scan``-able transfer-function steps plus whole-signal helpers.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class Biquad:
    """Second-order IIR section (direct form II transposed), jit-safe."""

    b: jnp.ndarray  # (3,)
    a: jnp.ndarray  # (3,) a[0] == 1
    s: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.zeros(2))

    def step(self, x):
        y = self.b[0] * x + self.s[0]
        s0 = self.b[1] * x - self.a[1] * y + self.s[1]
        s1 = self.b[2] * x - self.a[2] * y
        return y, self.replace(s=jnp.stack([s0, s1]))

    def filter(self, xs):
        def body(f, x):
            y, f2 = f.step(x)
            return f2, y

        _, ys = jax.lax.scan(lambda f, x: body(f, x), self, xs)
        return ys


def butterworth_lowpass(cutoff_hz: float, fs_hz: float) -> Biquad:
    """2nd-order Butterworth low-pass (bilinear transform)."""
    w = np.tan(np.pi * cutoff_hz / fs_hz)
    k = 1.0 / (1.0 + np.sqrt(2.0) * w + w * w)
    b0 = w * w * k
    return Biquad(
        b=jnp.asarray([b0, 2 * b0, b0]),
        a=jnp.asarray([1.0, 2 * (w * w - 1) * k,
                       (1 - np.sqrt(2.0) * w + w * w) * k]),
    )


def butterworth_highpass(cutoff_hz: float, fs_hz: float) -> Biquad:
    w = np.tan(np.pi * cutoff_hz / fs_hz)
    k = 1.0 / (1.0 + np.sqrt(2.0) * w + w * w)
    return Biquad(
        b=jnp.asarray([k, -2 * k, k]),
        a=jnp.asarray([1.0, 2 * (w * w - 1) * k,
                       (1 - np.sqrt(2.0) * w + w * w) * k]),
    )


def running_average(xs, window: int):
    """Simple moving average (ChRunningAverage)."""
    kernel = jnp.ones((window,)) / window
    return jnp.convolve(xs, kernel, mode="valid")


@pytree_dataclass
class PID:
    """General PID controller (reference ChControllerPID)."""

    kp: jnp.ndarray
    ki: jnp.ndarray = 0.0
    kd: jnp.ndarray = 0.0
    integral: jnp.ndarray = 0.0
    prev: jnp.ndarray = 0.0

    def step(self, err, h):
        integral = self.integral + err * h
        deriv = (err - self.prev) / h
        out = self.kp * err + self.ki * integral + self.kd * deriv
        return out, self.replace(integral=integral, prev=err)
