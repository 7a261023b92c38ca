"""SPH smoothing kernels (W and ∇W), batched and branch-free.

Kernel menu equivalent to the reference's
(/root/reference/src/chrono_fsi/sph/ChFsiDefinitionsSPH.h:59 — quadratic, cubic
spline, quintic spline, Wendland): each returns W(q)/∇W for q = |r|/h, zero
outside the compact support.  All broadcast over arbitrary batch axes; the
normalization constants are 3-D.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _q_r(r: Array, h, eps=1e-12):
    q = r / h
    return q


def cubic_spline_w(r: Array, h) -> Array:
    """Monaghan cubic spline, support radius 2h. σ = 1/(π h³)."""
    sigma = 1.0 / (jnp.pi * h**3)
    q = r / h
    w1 = 1.0 - 1.5 * q * q + 0.75 * q**3          # 0 ≤ q < 1
    w2 = 0.25 * (2.0 - q) ** 3                     # 1 ≤ q < 2
    return sigma * jnp.where(q < 1.0, w1, jnp.where(q < 2.0, w2, 0.0))


def cubic_spline_dwdr(r: Array, h) -> Array:
    """dW/dr for the cubic spline."""
    sigma = 1.0 / (jnp.pi * h**3)
    q = r / h
    d1 = -3.0 * q + 2.25 * q * q
    d2 = -0.75 * (2.0 - q) ** 2
    return sigma / h * jnp.where(q < 1.0, d1, jnp.where(q < 2.0, d2, 0.0))


def wendland_c2_w(r: Array, h) -> Array:
    """Wendland C2 quintic, support radius 2h. σ = 21/(16 π h³)."""
    sigma = 21.0 / (16.0 * jnp.pi * h**3)
    q = r / h
    inside = q < 2.0
    t = jnp.where(inside, 1.0 - 0.5 * q, 0.0)
    return sigma * t**4 * (2.0 * q + 1.0)


def wendland_c2_dwdr(r: Array, h) -> Array:
    sigma = 21.0 / (16.0 * jnp.pi * h**3)
    q = r / h
    inside = q < 2.0
    t = jnp.where(inside, 1.0 - 0.5 * q, 0.0)
    return sigma / h * (-5.0 * q) * t**3


def quintic_spline_w(r: Array, h) -> Array:
    """Quintic spline, support radius 3h. σ = 1/(120 π h³)."""
    sigma = 1.0 / (120.0 * jnp.pi * h**3)
    q = r / h
    t3 = jnp.maximum(3.0 - q, 0.0) ** 5
    t2 = jnp.maximum(2.0 - q, 0.0) ** 5
    t1 = jnp.maximum(1.0 - q, 0.0) ** 5
    return sigma * (t3 - 6.0 * t2 + 15.0 * t1)


def quintic_spline_dwdr(r: Array, h) -> Array:
    sigma = 1.0 / (120.0 * jnp.pi * h**3)
    q = r / h
    t3 = jnp.maximum(3.0 - q, 0.0) ** 4
    t2 = jnp.maximum(2.0 - q, 0.0) ** 4
    t1 = jnp.maximum(1.0 - q, 0.0) ** 4
    return sigma / h * (-5.0) * (t3 - 6.0 * t2 + 15.0 * t1)


KERNELS = {
    "cubic": (cubic_spline_w, cubic_spline_dwdr, 2.0),
    "wendland": (wendland_c2_w, wendland_c2_dwdr, 2.0),
    "quintic": (quintic_spline_w, quintic_spline_dwdr, 3.0),
}


def grad_w(dwdr_fn, d: Array, r: Array, h, eps: float = 1e-12) -> Array:
    """∇W_ij = (dW/dr) · d/|d| for separation d = x_i − x_j (points toward i)."""
    return (dwdr_fn(r, h) / jnp.maximum(r, eps))[..., None] * d
