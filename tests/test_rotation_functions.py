"""SO(3) motion functions (reference ChFunctionRotation family)."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.core import quaternion as Q
from chrono_tpu.core.functions import FRamp, FSine, FConst
from chrono_tpu.core.rotation_functions import (
    RotConst, RotAxisAngle, RotSlerp, RotABC,
)


def test_axis_angle_constant_rate():
    """q(t) = exp(z·ωt): omega() returns exactly (0,0,ω)."""
    f = RotAxisAngle(axis=jnp.asarray([0.0, 0.0, 1.0]),
                     angle=FRamp(y0=jnp.asarray(0.0), slope=jnp.asarray(2.0)))
    q = np.asarray(f.value(0.5))
    np.testing.assert_allclose(q, [np.cos(0.5), 0, 0, np.sin(0.5)],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f.omega(0.3)), [0, 0, 2.0],
                               atol=1e-5)


def test_axis_angle_sine_omega_matches_derivative():
    f = RotAxisAngle(axis=jnp.asarray([1.0, 0.0, 0.0]),
                     angle=FSine(amp=jnp.asarray(0.5), freq=jnp.asarray(1.0)))
    w = float(f.omega(0.0)[0])
    np.testing.assert_allclose(w, 0.5 * 2 * np.pi, rtol=1e-5)


def test_slerp_midpoint_and_rate():
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    q1 = np.asarray(Q.qexp_half(jnp.asarray([0.0, 0.0, np.pi / 2])))
    f = RotSlerp(ts=jnp.asarray([0.0, 1.0]),
                 qs=jnp.stack([q0, jnp.asarray(q1)]))
    qm = np.asarray(f.value(0.5))
    exp = np.asarray(Q.qexp_half(jnp.asarray([0.0, 0.0, np.pi / 4])))
    np.testing.assert_allclose(np.abs(qm @ exp), 1.0, atol=1e-5)
    # uniform rate: ω_z = π/2 per unit time
    np.testing.assert_allclose(np.asarray(f.omega(0.25)),
                               [0, 0, np.pi / 2], atol=1e-4)
    # clamps outside the key range
    np.testing.assert_allclose(np.asarray(f.value(2.0)), q1, atol=1e-6)


def test_abc_euler_composition():
    f = RotABC(fa=FConst(jnp.asarray(0.3)), fb=FConst(jnp.asarray(0.0)),
               fc=FConst(jnp.asarray(0.0)))
    q = np.asarray(f.value(0.0))
    np.testing.assert_allclose(q, [np.cos(0.15), 0, 0, np.sin(0.15)],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f.omega(0.0)), 0.0, atol=1e-5)


def test_const():
    qa = np.asarray(Q.qexp_half(jnp.asarray([0.2, -0.1, 0.4])))
    f = RotConst(q=jnp.asarray(qa))
    np.testing.assert_allclose(np.asarray(f.value(3.0)), qa, atol=1e-7)
    np.testing.assert_allclose(np.asarray(f.omega(1.0)), 0.0, atol=1e-6)
