"""Math-foundation unit tests (mirrors reference unit_tests/core)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chrono_tpu.core import quaternion as Q
from chrono_tpu.core.frame import Frame, skew
from chrono_tpu.core import functions as F

RTOL = 2e-5
ATOL = 2e-5


def rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    return np.asarray(Q.qnormalize(jnp.asarray(q)))


class TestQuaternion:
    def test_identity(self):
        q = Q.qidentity((3,))
        v = jnp.asarray([[1.0, 2.0, 3.0]] * 3)
        np.testing.assert_allclose(Q.qrotate(q, v), v, rtol=RTOL)

    def test_mul_associative(self):
        rng = np.random.default_rng(0)
        a, b, c = (jnp.asarray(rand_quat(rng)) for _ in range(3))
        np.testing.assert_allclose(
            Q.qmul(Q.qmul(a, b), c), Q.qmul(a, Q.qmul(b, c)), rtol=RTOL, atol=ATOL
        )

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rand_quat(rng, (5,)))
        v = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        R = Q.q_to_matrix(q)
        np.testing.assert_allclose(
            Q.qrotate(q, v), jnp.einsum("nij,nj->ni", R, v), rtol=RTOL, atol=ATOL
        )

    def test_conj_inverse(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(rand_quat(rng, (4,)))
        v = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        np.testing.assert_allclose(
            Q.qrotate_inv(q, Q.qrotate(q, v)), v, rtol=RTOL, atol=ATOL
        )

    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rand_quat(rng, (8,)))
        q2 = Q.q_from_matrix(Q.q_to_matrix(q))
        # q and -q are the same rotation
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, rtol=1e-3, atol=1e-5)

    def test_axis_angle(self):
        axis = jnp.asarray([0.0, 0.0, 1.0])
        q = Q.q_from_axis_angle(axis, jnp.pi / 2)
        v = Q.qrotate(q, jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(4)
        w = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
        np.testing.assert_allclose(Q.qlog2(Q.qexp_half(w)), w, rtol=1e-4, atol=1e-5)

    def test_exp_small_angle(self):
        w = jnp.asarray([[1e-8, 0.0, 0.0]])
        q = Q.qexp_half(w)
        assert np.isfinite(np.asarray(q)).all()
        np.testing.assert_allclose(np.asarray(q[0, 0]), 1.0, atol=1e-6)

    def test_integrate_const_omega(self):
        # spinning about z at w=pi rad/s for 1s in small steps = 180 deg turn
        q = Q.qidentity()
        w = jnp.asarray([0.0, 0.0, np.pi])
        h = 1e-3
        for _ in range(1000):
            q = Q.integrate_quat(q, w, h)
        v = Q.qrotate(q, jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(v, [-1.0, 0.0, 0.0], atol=1e-3)

    def test_euler_xyz(self):
        q = Q.q_from_euler_xyz(jnp.asarray([0.0, 0.0, jnp.pi / 2]))
        v = Q.qrotate(q, jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


class TestFrame:
    def test_compose_vs_sequential(self):
        rng = np.random.default_rng(5)
        fa = Frame(pos=jnp.asarray(rng.normal(size=3).astype(np.float32)),
                   rot=jnp.asarray(rand_quat(rng)))
        fb = Frame(pos=jnp.asarray(rng.normal(size=3).astype(np.float32)),
                   rot=jnp.asarray(rand_quat(rng)))
        p = jnp.asarray(rng.normal(size=3).astype(np.float32))
        np.testing.assert_allclose(
            fa.compose(fb).transform_point(p),
            fa.transform_point(fb.transform_point(p)),
            rtol=RTOL, atol=ATOL,
        )

    def test_inverse(self):
        rng = np.random.default_rng(6)
        f = Frame(pos=jnp.asarray(rng.normal(size=3).astype(np.float32)),
                  rot=jnp.asarray(rand_quat(rng)))
        p = jnp.asarray(rng.normal(size=3).astype(np.float32))
        np.testing.assert_allclose(
            f.inverse().transform_point(f.transform_point(p)), p, rtol=RTOL, atol=ATOL
        )
        np.testing.assert_allclose(
            f.inv_transform_point(f.transform_point(p)), p, rtol=RTOL, atol=ATOL
        )

    def test_skew(self):
        rng = np.random.default_rng(7)
        a = jnp.asarray(rng.normal(size=3).astype(np.float32))
        b = jnp.asarray(rng.normal(size=3).astype(np.float32))
        np.testing.assert_allclose(skew(a) @ b, jnp.cross(a, b), rtol=RTOL, atol=ATOL)


class TestFunctions:
    def test_const(self):
        f = F.FConst(c=jnp.asarray(3.0))
        assert float(f.value(5.0)) == 3.0
        assert float(f.deriv(5.0)) == 0.0

    def test_ramp(self):
        f = F.FRamp(y0=jnp.asarray(1.0), slope=jnp.asarray(2.0))
        assert float(f.value(2.0)) == 5.0
        assert float(f.deriv(2.0)) == 2.0

    def test_sine_deriv(self):
        f = F.FSine(amp=jnp.asarray(2.0), freq=jnp.asarray(0.5), phase=jnp.asarray(0.1))
        t = 0.37
        num = (f.value(t + 1e-4) - f.value(t - 1e-4)) / 2e-4
        np.testing.assert_allclose(float(f.deriv(t)), float(num), rtol=1e-3)

    def test_interp(self):
        f = F.FInterp(ts=jnp.asarray([0.0, 1.0, 2.0]), ys=jnp.asarray([0.0, 2.0, 0.0]))
        np.testing.assert_allclose(float(f.value(0.5)), 1.0)
        np.testing.assert_allclose(float(f.deriv(0.5)), 2.0)
        np.testing.assert_allclose(float(f.deriv(1.5)), -2.0)

    def test_const_acc_reaches_end(self):
        f = F.FConstAcc(end=jnp.asarray(2.0), duration=jnp.asarray(4.0))
        np.testing.assert_allclose(float(f.value(4.0)), 2.0, rtol=1e-5)
        np.testing.assert_allclose(float(f.value(0.0)), 0.0, atol=1e-7)

    def test_repeat(self):
        f = F.FRepeat(inner=F.FRamp(y0=jnp.asarray(0.0), slope=jnp.asarray(1.0)),
                      width=jnp.asarray(1.0))
        np.testing.assert_allclose(float(f.value(2.25)), 0.25, rtol=1e-5)
