"""Extended motion-function library (reference: ChFunctionCycloidal,
ChFunctionPoly23/345, ChFunctionSineStep, ChFunctionBSpline, ChFunctionMirror,
ChFunctionDerivative, ChFunctionIntegral —
/root/reference/src/chrono/functions/)."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.core.functions import (
    FCycloidal, FPoly345, FPoly23, FSineStep, FBSpline, FMirror,
    FDerivative, FIntegral, FSine)


def test_cycloidal_boundary_conditions():
    f = FCycloidal(height=jnp.asarray(2.0), width=jnp.asarray(1.0))
    assert abs(float(f.value(0.0))) < 1e-7
    assert abs(float(f.value(1.0)) - 2.0) < 1e-6
    assert abs(float(f.deriv(0.0))) < 1e-5
    assert abs(float(f.deriv(1.0))) < 1e-4
    assert abs(float(f.deriv2(0.0))) < 1e-3   # zero accel at both ends


def test_poly_rises():
    g = FPoly345(height=jnp.asarray(1.0), width=jnp.asarray(2.0))
    assert abs(float(g.value(1.0)) - 0.5) < 1e-6
    assert abs(float(g.deriv(0.0))) < 1e-6
    assert abs(float(g.deriv2(2.0))) < 1e-3
    p = FPoly23(height=jnp.asarray(3.0), width=jnp.asarray(1.0))
    assert abs(float(p.value(0.5)) - 1.5) < 1e-6
    assert abs(float(p.deriv(1.0))) < 1e-5


def test_sine_step():
    h = FSineStep(t1=jnp.asarray(1.0), y1=jnp.asarray(0.0),
                  t2=jnp.asarray(2.0), y2=jnp.asarray(4.0))
    assert abs(float(h.value(1.5)) - 2.0) < 1e-6
    assert abs(float(h.value(0.0))) < 1e-7
    assert abs(float(h.value(3.0)) - 4.0) < 1e-6


def test_bspline_linear_precision():
    """Uniform cubic B-spline of collinear control points reproduces the
    line (shifted by one knot — the spline domain starts at span 0)."""
    bs = FBSpline(ctrl=jnp.asarray([0., 1., 2., 3., 4., 5.]), t0=0.0, dt=1.0)
    for t in [0.0, 0.5, 1.0, 2.3, 3.0]:
        assert abs(float(bs.value(t)) - (t + 1.0)) < 1e-5


def test_mirror_derivative_integral():
    m = FMirror(inner=FSine(amp=jnp.asarray(1.0), freq=jnp.asarray(0.25)),
                t_mirror=jnp.asarray(1.0))
    assert abs(float(m.value(1.4)) - float(m.value(0.6))) < 1e-6

    d = FDerivative(inner=FSine(amp=jnp.asarray(1.0), freq=jnp.asarray(1.0)))
    assert abs(float(d.value(0.0)) - 2 * np.pi) < 1e-4

    integ = FIntegral(inner=FSine(amp=jnp.asarray(1.0), freq=jnp.asarray(1.0)),
                      tmax=jnp.asarray(1.0), samples=1024)
    assert abs(float(integ.value(0.5)) - 1 / np.pi) < 1e-3
