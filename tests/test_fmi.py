"""FMI 2.0 round trip: export an LTI block as a standard-layout FMU
(C source compiled with g++), re-import it through the ctypes fmi2 API,
and run it in model-exchange and co-simulation modes
(reference: chrono_fmi/ChExternalFmu.h + fmi2 export tools)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.io.fmi import Fmu, export_fmu_lti, make_fmu_ode

# damped oscillator: ẍ = -k x - c ẋ + u  →  states (x, v)
K, CDAMP = 4.0, 0.4
A = [[0.0, 1.0], [-K, -CDAMP]]
B = [[0.0], [1.0]]
C = [[1.0, 0.0]]


@pytest.fixture(scope="module")
def fmu_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fmu") / "osc.fmu")
    export_fmu_lti(p, A, B, C, x0=[1.0, 0.0], model_name="osc")
    return p


def _analytic(t):
    """Underdamped free response from x(0)=1, v(0)=0."""
    wn = np.sqrt(K)
    zeta = CDAMP / (2 * wn)
    wd = wn * np.sqrt(1 - zeta**2)
    return np.exp(-zeta * wn * t) * (np.cos(wd * t)
                                     + zeta * wn / wd * np.sin(wd * t))


def test_fmu_layout_and_metadata(fmu_path):
    fmu = Fmu(fmu_path, mode="model_exchange")
    assert fmu.model_name == "osc"
    assert fmu.states == ["x0", "x1"]
    assert fmu.inputs == ["u0"]
    assert fmu.outputs == ["y0"]
    fmu.setup(0.0)
    np.testing.assert_allclose(fmu.get_states(), [1.0, 0.0])
    dx = fmu.get_derivatives()
    np.testing.assert_allclose(dx, [0.0, -K])
    fmu.terminate()


def test_model_exchange_rk4_matches_analytic(fmu_path):
    """Integrate the imported FMU's derivative with host RK4 → analytic."""
    fmu = Fmu(fmu_path, mode="model_exchange")
    fmu.setup(0.0)
    x = np.array([1.0, 0.0])
    h, T = 1e-3, 2.0
    t = 0.0
    for _ in range(int(T / h)):
        k1 = fmu.derivative(t, x)
        k2 = fmu.derivative(t + h / 2, x + h / 2 * k1)
        k3 = fmu.derivative(t + h / 2, x + h / 2 * k2)
        k4 = fmu.derivative(t + h, x + h * k3)
        x = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        t += h
    np.testing.assert_allclose(x[0], _analytic(T), atol=1e-5)
    fmu.terminate()


def test_cosimulation_dostep(fmu_path):
    """fmi2DoStep (internal RK4) reproduces the analytic response and
    responds to a held input (forced equilibrium x → u/k)."""
    fmu = Fmu(fmu_path, mode="co_simulation")
    fmu.setup(0.0)
    t, h = 0.0, 0.01
    for _ in range(200):
        fmu.do_step(t, h)
        t += h
    np.testing.assert_allclose(fmu.get_real(["x0"])[0], _analytic(2.0),
                               atol=1e-4)
    # hold u = k → steady state x = 1 (long run damps transients)
    fmu.set_real(["u0"], [K])
    for _ in range(3000):
        fmu.do_step(t, h)
        t += h
    np.testing.assert_allclose(fmu.get_real(["x0"])[0], 1.0, atol=5e-3)
    fmu.terminate()


def test_fmu_inside_jitted_step(fmu_path):
    """make_fmu_ode: the FMU derivative enters a jitted integrator through
    pure_callback (the ChExternalFmu-in-ChSystem role)."""
    fmu = Fmu(fmu_path, mode="model_exchange")
    fmu.setup(0.0)
    f = make_fmu_ode(fmu)

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def rk4_scan(x0, h, n):
        def body(carry, i):
            x, t = carry
            u = jnp.zeros((1,), jnp.float32)
            k1 = f(t, x, u)
            k2 = f(t + h / 2, x + h / 2 * k1, u)
            k3 = f(t + h / 2, x + h / 2 * k2, u)
            k4 = f(t + h, x + h * k3, u)
            return (x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4), t + h), None

        (x, _), _ = jax.lax.scan(body, (x0, 0.0), None, length=n)
        return x

    x = rk4_scan(jnp.asarray([1.0, 0.0], jnp.float32), 0.002, 1000)
    np.testing.assert_allclose(float(x[0]), _analytic(2.0), atol=1e-3)
    fmu.terminate()


# ---------------------------------------------------------------------------
# FMI 3.0 (fmi3 C API + Float64 schema — chrono_fmi/fmi3 role)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fmu3_path(tmp_path_factory):
    from chrono_tpu.io.fmi import export_fmu_lti3
    p = tmp_path_factory.mktemp("fmu3") / "osc3.fmu"
    # damped oscillator xdd = -k x - c xd with input force
    k, c = 25.0, 0.4
    A = [[0.0, 1.0], [-k, -c]]
    B = [[0.0], [1.0]]
    export_fmu_lti3(str(p), A, B, x0=[0.5, 0.0], model_name="osc3")
    return str(p)


def test_fmi3_layout_and_metadata(fmu3_path):
    from chrono_tpu.io.fmi import Fmu
    fmu = Fmu(fmu3_path, mode="model_exchange")
    assert fmu.v3 and fmu.fmi_version.startswith("3")
    assert fmu.states == ["x0", "x1"]
    assert fmu.inputs == ["u0"]
    fmu.terminate()


def test_fmi3_model_exchange_matches_analytic(fmu3_path):
    from chrono_tpu.io.fmi import Fmu
    fmu = Fmu(fmu3_path, mode="model_exchange")
    fmu.setup(t0=0.0)
    k, c = 25.0, 0.4
    h, T = 1e-3, 1.0
    x = np.array([0.5, 0.0])
    t = 0.0
    for _ in range(int(T / h)):           # RK4 on the FMU derivative
        k1 = fmu.derivative(t, x)
        k2 = fmu.derivative(t + h / 2, x + h / 2 * k1)
        k3 = fmu.derivative(t + h / 2, x + h / 2 * k2)
        k4 = fmu.derivative(t + h, x + h * k3)
        x = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        t += h
    wn = np.sqrt(k)
    zeta = c / (2 * wn)
    wd = wn * np.sqrt(1 - zeta**2)
    x_ref = 0.5 * np.exp(-zeta * wn * T) * (
        np.cos(wd * T) + zeta * wn / wd * np.sin(wd * T))
    np.testing.assert_allclose(x[0], x_ref, rtol=1e-3)
    fmu.terminate()


def test_fmi3_cosimulation_dostep(fmu3_path):
    from chrono_tpu.io.fmi import Fmu
    fmu = Fmu(fmu3_path, mode="co_simulation")
    fmu.setup(t0=0.0)
    t, h = 0.0, 0.01
    for _ in range(100):
        fmu.do_step(t, h)
        t += h
    x = fmu.get_real(["x0", "x1"])
    k, c = 25.0, 0.4
    wn = np.sqrt(k); zeta = c / (2 * wn); wd = wn * np.sqrt(1 - zeta**2)
    x_ref = 0.5 * np.exp(-zeta * wn * 1.0) * (
        np.cos(wd * 1.0) + zeta * wn / wd * np.sin(wd * 1.0))
    np.testing.assert_allclose(x[0], x_ref, rtol=5e-3)
    fmu.terminate()
