"""1-D drivetrain (ChShaft-family) elements: gears, planetary, clutch,
torsion spring, shaft↔body coupling.

Analytic oracles per element (the reference tests these through demo
assertions; utest-style analytic checks used here)."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.system import (
    SolverSettings, step_euler_implicit_linearized, simulate,
)
from chrono_tpu.physics.shafts import shaft_angle

SET = SolverSettings(solver="direct")


def _run(model, state, h, n, settings=SET):
    t = 0.0
    for _ in range(n):
        state, _ = step_euler_implicit_linearized(model, state, t, h,
                                                  settings)
        t += h
    return state


def test_gear_effective_inertia():
    """τ on shaft1 geared (ω1 = 2 ω2) to shaft2: ω̇1 = τ / (J1 + J2/4)."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    s1 = bld.add_shaft(inertia=1.0)
    s2 = bld.add_shaft(inertia=2.0)
    bld.add_shaft_gear(s1, s2, ratio=2.0)
    bld.add_shaft_torque(s1, s2, 0.0)   # placeholder pair (exercise path)
    model, state = bld.finalize()

    h, n = 1e-3, 200
    tau = 1.0
    t = 0.0
    for _ in range(n):
        tau_ext = jnp.zeros((model.n_bodies, 3)).at[s1, 2].set(tau)
        state, _ = step_euler_implicit_linearized(
            model, state, t, h, SET, tau_ext=tau_ext)
        t += h
    w1 = float(state.w[s1, 2])
    w2 = float(state.w[s2, 2])
    J_eff = 1.0 + 2.0 / 4.0
    np.testing.assert_allclose(w1, tau * n * h / J_eff, rtol=1e-4)
    np.testing.assert_allclose(w1, 2.0 * w2, rtol=1e-5)


def test_planetary_willis_equation():
    """(1+ψ)ω_c − ω_s − ψω_r = 0 holds under arbitrary torques."""
    psi = 2.5
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    c = bld.add_shaft(inertia=1.0)
    s = bld.add_shaft(inertia=0.5)
    r = bld.add_shaft(inertia=2.0)
    bld.add_shaft_planetary(c, s, r, ratio=psi)
    model, state = bld.finalize()

    t, h = 0.0, 1e-3
    rng = np.random.default_rng(0)
    for k in range(100):
        tau_ext = jnp.zeros((model.n_bodies, 3))
        tau_ext = tau_ext.at[c, 2].set(float(rng.normal()))
        tau_ext = tau_ext.at[s, 2].set(float(rng.normal()))
        state, _ = step_euler_implicit_linearized(
            model, state, t, h, SET, tau_ext=tau_ext)
        t += h
    wc, ws, wr = (float(state.w[i, 2]) for i in (c, s, r))
    assert abs((1 + psi) * wc - ws - psi * wr) < 1e-4 * max(
        1.0, abs(wc), abs(ws), abs(wr))
    assert abs(wc) + abs(ws) + abs(wr) > 0.01   # actually moving


def test_clutch_locks_to_momentum_conservation():
    """Engaged clutch drags two shafts to a common speed preserving J·ω."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    s1 = bld.add_shaft(inertia=1.0, speed=10.0)
    s2 = bld.add_shaft(inertia=3.0, speed=0.0)
    bld.add_shaft_clutch(s1, s2, torque_max=50.0, c_slip=20.0)
    model, state = bld.finalize()
    state = _run(model, state, 1e-3, 3000)
    w1, w2 = float(state.w[s1, 2]), float(state.w[s2, 2])
    w_common = (1.0 * 10.0 + 3.0 * 0.0) / 4.0
    np.testing.assert_allclose(w1, w_common, rtol=1e-2)
    np.testing.assert_allclose(w2, w_common, rtol=1e-2)


def test_torsion_spring_frequency():
    """Two shafts on a torsion spring oscillate at ω² = k (1/J1 + 1/J2)."""
    k = 50.0
    J1, J2 = 1.0, 2.0
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    s1 = bld.add_shaft(inertia=J1, speed=1.0)
    s2 = bld.add_shaft(inertia=J2, speed=-0.5)   # zero total momentum
    bld.add_shaft_torsion_spring(s1, s2, k=k)
    model, state = bld.finalize()

    h = 2e-4
    n = 2000
    rel = []
    t = 0.0
    for _ in range(n):
        state, _ = step_euler_implicit_linearized(model, state, t, h, SET)
        t += h
        rel.append(float(state.w[s1, 2]) - float(state.w[s2, 2]))
    rel = np.asarray(rel)
    # Δω starts at its extremum (cosine), so the first zero crossing is at
    # a quarter period
    first = np.where(np.diff(np.sign(rel)))[0][0]
    period = 4.0 * first * h
    w_ref = np.sqrt(k * (1 / J1 + 1 / J2))
    np.testing.assert_allclose(2 * np.pi / period, w_ref, rtol=2e-2)


def test_shaft_body_coupling_and_windup():
    """Shaft locked to a spinning flywheel body; driveline windup: a step
    torque through a torsion spring winds up, oscillates, and transmits the
    mean torque (the reference's shafts-based driveline behavior)."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    flywheel = bld.add_body(mass=1.0, inertia=(0.5, 0.5, 1.0))
    s_engine = bld.add_shaft(inertia=0.2)
    s_out = bld.add_shaft(inertia=0.2)
    bld.add_shaft_torsion_spring(s_engine, s_out, k=200.0, c=2.0)
    bld.add_shaft_body(s_out, flywheel, axis_local=(0, 0, 1))
    model, state = bld.finalize()

    h, n = 5e-4, 3000
    tau = 5.0
    t = 0.0
    for _ in range(n):
        tau_ext = jnp.zeros((model.n_bodies, 3)).at[s_engine, 2].set(tau)
        state, _ = step_euler_implicit_linearized(
            model, state, t, h, SET, tau_ext=tau_ext)
        t += h
    w_shaft = float(state.w[s_out, 2])
    w_body = float(state.w[flywheel, 2])
    np.testing.assert_allclose(w_shaft, w_body, rtol=1e-4)
    # all inertias spin up together: ω = τ t / (J_total)
    J_total = 0.2 + 0.2 + 1.0
    np.testing.assert_allclose(w_body, tau * n * h / J_total, rtol=5e-2)
    # spring wound up by the transmitted torque: Δθ ≈ τ_load / k where
    # τ_load = torque accelerating (s_out + flywheel)
    dth = float(shaft_angle(state.q[s_out]) - shaft_angle(state.q[s_engine]))
    tau_load = tau * (1.2 / J_total)
    np.testing.assert_allclose(-dth * 200.0, tau_load, rtol=0.1)
