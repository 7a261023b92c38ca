"""MBS-level HHT-α + Newton with step rejection.

Oracle: the reference's stiff-system contract (ChTimestepperHHT.cpp — stable
integration of stiff force elements at steps far beyond the explicit/DVI
stability bound, with position-level constraint satisfaction)."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.system import (
    SolverSettings, step_euler_implicit_linearized,
)
from chrono_tpu.physics.implicit import make_hht_mbs_step
from chrono_tpu.physics.joints import joint_violation


def _stiff_spring_system(k=1e7):
    """1 kg block hanging on a very stiff vertical TSDA (ω ≈ 3162 rad/s)."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    gnd = bld.add_ground()
    block = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.1), pos=(0, 0, -1.0))
    bld.add_tsda(gnd, block, (0, 0, 0), (0, 0, -1.0), k=k, c=200.0)
    return bld.finalize() + ((gnd, block),)


def test_hht_stable_10x_beyond_explicit():
    """h = 1e-3 is ~3x the stiff period — the semi-implicit DVI force
    handling blows up while HHT integrates to the correct static sag."""
    k = 1e7
    model, state0, _ = _stiff_spring_system(k)
    h = 1e-3

    # DVI/explicit-force path diverges at this step
    dvi = jax.jit(lambda s, t: step_euler_implicit_linearized(
        model, s, t, h, SolverSettings(solver="direct"))[0])
    st = state0
    t = 0.0
    for _ in range(50):
        st = dvi(st, t)
        t += h
    assert (not np.isfinite(np.asarray(st.x)).all()
            or abs(float(st.x[1, 2]) + 1.0) > 0.1), \
        "explicit path unexpectedly stable — test is not probing stiffness"

    # HHT at the same h: stable, converges to the static extension mg/k
    step = make_hht_mbs_step(model, alpha=-0.2, newton_iters=10, tol=1e-4)
    step = jax.jit(step)
    st = state0
    acc = jnp.zeros((model.n_bodies, 6))
    t = 0.0
    moved = 0.0
    for _ in range(300):
        out = step(st, acc, t, h)
        st, acc = out.state, out.acc
        t += float(out.h_used)
        moved = max(moved, abs(float(st.v[1, 2])))
    z = float(st.x[1, 2])
    sag = 9.81 / k
    assert moved > 1e-4, "block never moved — stepper inert"
    np.testing.assert_allclose(z, -1.0 - sag, atol=5e-5)
    assert abs(float(st.v[1, 2])) < 1e-3


def test_hht_pendulum_matches_dvi():
    """Smooth pendulum: HHT at 4x the DVI step reproduces the DVI trajectory
    (2nd order vs 1st order), and keeps C(x) at position-level zero."""
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    gnd = bld.add_ground()
    pend = bld.add_body(mass=1.0, inertia=(0.04, 0.1, 0.1), pos=(2, 0, 0))
    bld.add_joint("revolute", pend, gnd, world_pos=(0, 0, 0),
                  world_axis=(0, 1, 0))
    model, state0 = bld.finalize()

    h_dvi = 5e-4
    dvi = jax.jit(lambda s, t: step_euler_implicit_linearized(
        model, s, t, h_dvi, SolverSettings(solver="direct"))[0])
    st = state0
    t = 0.0
    for _ in range(1000):
        st = dvi(st, t)
        t += h_dvi
    ref = np.asarray(st.x[pend])

    step = jax.jit(make_hht_mbs_step(model, alpha=-0.1, newton_iters=8,
                                     tol=1e-4))
    st2 = state0
    acc = jnp.zeros((model.n_bodies, 6))
    t2 = 0.0
    for _ in range(250):
        out = step(st2, acc, t2, 4 * h_dvi)
        st2, acc = out.state, out.acc
        t2 += float(out.h_used)
    got = np.asarray(st2.x[pend])
    assert abs(t2 - t) < 1e-6   # fp32 h accumulation
    np.testing.assert_allclose(got, ref, atol=5e-3)
    # position-level constraint satisfaction (index-3 enforcement)
    for kind, data in model.joints.items():
        C = joint_violation(kind, data, st2.x, st2.q)
        assert float(jnp.abs(C).max()) < 1e-5


def test_step_rejection_reduces_h():
    """A hopeless tolerance forces rejection: h_used < h requested."""
    model, state0, _ = _stiff_spring_system(k=1e9)
    step = jax.jit(make_hht_mbs_step(model, newton_iters=2, tol=1e-12,
                                     max_halvings=3))
    out = step(state0, jnp.zeros((model.n_bodies, 6)), 0.0, 1e-2)
    assert float(out.h_used) < 1e-2


def test_newmark_family_energy_behavior():
    """On a LINEAR oscillator the trapezoidal rule (γ=1/2, β=1/4) is exactly
    energy-preserving while backward Euler (γ=1, β=1/2) damps the amplitude
    by 1/√(1+(ωh)²) per step — the textbook signature that the Newmark-family
    parameterization is wired correctly."""
    from chrono_tpu.physics.implicit import (
        make_trapezoidal_mbs_step, make_euler_implicit_mbs_step,
    )
    from chrono_tpu.physics.builder import SystemBuilder

    k, m, x0 = 100.0, 1.0, 0.1          # ω = 10 rad/s
    n, h = 150, 0.02                     # ωh = 0.2: BE damping is strong

    def run(make):
        bld = SystemBuilder()
        bld.set_gravity((0, 0, 0))
        g = bld.add_ground()
        b = bld.add_body(mass=m, pos=(1.0 + x0, 0, 0))
        bld.add_tsda(g, b, (0, 0, 0), (1.0 + x0, 0, 0), k=k, rest_length=1.0)
        model, st = bld.finalize()
        step = jax.jit(make(model, newton_iters=6, tol=1e-6))
        acc = jnp.zeros((model.n_bodies, 6))
        t = 0.0
        for _ in range(n):
            out = step(st, acc, t, h)
            st, acc = out.state, out.acc
            t += float(out.h_used)
        x = float(st.x[1, 0]) - 1.0
        v = float(st.v[1, 0])
        return 0.5 * m * v * v + 0.5 * k * x * x

    e0 = 0.5 * k * x0 * x0
    e_trap = run(make_trapezoidal_mbs_step)
    e_be = run(make_euler_implicit_mbs_step)
    # trapezoidal: conservative (fp32 + Newton tolerance noise only)
    np.testing.assert_allclose(e_trap, e0, rtol=0.03)
    # backward Euler member: strong algorithmic damping at ωh = 0.2
    assert e_be < 0.1 * e0, (e_be, e0)


def test_projected_euler_kills_drift():
    """EULER_IMPLICIT_PROJECTED role: pose projection keeps |C| at solver
    precision over a long horizon where the UNstabilized linearized stepper
    accumulates visible drift; trajectories agree to the step order."""
    from chrono_tpu.physics.implicit import make_euler_implicit_projected_step
    from chrono_tpu.physics.implicit import _constraint_C

    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    gnd = bld.add_ground()
    pend = bld.add_body(mass=1.0, inertia=(0.04, 0.1, 0.1), pos=(2, 0, 0))
    bld.add_joint("revolute", pend, gnd, world_pos=(0, 0, 0),
                  world_axis=(0, 1, 0))
    model, state0 = bld.finalize()

    h = 2e-3
    nobau = SolverSettings(solver="direct", stab_factor=0.0)
    raw = jax.jit(lambda s, t: step_euler_implicit_linearized(
        model, s, t, h, nobau)[0])
    proj = jax.jit(lambda s, t: make_euler_implicit_projected_step(
        model, n_proj=2)(s, t, h).state)

    st_r, st_p, t = state0, state0, 0.0
    for _ in range(1500):  # 3 s of swings
        st_r = raw(st_r, t)
        st_p = proj(st_p, t)
        t += h
    c_raw = float(jnp.abs(_constraint_C(model, st_r.x, st_r.q)).max())
    c_proj = float(jnp.abs(_constraint_C(model, st_p.x, st_p.q)).max())
    assert c_proj < 1e-5, c_proj
    assert c_proj < c_raw / 10, (c_proj, c_raw)
    # same physics (first-order steppers, same h): radii identical, angles close
    r_p = float(jnp.linalg.norm(st_p.x[pend]))
    np.testing.assert_allclose(r_p, 2.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_p.x[pend]),
                               np.asarray(st_r.x[pend]), atol=0.15)


def test_leapfrog_energy_conservation():
    """Leapfrog on a free elliptic oscillator: symplectic — energy bounded
    over many periods where explicit Euler grows it monotonically."""
    from chrono_tpu.physics.explicit import step_leapfrog, step_euler_explicit
    from chrono_tpu.physics.body import kinetic_energy

    bld = SystemBuilder()
    bld.set_gravity((0, 0, 0))
    gnd = bld.add_ground()
    blk = bld.add_body(mass=1.0, inertia=(0.1, 0.1, 0.1), pos=(1.2, 0, 0))
    bld.add_tsda(gnd, blk, (0, 0, 0), (1.2, 0, 0), k=100.0, c=0.0,
                 rest_length=1.0)
    model, state0 = bld.finalize()

    h = 5e-3

    def total_e(st):
        ke = float(kinetic_energy(model.props, st))
        stretch = float(jnp.linalg.norm(st.x[blk]) - 1.0)
        return ke + 0.5 * 100.0 * stretch**2

    e0 = total_e(state0)
    lf = jax.jit(lambda s, t: step_leapfrog(model, s, t, h))
    ee = jax.jit(lambda s, t: step_euler_explicit(model, s, t, h))
    st_l, st_e, t = state0, state0, 0.0
    for _ in range(4000):   # ~20 periods
        st_l = lf(st_l, t)
        st_e = ee(st_e, t)
        t += h
    drift_lf = abs(total_e(st_l) - e0) / max(e0, 1e-9)
    drift_ee = abs(total_e(st_e) - e0) / max(e0, 1e-9)
    assert drift_lf < 0.02, drift_lf
    assert drift_ee > 10 * drift_lf, (drift_ee, drift_lf)
