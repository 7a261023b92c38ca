"""TDPF (Cummins-equation linear hydrodynamics) validation.

Oracles: damped-oscillator free decay, a one-state rational radiation kernel
vs its exact state-space ODE, regular-wave steady-state RAO, JONSWAP sea
variance, and the Airy dispersion relation — the physics HydroChrono (wrapped
by the reference's chrono_fsi/tdpf) implements.
"""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.fsi.tdpf import (
    HydroData, RegularWaveParams, TDPFState,
    make_tdpf_state, make_tdpf_advance_fn, make_tdpf_step,
    jonswap_components, jonswap_spectrum, wave_elevation, wave_velocity,
    buoy_hydrostatics, critical_damping_kernel, _wavenumber, GRAV,
)


def _heave_hydro(m=1000.0, a33=300.0, k33=5000.0, T=64, dt=0.01,
                 B0=0.0, lam=2.0, cvis=0.0):
    M = jnp.diag(jnp.asarray([m] * 3 + [100.0] * 3))
    Ainf = jnp.diag(jnp.asarray([0.0, 0.0, a33, 0.0, 0.0, 0.0]))
    Khs = jnp.zeros((6, 6)).at[2, 2].set(k33)
    Kr = jnp.zeros((T, 6, 6))
    if B0 > 0:
        Kr = Kr.at[:, 2, 2].set(critical_damping_kernel(T, dt, B0, lam))
    Cvis = (jnp.zeros((6, 6)).at[2, 2].set(cvis)) if cvis > 0 else None
    return HydroData(M=M, Ainf=Ainf, Khs=Khs, Kr=Kr, Cvis=Cvis)


def test_free_decay_frequency():
    """Heave free decay: ω = √(K/(M+A∞)), exponential envelope c/2(M+A∞)."""
    m, a33, k33, c = 1000.0, 300.0, 5000.0, 80.0
    dt = 5e-3
    hydro = _heave_hydro(m=m, a33=a33, k33=k33, dt=dt, cvis=c)
    adv = make_tdpf_advance_fn(hydro, dt)
    state = make_tdpf_state(hydro, q0=jnp.zeros(6).at[2].set(0.1))
    zs = []
    for _ in range(60):
        state = adv(state, 20)
        zs.append(float(state.q[2]))
    zs = np.asarray(zs)                       # sampled every 0.1 s, 6 s total
    meff = m + a33
    w_ref = np.sqrt(k33 / meff)
    sig_ref = c / (2 * meff)
    # zero crossings → period
    sgn = np.sign(zs)
    crossings = np.where(np.diff(sgn) != 0)[0]
    period = 2 * np.mean(np.diff(crossings)) * 0.1
    np.testing.assert_allclose(2 * np.pi / period, w_ref, rtol=0.05)
    # envelope decay between first two positive peaks
    # log-decrement from extrema magnitudes
    ext = np.abs(zs[1:-1][(np.diff(zs[:-1]) > 0) != (np.diff(zs[1:]) > 0)])
    ratio = ext[2] / ext[0]                    # one full period apart
    sig = -np.log(ratio) / period
    np.testing.assert_allclose(sig, sig_ref, rtol=0.15)


def test_radiation_convolution_vs_state_space():
    """Exponential kernel K_r = B0 λ e^{−λt} equals the exact auxiliary ODE
    u̇ = −λu + B0 λ v with radiation force u — integrate both, compare."""
    m, a33, k33, B0, lam = 500.0, 100.0, 3000.0, 400.0, 3.0
    dt = 2e-3
    T = 512                                    # covers ~3/λ
    hydro = _heave_hydro(m=m, a33=a33, k33=k33, T=T, dt=dt, B0=B0, lam=lam)
    step = make_tdpf_step(hydro, dt)
    import jax

    @jax.jit
    def run(state):
        def body(s, _):
            return step(s), None
        return jax.lax.scan(body, state, None, length=2000)[0]

    state = make_tdpf_state(hydro, q0=jnp.zeros(6).at[2].set(0.05))
    state = run(state)                         # 4 s
    z_conv = float(state.q[2])

    # reference: same semi-implicit scheme on (z, v, u)
    z, v, u = 0.05, 0.0, 0.0
    meff = m + a33
    for _ in range(2000):
        a = (-k33 * z - u) / meff
        v = v + dt * a
        z = z + dt * v
        # trapezoid-consistent aux update: u(t) = ∫K(τ)v(t−τ)dτ
        u = u + dt * (-lam * u + B0 * lam * v)
    np.testing.assert_allclose(z_conv, z, atol=2e-3)
    assert abs(z_conv) < 0.05                  # radiation damps the motion


def test_regular_wave_steady_state_rao():
    """Steady-state heave amplitude = |X| a / |K − (M+A∞)ω² − iωB(ω)| with
    B(ω) = B0 λ²/(λ²+ω²) for the exponential kernel."""
    m, a33, k33, B0, lam = 500.0, 100.0, 3000.0, 300.0, 3.0
    dt = 2e-3
    T = 512
    w = 2.0
    amp = 0.5
    X3 = 800.0                                 # N/m excitation RAO (real)
    hydro = _heave_hydro(m=m, a33=a33, k33=k33, T=T, dt=dt, B0=B0, lam=lam)
    waves = RegularWaveParams(
        amplitude=jnp.asarray(amp), omega=jnp.asarray(w),
        Xre=jnp.zeros(6).at[2].set(X3), Xim=jnp.zeros(6))
    adv = make_tdpf_advance_fn(hydro, dt, waves=waves)
    state = make_tdpf_state(hydro)
    state = adv(state, 8000)                   # 16 s ≫ decay time
    zs = []
    for _ in range(300):
        state = adv(state, 10)
        zs.append(float(state.q[2]))
    z_amp = 0.5 * (max(zs) - min(zs))
    meff = m + a33
    # full radiation impedance of the exponential kernel: Z(iω) = B0 λ/(λ+iω)
    # (Re = damping, Im = frequency-dependent added-mass correction)
    Z = B0 * lam / (lam + 1j * w)
    z_ref = X3 * amp / abs(k33 - meff * w**2 + 1j * w * Z)
    np.testing.assert_allclose(z_amp, z_ref, rtol=0.05)


def test_dispersion_relation():
    """_wavenumber solves ω² = g k tanh(k h) in finite depth, ω²/g deep."""
    w = jnp.asarray(1.2)
    k_deep = float(_wavenumber(w, jnp.inf))
    np.testing.assert_allclose(k_deep, 1.44 / GRAV, rtol=1e-6)
    h = jnp.asarray(2.0)
    k_fd = float(_wavenumber(w, h))
    np.testing.assert_allclose(GRAV * k_fd * np.tanh(k_fd * 2.0), 1.44,
                               rtol=1e-4)


def test_wave_kinematics_consistency():
    """∂η/∂t equals vertical velocity at the surface (deep-water Airy)."""
    waves = RegularWaveParams(amplitude=jnp.asarray(0.3),
                              omega=jnp.asarray(1.5))
    xy = jnp.asarray([2.0, 0.0])
    t = 1.7
    eps = 1e-3
    deta = (float(wave_elevation(waves, xy, t + eps))
            - float(wave_elevation(waves, xy, t - eps))) / (2 * eps)
    wz = float(wave_velocity(waves, xy, 0.0, t)[2])
    np.testing.assert_allclose(wz, deta, atol=5e-3)


def test_jonswap_sea_variance():
    """Elevation variance of the realization ≈ ∫S dω ≈ Hs²/16."""
    Hs, Tp = 2.0, 8.0
    waves = jonswap_components(Hs, Tp, n=200, seed=3)
    ts = np.linspace(0.0, 600.0, 4000)
    eta = np.asarray([float(wave_elevation(waves, jnp.zeros(2), t))
                      for t in ts[:0]])        # placeholder; vectorized below
    import jax
    eta = np.asarray(jax.vmap(
        lambda t: wave_elevation(waves, jnp.zeros(2), t))(jnp.asarray(ts)))
    var = eta.var()
    np.testing.assert_allclose(var, Hs**2 / 16.0, rtol=0.2)
    # spectrum sanity: peak near ω_p
    w = np.linspace(0.3, 3.0, 500)
    S = np.asarray(jonswap_spectrum(w, Hs, Tp))
    assert abs(w[np.argmax(S)] - 2 * np.pi / Tp) < 0.05
