"""TDPF — time-domain potential flow (linear hydrodynamics, Cummins equation).

TPU-native counterpart of the reference's TDPF fluid system
(/root/reference/src/chrono_fsi/tdpf/ChFsiFluidSystemTDPF.h — a wrapper around
the third-party HydroChrono library: hydrostatic stiffness, infinite-frequency
added mass, radiation impulse-response convolution, regular/irregular Airy
waves).  Instead of per-body C++ objects with data-dependent convolution
loops, everything here is dense generalized-coordinate linear algebra over
n6 = 6·n_bodies DOFs:

    (M + A∞) q̈ + ∫₀ᵗ K_r(t−τ) q̇(τ) dτ + K_hs q = F_exc(t) + F_ext

* the radiation convolution is a fixed-length ring buffer of velocities
  contracted with the sampled impulse-response kernel — one einsum per step,
  MXU-friendly and exactly shaped for ``lax.scan``;
* (M + A∞)⁻¹ is constant and precomputed — the per-step solve is a matmul;
* waves are vectorized component sums (N-component irregular seas cost one
  broadcast, not a loop).

Hydro coefficients (A∞, K_r, excitation RAOs) come from any BEM code — the
reference reads HydroChrono HDF5; here they are plain arrays so any pipeline
can feed them (see ``tests/test_tdpf.py`` for analytic fixtures).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field

GRAV = 9.81


@pytree_dataclass
class HydroData:
    """Linear hydrodynamic model over n6 = 6·n_bodies generalized DOFs.

    ``Kr`` is the radiation impulse-response function sampled on the
    simulation step ``dt`` (T samples); multibody interaction terms live in
    the off-diagonal 6×6 blocks, as in HydroChrono's combined matrices.
    """

    M: Array       # (n6, n6) rigid generalized mass (about hydro ref points)
    Ainf: Array    # (n6, n6) infinite-frequency added mass
    Khs: Array     # (n6, n6) hydrostatic stiffness
    Kr: Array      # (T, n6, n6) radiation IRF samples K_r(k·dt)
    Cvis: Array = None   # (n6, n6) optional linear viscous damping


@pytree_dataclass
class RegularWaveParams:
    """Monochromatic Airy wave + per-DOF excitation RAO.

    Role of the reference's ``RegularWaveParams`` (AddWaves,
    ChFsiFluidSystemTDPF.h:63).  ``Xre/Xim``: complex excitation force per
    unit amplitude at this frequency, F(t) = Re[(Xre+iXim) a e^{-iωt}].
    """

    amplitude: Array          # () a [m]
    omega: Array              # () ω [rad/s]
    phase: Array = 0.0        # ()
    direction: Array = 0.0    # () heading [rad], 0 = +x
    depth: Array = jnp.inf    # () water depth (inf = deep water)
    Xre: Array = None         # (n6,)
    Xim: Array = None         # (n6,)


@pytree_dataclass
class IrregularWaveParams:
    """N-component irregular sea (spectrum realization).

    Per-component arrays; build from a spectrum with ``jonswap_components``.
    ``Xre/Xim``: (N, n6) excitation RAO interpolated to each component.
    """

    amplitude: Array   # (N,)
    omega: Array       # (N,)
    phase: Array       # (N,)
    direction: Array   # (N,)
    depth: Array = jnp.inf
    Xre: Array = None  # (N, n6)
    Xim: Array = None  # (N, n6)


def jonswap_spectrum(omega, Hs, Tp, gamma: float = 3.3):
    """JONSWAP variance density S(ω) [m²s] (standard form)."""
    omega = jnp.asarray(omega)
    wp = 2.0 * jnp.pi / Tp
    sigma = jnp.where(omega <= wp, 0.07, 0.09)
    r = jnp.exp(-((omega - wp) ** 2) / (2.0 * sigma**2 * wp**2))
    ab = jnp.exp(-1.25 * (wp / jnp.maximum(omega, 1e-9)) ** 4)
    S = (5.0 / 16.0) * Hs**2 * wp**4 / jnp.maximum(omega, 1e-9) ** 5 * ab \
        * gamma**r
    # normalization factor so ∫S dω ≈ Hs²/16 (Goda's approximation)
    A_gamma = 1.0 - 0.287 * np.log(gamma)
    return A_gamma * S


def jonswap_components(Hs, Tp, n: int, seed: int = 0,
                       w_min: float = 0.3, w_max: float = 4.0,
                       gamma: float = 3.3, direction: float = 0.0):
    """Sample N wave components from a JONSWAP spectrum (host-side).

    Equal-Δω binning, a_i = √(2 S(ω_i) Δω), uniform random phases — the same
    realization scheme HydroChrono's irregular waves use.
    """
    rng = np.random.default_rng(seed)
    w = np.linspace(w_min, w_max, n)
    dw = w[1] - w[0]
    S = np.asarray(jonswap_spectrum(w, Hs, Tp, gamma))
    return IrregularWaveParams(
        amplitude=jnp.asarray(np.sqrt(2.0 * S * dw), jnp.float32),
        omega=jnp.asarray(w, jnp.float32),
        phase=jnp.asarray(rng.uniform(0, 2 * np.pi, n), jnp.float32),
        direction=jnp.full((n,), direction, jnp.float32),
    )


def _wavenumber(omega, depth):
    """Airy dispersion ω² = g k tanh(kh); deep-water closed form, a few
    fixed-point iterations otherwise (branch-free)."""
    k0 = omega * omega / GRAV
    deep = jnp.isinf(depth)
    h = jnp.where(deep, 1.0, depth)

    def newton(_, k):
        kh = jnp.clip(k * h, 1e-6, 50.0)
        t = jnp.tanh(kh)
        fval = GRAV * k * t - omega * omega
        fp = GRAV * (t + kh * (1.0 - t * t))
        return jnp.maximum(k - fval / jnp.maximum(fp, 1e-9), 1e-8)

    # Guo (2002) initial guess, then Newton
    x = k0 * h
    kini = jnp.where(x > 1e-6, k0 / jnp.sqrt(jnp.tanh(jnp.sqrt(x))), k0)
    k_fd = lax.fori_loop(0, 10, newton, jnp.maximum(kini, 1e-8))
    return jnp.where(deep, k0, k_fd)


def wave_elevation(waves, xy, t):
    """η(x, y, t) for regular or irregular parameters (vectorized sum)."""
    a = jnp.atleast_1d(waves.amplitude)
    w = jnp.atleast_1d(waves.omega)
    ph = jnp.atleast_1d(waves.phase)
    th = jnp.atleast_1d(waves.direction)
    k = _wavenumber(w, waves.depth)
    kx = k * (xy[0] * jnp.cos(th) + xy[1] * jnp.sin(th))
    return jnp.sum(a * jnp.cos(kx - w * t + ph))


def wave_velocity(waves, xy, z, t):
    """Airy fluid velocity (u, v, w) at depth z ≤ 0 below the mean surface."""
    a = jnp.atleast_1d(waves.amplitude)
    w = jnp.atleast_1d(waves.omega)
    ph = jnp.atleast_1d(waves.phase)
    th = jnp.atleast_1d(waves.direction)
    k = _wavenumber(w, waves.depth)
    kx = k * (xy[0] * jnp.cos(th) + xy[1] * jnp.sin(th))
    arg = kx - w * t + ph
    decay = jnp.exp(jnp.minimum(k * z, 0.0))        # deep-water profile
    uh = a * w * decay * jnp.cos(arg)
    uz = a * w * decay * jnp.sin(arg)
    return jnp.stack([jnp.sum(uh * jnp.cos(th)),
                      jnp.sum(uh * jnp.sin(th)),
                      jnp.sum(uz)])


def excitation_force(waves, t):
    """F_exc(t) = Σ_i a_i Re[X_i e^{i(φ_i − ω_i t)}] over components."""
    a = jnp.atleast_1d(waves.amplitude)[:, None]
    w = jnp.atleast_1d(waves.omega)[:, None]
    ph = jnp.atleast_1d(waves.phase)[:, None]
    Xre = jnp.atleast_2d(waves.Xre)
    Xim = jnp.atleast_2d(waves.Xim)
    c = jnp.cos(ph - w * t)
    s = jnp.sin(ph - w * t)
    return jnp.sum(a * (Xre * c - Xim * s), axis=0)


@pytree_dataclass
class TDPFState:
    q: Array      # (n6,) displacement from hydrostatic equilibrium
    v: Array      # (n6,)
    hist: Array   # (T, n6) velocity history ring buffer (hist[0] = newest)
    time: Array


def make_tdpf_state(hydro: HydroData, q0=None, v0=None) -> TDPFState:
    n6 = hydro.M.shape[0]
    T = hydro.Kr.shape[0]
    return TDPFState(
        q=jnp.zeros((n6,)) if q0 is None else jnp.asarray(q0),
        v=jnp.zeros((n6,)) if v0 is None else jnp.asarray(v0),
        hist=jnp.zeros((T, n6)),
        time=jnp.asarray(0.0),
    )


def radiation_force(hydro: HydroData, hist: Array, dt) -> Array:
    """∫ K_r(τ) v(t−τ) dτ ≈ dt Σ_k Kr[k] · hist[k] (trapezoid end-weights)."""
    T = hydro.Kr.shape[0]
    wts = jnp.ones((T,)).at[0].set(0.5).at[-1].set(0.5)
    return dt * jnp.einsum("t,tij,tj->i", wts, hydro.Kr, hist)


def make_tdpf_step(hydro: HydroData, dt: float, waves=None):
    """One Cummins step ``step(state, f_ext) -> state`` (semi-implicit Euler).

    Velocity update uses the precomputed constant (M+A∞)⁻¹; position update
    uses the NEW velocity (symplectic for the stiffness part).
    """
    Minv = jnp.linalg.inv(hydro.M + hydro.Ainf)
    Cvis = hydro.Cvis if hydro.Cvis is not None else 0.0

    def step(state: TDPFState, f_ext=0.0) -> TDPFState:
        f_rad = radiation_force(hydro, state.hist, dt)
        f = -hydro.Khs @ state.q - f_rad - (
            Cvis @ state.v if hydro.Cvis is not None else 0.0)
        if waves is not None:
            f = f + excitation_force(waves, state.time)
        f = f + f_ext
        a = Minv @ f
        v = state.v + dt * a
        q = state.q + dt * v
        hist = jnp.roll(state.hist, 1, axis=0).at[0].set(v)
        return TDPFState(q=q, v=v, hist=hist, time=state.time + dt)

    return step


def make_tdpf_advance_fn(hydro: HydroData, dt: float, waves=None,
                         f_ext_fn=None):
    """Jitted multi-step advance; ``f_ext_fn(state) -> (n6,)`` optional."""
    step = make_tdpf_step(hydro, dt, waves)

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: TDPFState, n: int) -> TDPFState:
        def body(s, _):
            fe = f_ext_fn(s) if f_ext_fn is not None else 0.0
            return step(s, fe), None

        state, _ = lax.scan(body, state, None, length=n)
        return state

    return advance


# ---------------- analytic helpers for common hull fixtures ----------------

def buoy_hydrostatics(radius, rho: float = 1025.0):
    """6×6 hydrostatic stiffness of a floating sphere at half draft
    (heave only: K33 = ρ g A_wp = ρ g π r²)."""
    K = np.zeros((6, 6))
    K[2, 2] = rho * GRAV * np.pi * radius**2
    return jnp.asarray(K, jnp.float32)


def critical_damping_kernel(T: int, dt: float, B0: float, lam: float):
    """Exponential radiation kernel K_r(t) = B0 λ e^{−λt} (its frequency-
    domain damping is B(ω) = B0 λ²/(λ²+ω²) — a one-state rational fit)."""
    t = np.arange(T) * dt
    return jnp.asarray(B0 * lam * np.exp(-lam * t), jnp.float32)
