"""Bond-based peridynamics: elastic continua with bond breakage (fracture).

TPU-native counterpart of the reference's chrono_peridynamics module
(/root/reference/src/chrono_peridynamics: ChMatterPeriBB — prototype
micro-elastic brittle (PMB) bond-based material on a ChProximityContainer).
Here the bond set is a fixed (N, K) neighbor table built ONCE from the
reference configuration (bonds are material, not spatial), per-bond damage is
a persistent mask, and the whole step is the usual masked gather-reduce:

    stretch  s_ij = (|y_j − y_i| − |x_j − x_i|) / |x_j − x_i|
    force    f_ij = c · s_ij · V_j · (y_j − y_i)/|y_j − y_i|   while intact
    breakage s_ij > s0  (permanent, ChMatterPeriBB's brittle bond failure)

with the standard PMB micro-modulus c = 18 K / (π δ⁴), K = E / 3(1 − 2ν),
ν = 1/4 (the bond-based fixed Poisson ratio).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.neighbors import build_neighbor_list


@pytree_dataclass
class PeriParams:
    youngs: Array = 1e7
    density: Array = 1000.0
    s0: Array = 0.05          # critical bond stretch (fracture threshold)
    horizon: Array = 0.0      # δ (default 3.015·spacing set by make)
    volume: Array = 0.0       # per-point volume (spacing³)
    dt: Array = 1e-5
    damping: Array = 1e3      # mass-proportional viscous damping [1/s]
    gravity: Array = None

    @property
    def micro_modulus(self):
        K = self.youngs / 1.5          # ν = 1/4 (bond-based)
        return 18.0 * K / (jnp.pi * self.horizon ** 4)


@pytree_dataclass
class PeriState:
    pos0: Array      # (N,3) reference configuration
    pos: Array
    vel: Array
    fixed: Array     # (N,) bool — clamped points
    bond_idx: Array  # (N,K) int32 (−1 none)
    bond_ok: Array   # (N,K) bool — intact bonds
    ref_len: Array   # (N,K) |ξ|
    bond_scale: Array  # (N,K) surface-correction factor on the micro-modulus
    time: Array

    @property
    def damage(self) -> Array:
        """Per-point damage = broken-bond fraction (ChMatterPeri damage)."""
        had = self.ref_len > 0
        n_had = jnp.maximum(jnp.sum(had, axis=1), 1)
        return 1.0 - jnp.sum(self.bond_ok & had, axis=1) / n_had


def make_peridynamics(points, spacing, youngs=1e7, density=1000.0, s0=0.05,
                      dt=None, horizon_ratio=3.015, fixed_mask=None,
                      gravity=(0.0, 0.0, 0.0), max_bonds=144,
                      damping=1e3):
    """Build (PeriParams, PeriState) from lattice points (spacing apart)."""
    pts = np.asarray(points, np.float32)
    n = len(pts)
    delta = horizon_ratio * spacing
    lo = pts.min(0) - 2 * spacing
    hi = pts.max(0) + 2 * spacing
    dims = tuple(int(np.ceil((hi[i] - lo[i]) / delta)) + 1 for i in range(3))
    grid = GridSpec(origin=tuple(lo), cell_size=float(delta), dims=dims)
    nbr = build_neighbor_list(grid, jnp.asarray(pts), delta, 128, max_bonds)
    if int(nbr.overflow) > 0:
        raise ValueError("bond capacity overflow; raise max_bonds")

    j = np.asarray(jnp.maximum(nbr.idx, 0))
    valid = np.asarray(nbr.valid)
    d = pts[j] - pts[:, None, :]
    ref_len = np.sqrt((d * d).sum(-1) + 1e-20) * valid

    # energy-based surface correction (standard PD practice): points whose
    # horizon is truncated by a free surface have a weighted bond volume
    # W_i = Σ |ξ|² V below the bulk value; scaling each bond's stiffness by
    # 2 W0/(W_i + W_j) restores the bulk modulus near surfaces (without it a
    # thin bar reads ~2x too soft)
    W = (ref_len ** 2).sum(1) * spacing ** 3
    W0 = W.max()
    bond_scale = np.where(valid, 2.0 * W0 / np.maximum(W[:, None] + W[j],
                                                       1e-30), 0.0)

    if dt is None:
        # CFL from the bond sound speed
        c_wave = np.sqrt(youngs / density)
        dt = 0.2 * spacing / c_wave

    params = PeriParams(
        youngs=jnp.asarray(youngs), density=jnp.asarray(density),
        s0=jnp.asarray(s0), horizon=jnp.asarray(delta),
        volume=jnp.asarray(spacing ** 3), dt=jnp.asarray(dt),
        damping=jnp.asarray(damping),
        gravity=jnp.asarray(gravity, jnp.float32))
    state = PeriState(
        pos0=jnp.asarray(pts), pos=jnp.asarray(pts),
        vel=jnp.zeros((n, 3), jnp.float32),
        fixed=(jnp.zeros((n,), bool) if fixed_mask is None
               else jnp.asarray(fixed_mask)),
        bond_idx=nbr.idx, bond_ok=nbr.valid,
        ref_len=jnp.asarray(ref_len, jnp.float32),
        bond_scale=jnp.asarray(bond_scale, jnp.float32),
        time=jnp.zeros(()))
    return params, state


def peri_forces(params: PeriParams, state: PeriState):
    """Per-point bond force density ×V (N,3) and the updated intact mask."""
    j = jnp.maximum(state.bond_idx, 0)
    d = state.pos[j] - state.pos[:, None, :]
    cur = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-20)
    s = (cur - state.ref_len) / jnp.maximum(state.ref_len, 1e-9)
    ok = state.bond_ok & (state.ref_len > 0)
    ok_new = ok & (s <= params.s0)
    c = params.micro_modulus * state.bond_scale
    fmag = jnp.where(ok_new, c * s * params.volume * params.volume, 0.0)
    f = jnp.sum(fmag[..., None] * d / cur[..., None], axis=1)
    return f, state.bond_ok & (~ok | ok_new)


def peri_step(params: PeriParams, state: PeriState,
              f_ext=None) -> PeriState:
    """One explicit (kick-drift) step with permanent bond breakage."""
    f, bond_ok = peri_forces(params, state)
    m = params.density * params.volume
    acc = f / m + params.gravity[None, :] - params.damping * state.vel
    if f_ext is not None:
        acc = acc + f_ext / m
    upd = ~state.fixed[:, None]
    vel = jnp.where(upd, state.vel + params.dt * acc, 0.0)
    pos = jnp.where(upd, state.pos + params.dt * vel, state.pos)
    return state.replace(pos=pos, vel=vel, bond_ok=bond_ok,
                         time=state.time + params.dt)


def make_peri_advance_fn(params: PeriParams, f_ext=None):
    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: PeriState, n_steps: int):
        def body(s, _):
            return peri_step(params, s, f_ext), None

        state, _ = lax.scan(body, state, None, length=n_steps)
        return state

    return advance


def peri_step_implicit(params: PeriParams, state: PeriState, f_ext=None,
                       newton_iters: int = 6, cg_iters: int = 120,
                       tol: float = 1e-6) -> PeriState:
    """One backward-Euler step (ChMatterPeriBBimplicit role: the reference
    formulates implicit peridynamics through its per-bond constraint
    machinery; here it is Newton over the end-of-step velocity with
    matrix-free CG on autodiff JVPs — the same Krylov idiom as the FEA HHT
    path).  Stable at ~50× the explicit bond-sound-speed dt; bond breakage
    is evaluated once at the accepted end state (brittle, permanent)."""
    from chrono_tpu.solver import krylov

    h = params.dt
    m = params.density * params.volume
    upd = (~state.fixed[:, None]).astype(state.pos.dtype)
    g = params.gravity[None, :]
    fe = 0.0 if f_ext is None else f_ext / m

    def accel(v_flat):
        v = v_flat.reshape(state.pos.shape) * upd
        pos_new = state.pos + h * v
        f, _ = peri_forces(params, state.replace(pos=pos_new))
        a = f / m + g - params.damping * v + fe
        return (a * upd).reshape(-1)

    # residual(v) = v − v0 − h·a(v)
    v0 = (state.vel * upd).reshape(-1)

    def residual(v_flat):
        return v_flat - v0 - h * accel(v_flat)

    v = v0
    for _ in range(newton_iters):
        r = residual(v)

        def Av(x, v=v):
            return jax.jvp(residual, (v,), (x,))[1]

        sol = krylov.solve_cg(Av, -r, max_iter=cg_iters, tol=tol)
        v = v + sol.x

    vel = v.reshape(state.pos.shape) * upd
    pos = state.pos + h * vel
    _, bond_ok = peri_forces(params, state.replace(pos=pos))
    return state.replace(pos=jnp.where(upd > 0, pos, state.pos), vel=vel,
                         bond_ok=bond_ok, time=state.time + h)


def make_peri_advance_implicit_fn(params: PeriParams, f_ext=None, **kw):
    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: PeriState, n_steps: int):
        def body(s, _):
            return peri_step_implicit(params, s, f_ext, **kw), None

        state, _ = lax.scan(body, state, None, length=n_steps)
        return state

    return advance
