"""MPM particle container (3-DOF material points on a background grid).

Role of the reference's ``ChParticleContainer`` MPM path
(/root/reference/src/chrono_multicore/physics/Ch3DOFContainer.h:181-236 —
snow-style parameters: Lamé λ/μ, hardening coefficient, θ_c/θ_s singular-
value clamps; CUDA kernels in chrono_multicore/cuda/ChMPM.cu) rebuilt
TPU-native as MLS-MPM (Hu et al. 2018 formulation — affine particle-in-cell
transfers with quadratic B-splines, one fused P2G → grid → G2P program):

* P2G scatter goes through flat node indices + ``.at[].add`` (XLA lowers to
  a deterministic sorted scatter — the reference needs atomics);
* the elastic model is fixed-corotated (SVD rotation), with the snow
  plasticity of the reference: clamp singular values of F to
  [1−θ_c, 1+θ_s], move the excess into J_p, harden with exp(ξ(1−J_p));
* grid boundary conditions: sticky floor / separable walls on the box.

Everything is one jitted function of a pytree state; `lax.scan` over
substeps.  fp32 throughout (grid impulses are O(m v), no catastrophic
cancellation at test scales).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class MPMParams:
    """Material + discretization (reference Ch3DOFContainer fields)."""

    dx: Array                  # grid spacing [m]
    dt: Array                  # substep [s]
    particle_mass: Array
    particle_volume: Array
    lame_mu: Array             # μ₀
    lame_lambda: Array         # λ₀
    hardening: Array = 10.0    # ξ (reference hardening_coefficient)
    theta_c: Array = 2.5e-2    # compression clamp
    theta_s: Array = 7.5e-3    # stretch clamp
    gravity: Array = (0.0, 0.0, -9.81)
    plastic: bool = static_field(default=True)   # snow vs pure elastic


@pytree_dataclass
class MPMState:
    x: Array      # (N,3)
    v: Array      # (N,3)
    F: Array      # (N,3,3) elastic deformation gradient
    C: Array      # (N,3,3) APIC affine velocity field
    Jp: Array     # (N,) plastic volume ratio


def make_mpm_state(points, vel=None) -> MPMState:
    n = len(points)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    return MPMState(
        x=jnp.asarray(points, jnp.float32),
        v=(jnp.zeros((n, 3), jnp.float32) if vel is None
           else jnp.asarray(vel, jnp.float32)),
        F=eye, C=jnp.zeros((n, 3, 3), jnp.float32),
        Jp=jnp.ones((n,), jnp.float32))


def lame_from_E_nu(E, nu):
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return mu, lam


_OFF = np.array([(i, j, k) for i in range(3) for j in range(3)
                 for k in range(3)])                       # (27,3)


def make_mpm_step(params: MPMParams, grid_dims, origin=(0.0, 0.0, 0.0),
                  sticky_floor=True):
    """Build ``step(state) -> state`` (one substep) and
    ``advance(state, n) -> state`` (scanned)."""
    gx, gy, gz = grid_dims
    origin = jnp.asarray(origin, jnp.float32)
    offs = jnp.asarray(_OFF, jnp.int32)                    # (27,3)

    def step(st: MPMState) -> MPMState:
        p = params
        inv_dx = 1.0 / p.dx
        xg = (st.x - origin) * inv_dx
        base = jnp.floor(xg - 0.5).astype(jnp.int32)       # (N,3)
        fx = xg - base                                     # in [0.5, 1.5]
        # quadratic B-spline weights per axis: (N,3axes,3taps)
        w = jnp.stack([0.5 * (1.5 - fx) ** 2,
                       0.75 - (fx - 1.0) ** 2,
                       0.5 * (fx - 0.5) ** 2], axis=-1)

        # stress (fixed corotated + snow hardening)
        h = jnp.where(p.plastic,
                      jnp.exp(p.hardening * (1.0 - st.Jp)), 1.0)
        mu = p.lame_mu * h
        lam = p.lame_lambda * h
        U, sig, Vt = jnp.linalg.svd(st.F, full_matrices=False)
        R = U @ Vt
        J = jnp.prod(sig, axis=-1)
        FT = jnp.swapaxes(st.F, -1, -2)
        P = (2.0 * mu[:, None, None] * (st.F - R) @ FT
             + (lam * J * (J - 1.0))[:, None, None]
             * jnp.broadcast_to(jnp.eye(3, dtype=st.F.dtype), st.F.shape))
        stress = (-p.dt * p.particle_volume * 4.0 * inv_dx * inv_dx) * P
        affine = stress + p.particle_mass * st.C           # (N,3,3)

        # P2G: flat scatter of (mass, momentum) over the 27 taps
        node = base[:, None, :] + offs[None, :, :]         # (N,27,3)
        node = jnp.clip(node, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
        flat = (node[..., 0] * gy + node[..., 1]) * gz + node[..., 2]
        wijk = (w[:, 0, offs[:, 0]] * w[:, 1, offs[:, 1]]
                * w[:, 2, offs[:, 2]])                     # (N,27)
        dpos = (offs[None].astype(jnp.float32)
                - fx[:, None, :]) * p.dx                   # (N,27,3)
        mom = (p.particle_mass * st.v[:, None, :]
               + jnp.einsum("nij,nkj->nki", affine, dpos)) # (N,27,3)
        g_m = jnp.zeros((gx * gy * gz,), jnp.float32).at[
            flat.reshape(-1)].add((wijk * p.particle_mass).reshape(-1))
        g_mv = jnp.zeros((gx * gy * gz, 3), jnp.float32).at[
            flat.reshape(-1)].add((wijk[..., None] * mom).reshape(-1, 3))

        # grid update: velocity, gravity, box boundaries
        gv = g_mv / jnp.maximum(g_m, 1e-12)[:, None]
        gv = gv + p.dt * jnp.asarray(p.gravity, jnp.float32)
        gv = gv * (g_m > 1e-12)[:, None]
        gv3 = gv.reshape(gx, gy, gz, 3)
        idx = lambda n_, a: jnp.arange(n_)
        bw = 2   # boundary width in nodes
        ix = jnp.arange(gx)[:, None, None]
        iy = jnp.arange(gy)[None, :, None]
        iz = jnp.arange(gz)[None, None, :]
        vx, vy, vz = gv3[..., 0], gv3[..., 1], gv3[..., 2]
        vx = jnp.where((ix < bw) & (vx < 0), 0.0, vx)
        vx = jnp.where((ix >= gx - bw) & (vx > 0), 0.0, vx)
        vy = jnp.where((iy < bw) & (vy < 0), 0.0, vy)
        vy = jnp.where((iy >= gy - bw) & (vy > 0), 0.0, vy)
        vz = jnp.where((iz >= gz - bw) & (vz > 0), 0.0, vz)
        if sticky_floor:
            floor = (iz < bw) & (vz < 0)
            vx = jnp.where(floor, 0.0, vx)
            vy = jnp.where(floor, 0.0, vy)
        vz = jnp.where((iz < bw) & (vz < 0), 0.0, vz)
        gv = jnp.stack([vx, vy, vz], axis=-1).reshape(-1, 3)

        # G2P
        gv_taps = gv[flat]                                 # (N,27,3)
        v_new = jnp.sum(wijk[..., None] * gv_taps, axis=1)
        C_new = 4.0 * inv_dx * inv_dx * jnp.einsum(
            "nk,nki,nkj->nij", wijk, gv_taps, dpos)
        x_new = st.x + p.dt * v_new
        F_new = (jnp.broadcast_to(jnp.eye(3, dtype=st.F.dtype), st.F.shape)
                 + p.dt * C_new) @ st.F

        if params.plastic:
            U2, s2, Vt2 = jnp.linalg.svd(F_new, full_matrices=False)
            s_cl = jnp.clip(s2, 1.0 - p.theta_c, 1.0 + p.theta_s)
            Jp_new = jnp.clip(
                st.Jp * jnp.prod(s2, axis=-1) / jnp.prod(s_cl, axis=-1),
                0.6, 20.0)
            F_new = (U2 * s_cl[:, None, :]) @ Vt2
        else:
            Jp_new = st.Jp

        return MPMState(x=x_new, v=v_new, F=F_new, C=C_new, Jp=Jp_new)

    step_j = jax.jit(step)

    @functools.partial(jax.jit, static_argnums=1)
    def advance(st: MPMState, n: int) -> MPMState:
        out, _ = lax.scan(lambda s, _: (step(s), None), st, None, length=n)
        return out

    return step_j, advance
