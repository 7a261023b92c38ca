"""NSC/DVI many-body stepper on the pencil lattice (BASELINE config #2).

TPU-native replacement for the reference's NSC many-body path (core
``ChSystem`` + ``ChSolverAPGD``/``ChSolverPSOR`` + the multicore data-parallel
assembly, /root/reference/src/chrono/solver/ChSolverAPGD.cpp:30,
src/chrono_multicore/solver/ChIterativeSolverMulticoreNSC.cpp:22) for scenes of
many uniform spheres (mixers, drums, hoppers): the whole DVI step — binning,
implicit contact detection, the accelerated projected-gradient cone solve and
the velocity update — runs on the dense cell lattice with zero gathers inside
the iteration.  See chrono_tpu.ops.pallas.nsc_pencil_kernel for the layout and
the bitwise-symmetric duplicated-multiplier scheme.

Two backends:
  * ``pallas`` — the TPU hot path (two Pallas sweeps per iteration);
  * ``xla``    — a roll-based dense reference (same math, same lattice),
                 used for tests and CPU runs.

The iteration is APGD (Nesterov recurrence, /root/reference/src/chrono/solver/
ChSolverAPGD.cpp:115) with a per-cone diagonal ("Jacobi") preconditioner in
place of the reference's adaptive-L backtracking: the step for each contact is
``s = ω / diag_t(N)`` which is exact per-cone scaling, with the global safety
factor ω absorbing the off-diagonal coupling.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.cell_dense import (
    to_cells, from_cells, field_to_pencils,
)
from chrono_tpu.ops.pallas.nsc_pencil_kernel import (
    pair_geometry, pair_velocity, contact_rhs, cone_project, wall_geometry,
    nsc_sweep_u_pallas, nsc_sweep_g_pallas, _k27,
)
from chrono_tpu.ops.pallas.dem_pencil_kernel import edge_ok_xy


@pytree_dataclass
class NSCPencilParams:
    """Static parameters of the uniform-sphere NSC scene."""

    radius: float = static_field(default=0.01)
    mass: float = static_field(default=1.0)
    mu: float = static_field(default=0.3)
    gravity: tuple = static_field(default=(0.0, 0.0, -9.81))
    dt: float = static_field(default=1e-3)
    envelope: float = static_field(default=0.0)   # detection margin (m)
    stab_factor: float = static_field(default=0.2)
    max_recovery: float = static_field(default=0.5)
    omega: float = static_field(default=0.3)      # relaxation safety
    n_iter: int = static_field(default=50)
    restart_every: int = static_field(default=0)  # Nesterov θ reset (0=off)
    track_residual: bool = static_field(default=False)  # per-iter ‖Δγ‖
    # per-wall contact reactions (force, torque about the wall center) from
    # the final multipliers — the role of the reference's motor/link
    # Get_react readout (e.g. the mixer blade's ChLinkMotorRotationSpeed
    # torque).  Exact for the prescribed-motion blade: an ideal speed motor
    # must supply exactly the contact torque (plus the blade's constant-ω
    # inertial term, which is zero).
    track_wall_reactions: bool = static_field(default=False)
    # DYNAMIC rotbox walls (bilateral fold): blade_inertia > 0 makes every
    # rotbox wall's angular velocity a SOLVER VARIABLE — the revolute joint
    # to ground is solved exactly in reduced coordinates (the fused
    # side-solve of the descriptor's bilateral block,
    # /root/reference/src/chrono/solver/ChSystemDescriptor.cpp:519-600),
    # and the blade spin is updated from the contact impulses every APGD
    # iteration: I ω_{k+1} = I ω_free + τ_axis(γ_k).  blade_torque is the
    # constant drive torque about the rotation axis (the role of a torque
    # motor; the prescribed-speed mode stays the default).
    blade_inertia: float = static_field(default=0.0)
    blade_torque: float = static_field(default=0.0)

    @property
    def inertia(self) -> float:
        return 0.4 * self.mass * self.radius * self.radius

    def phys_tuple(self) -> tuple:
        d = dict(radius=self.radius, inv_m=1.0 / self.mass,
                 inv_I=1.0 / self.inertia, envelope=self.envelope,
                 mu=self.mu, omega=self.omega,
                 stab_over_h=self.stab_factor / self.dt,
                 inv_h=1.0 / self.dt, max_recovery=self.max_recovery,
                 inv_Ib=(1.0 / self.blade_inertia
                         if self.blade_inertia > 0 else 0.0))
        return tuple(sorted(d.items()))


class APGDState(NamedTuple):
    gam: Array      # γ_{k-1}
    gprev: Array    # γ_{k-2}
    wgam: Array
    wgprev: Array
    beta: Array     # β_{k-1} (forms y_k from the two lattices)
    theta: Array    # θ_k


def theta_next(theta):
    return 0.5 * (-theta * theta
                  + theta * jnp.sqrt(theta * theta + 4.0))


def _momentum_update(st: APGDState, gnew, wnew, p: NSCPencilParams, k):
    """Shared Nesterov recurrence (+ optional periodic restart) and the
    per-iteration Δγ stagnation metric (the role of the reference's Δλ
    history, ChIterativeSolverVI.h:74)."""
    theta = st.theta
    if p.restart_every:
        theta = jnp.where((k > 0) & (k % p.restart_every == 0), 1.0, theta)
    th_n = theta_next(theta)
    beta = theta * (1.0 - theta) / (theta * theta + th_n)
    if p.track_residual:
        dg = jnp.sqrt(jnp.sum((gnew - st.gam) ** 2)
                      + jnp.sum((wnew - st.wgam) ** 2))
    else:
        dg = jnp.zeros(())
    return APGDState(gam=gnew, gprev=st.gam, wgam=wnew, wgprev=st.wgam,
                     beta=beta, theta=th_n), dg


_OFFSETS_XY = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


# --------------------------------------------------------------------------
# XLA-dense reference backend (rolls over (nx,ny,nz,C) blocks)
# --------------------------------------------------------------------------

def _edge_ok_dense(grid: GridSpec, dx, dy, dz):
    nx, ny, nz = grid.dims

    def ok1(n, off):
        idx = jnp.arange(n)
        if off == -1:
            return idx > 0
        if off == 1:
            return idx < n - 1
        return jnp.ones((n,), bool)

    return (ok1(nx, dx)[:, None, None] & ok1(ny, dy)[None, :, None]
            & ok1(nz, dz)[None, None, :]).astype(jnp.float32)


# offsets in γ-lattice order: k27 = kxy*3 + (dz+1)
_OFFSETS_27 = [(dx, dy, dz) for (dx, dy) in _OFFSETS_XY for dz in (-1, 0, 1)]
_SELF_K27 = _OFFSETS_27.index((0, 0, 0))


def _neighbor_stack(grid: GridSpec, arrs):
    """Stack all 27 rolled-neighbor views (leading axis = k27) of each array,
    plus the (27, nx, ny, nz) edge-validity stack.  One vectorized pair block
    over the offset axis keeps the XLA graph ~27× smaller than unrolled
    offset loops (compile time on 1 host core is the binding constraint for
    the dense test backend)."""
    outs = [jnp.stack([jnp.roll(a, (-dx, -dy, -dz), axis=(0, 1, 2))
                       for (dx, dy, dz) in _OFFSETS_27], axis=0)
            for a in arrs]
    edge = jnp.stack([_edge_ok_dense(grid, dx, dy, dz)
                      for (dx, dy, dz) in _OFFSETS_27], axis=0)
    return outs, edge


def _pair_block(p, grid, pos, maskf, nstack_extra=()):
    """Shared 27-offset pair tensors: geometry + validity.

    Returns (nhat, gap, arm, t1, t2, ok, extras) with leading axis k27 and
    pair axes (..., C_self, C_nbr)."""
    C = maskf.shape[3]
    (npos, nmask, *extras), edge = _neighbor_stack(
        grid, (pos, maskf) + tuple(nstack_extra))
    spx = pos[None, ..., :, None, 0]
    spy = pos[None, ..., :, None, 1]
    spz = pos[None, ..., :, None, 2]
    nhat, gap, arm, t1, t2 = pair_geometry(
        spx, spy, spz, npos[..., None, :, 0], npos[..., None, :, 1],
        npos[..., None, :, 2], p.radius)
    ok = (maskf[None, ..., :, None] * nmask[..., None, :]
          * edge[..., None, None]
          * (gap < p.envelope).astype(pos.dtype))
    neq = (~jnp.eye(C, dtype=bool)).astype(pos.dtype)
    sel = jnp.zeros((27,) + (1,) * 5, pos.dtype).at[_SELF_K27].set(1.0)
    ok = ok * ((1.0 - sel) + sel * neq)
    return nhat, gap, arm, t1, t2, ok, extras


def wall_cs_list(walls, theta, wspin=None):
    """Per-wall traced (cos θ, sin θ[, ω]) for ``rotbox`` walls (None for
    static kinds); ``theta``: (n_rotbox,) traced angles in wall order.
    ``wspin``: optional (n_rotbox,) traced angular velocities — appended as
    a third scalar (the dynamic-blade mode, see wall_geometry)."""
    out, k = [], 0
    for wall in walls:
        if wall[0] == "rotbox":
            if wspin is None:
                out.append((jnp.cos(theta[k]), jnp.sin(theta[k])))
            else:
                out.append((jnp.cos(theta[k]), jnp.sin(theta[k]),
                            wspin[k]))
            k += 1
        else:
            out.append(None)
    return out


def n_rotbox(walls):
    return sum(1 for w in walls if w[0] == "rotbox")


def dense_sweep_u(p: NSCPencilParams, grid: GridSpec, walls, pos, ufree_v,
                  ufree_w, mask, gam, gprev, wgam, wgprev, beta,
                  cs_list=None):
    """u(y) on the dense (nx,ny,nz,C) lattice.  gam: (nx,ny,nz,27,3,C,C)."""
    inv_m = 1.0 / p.mass
    inv_I = 1.0 / p.inertia
    maskf = mask.astype(pos.dtype)
    y_all = gam + beta * (gam - gprev)

    nhat, gap, arm, t1, t2, ok, _ = _pair_block(p, grid, pos, maskf)
    y = jnp.moveaxis(y_all, 3, 0)                    # (27,...,3,C,C)
    yn, yu, yv = y[..., 0, :, :], y[..., 1, :, :], y[..., 2, :, :]
    pf = [ok * -(yn * nhat[i] + yu * t1[i] + yv * t2[i]) for i in range(3)]
    pt = [ok * arm * (yv * t1[i] - yu * t2[i]) for i in range(3)]
    f = jnp.stack([jnp.sum(c, axis=(0, -1)) for c in pf], axis=-1)
    tau = jnp.stack([jnp.sum(c, axis=(0, -1)) for c in pt], axis=-1)

    # walls
    px, py, pz = pos[..., 0], pos[..., 1], pos[..., 2]
    yw_all = wgam + beta * (wgam - wgprev)
    for w, wall in enumerate(walls):
        nhat, gap, _ = wall_geometry(wall, px, py, pz, p.radius,
                                     None if cs_list is None else cs_list[w])
        okw = maskf * (gap < p.envelope).astype(pos.dtype)
        armw = p.radius + 0.5 * jnp.minimum(gap, 0.0)
        t1, t2 = _wall_tangents(nhat)
        yn = yw_all[..., w, 0]
        yu = yw_all[..., w, 1]
        yv = yw_all[..., w, 2]
        f = f + jnp.stack(
            [okw * -(yn * nhat[i] + yu * t1[i] + yv * t2[i])
             for i in range(3)], axis=-1)
        tau = tau + jnp.stack(
            [okw * armw * (yv * t1[i] - yu * t2[i]) for i in range(3)],
            axis=-1)

    m = maskf[..., None]
    return (ufree_v + inv_m * f) * m, (ufree_w + inv_I * tau) * m


def _wall_tangents(nhat):
    nx, ny, nz = nhat
    use_x = (jnp.abs(nx) < 0.9).astype(nx.dtype)
    t1x = (1.0 - use_x) * (-nz)
    t1y = use_x * nz
    t1z = use_x * (-ny) + (1.0 - use_x) * nx
    tn = jax.lax.rsqrt(t1x * t1x + t1y * t1y + t1z * t1z + 1e-18)
    t1 = (t1x * tn, t1y * tn, t1z * tn)
    t2 = (ny * t1[2] - nz * t1[1], nz * t1[0] - nx * t1[2],
          nx * t1[1] - ny * t1[0])
    return t1, t2


def dense_sweep_g(p: NSCPencilParams, grid: GridSpec, walls, pos, u_v, u_w,
                  mask, gam, gprev, wgam, wgprev, beta, cs_list=None):
    """Projected-gradient update on the dense lattice → (gam⁺, wgam⁺)."""
    inv_m = 1.0 / p.mass
    inv_I = 1.0 / p.inertia
    maskf = mask.astype(pos.dtype)
    y_all = gam + beta * (gam - gprev)

    nhat, gap, arm, t1, t2, ok, (nuv, nuw) = _pair_block(
        p, grid, pos, maskf, (u_v, u_w))
    sv = tuple(u_v[None, ..., :, None, i] for i in range(3))
    sw = tuple(u_w[None, ..., :, None, i] for i in range(3))
    nv = tuple(nuv[..., None, :, i] for i in range(3))
    nw = tuple(nuw[..., None, :, i] for i in range(3))
    gn_v, gu_v, gv_v = pair_velocity(nhat, t1, t2, arm, sv, nv, sw, nw)
    bn = contact_rhs(gap, p.stab_factor / p.dt, 1.0 / p.dt, p.max_recovery)
    y = jnp.moveaxis(y_all, 3, 0)
    s = p.omega / (2.0 * inv_m + 2.0 * arm * arm * inv_I)
    pn, pu, pv = cone_project(
        y[..., 0, :, :] - s * (gn_v - bn),
        y[..., 1, :, :] - s * gu_v,
        y[..., 2, :, :] - s * gv_v, p.mu)
    out = jnp.moveaxis(
        jnp.stack([ok * pn, ok * pu, ok * pv], axis=-3), 0, 3)

    wout = jnp.zeros_like(wgam)
    px, py, pz = pos[..., 0], pos[..., 1], pos[..., 2]
    v0 = tuple(u_v[..., i] for i in range(3))
    w0 = tuple(u_w[..., i] for i in range(3))
    yw_all = wgam + beta * (wgam - wgprev)
    for w, wall in enumerate(walls):
        mu_w = wall[4] if wall[0] == "plane" else wall[5]
        nhat, gap, vsurf = wall_geometry(wall, px, py, pz, p.radius,
                                         None if cs_list is None
                                         else cs_list[w])
        okw = maskf * (gap < p.envelope).astype(pos.dtype)
        armw = p.radius + 0.5 * jnp.minimum(gap, 0.0)
        t1, t2 = _wall_tangents(nhat)
        gn_v, gu_v, gv_v = pair_velocity(
            nhat, t1, t2, armw, v0, vsurf, w0,
            (jnp.zeros_like(px),) * 3)
        bn = contact_rhs(gap, p.stab_factor / p.dt, 1.0 / p.dt,
                         p.max_recovery)
        denom = 1.0 / p.mass + armw * armw / p.inertia
        if wall[0] == "rotbox" and p.blade_inertia > 0:
            # dynamic blade: its rotational compliance joins the row's
            # diagonal (rho^2/I_b, rho = contact distance from the axis)
            axis = wall[1]
            cx, cy, cz = wall[2]
            d3 = (px - cx, py - cy, pz - cz)
            i1, i2 = [(1, 2), (2, 0), (0, 1)][axis]
            rho2 = d3[i1] * d3[i1] + d3[i2] * d3[i2]
            denom = denom + rho2 / p.blade_inertia
        s = p.omega / denom
        pn, pu, pv = cone_project(
            yw_all[..., w, 0] - s * (gn_v - bn),
            yw_all[..., w, 1] - s * gu_v,
            yw_all[..., w, 2] - s * gv_v, mu_w)
        wout = wout.at[..., w, :].set(
            jnp.stack([okw * pn, okw * pu, okw * pv], axis=-1))
    return out, wout


def _wall_center(wall):
    if wall[0] == "plane":
        return (0.0, 0.0, 0.0)
    return wall[2]


def _reaction_from(p, wall, px, py, pz, maskf, yn, yu, yv, cs):
    """Per-wall total (force (3,), torque (3,) about the wall center) from
    the final contact impulses γ (force = γ/dt; reaction ON the wall is the
    opposite of the particle force)."""
    nhat, gap, _ = wall_geometry(wall, px, py, pz, p.radius, cs)
    okw = maskf * (gap < p.envelope).astype(px.dtype)
    armw = p.radius + 0.5 * jnp.minimum(gap, 0.0)
    t1, t2 = _wall_tangents(nhat)
    inv_h = 1.0 / p.dt
    f = [okw * inv_h * (yn * nhat[i] + yu * t1[i] + yv * t2[i])
         for i in range(3)]
    cx, cy, cz = _wall_center(wall)
    rx = px + armw * nhat[0] - cx        # contact point − wall center
    ry = py + armw * nhat[1] - cy
    rz = pz + armw * nhat[2] - cz
    tq = (ry * f[2] - rz * f[1],
          rz * f[0] - rx * f[2],
          rx * f[1] - ry * f[0])
    force = jnp.stack([jnp.sum(c) for c in f])
    torque = jnp.stack([jnp.sum(c) for c in tq])
    return force, torque


def _wall_reactions_planes(p, walls, feat, wgam, cs_list):
    """Reactions from the pencil-plane layout (feat (nxy,10,C,NZp), wgam
    (nxy,3W,C,NZp))."""
    px, py, pz, maskf = feat[:, 0], feat[:, 1], feat[:, 2], feat[:, 9]
    out_f, out_t = [], []
    for w, wall in enumerate(walls):
        f, t = _reaction_from(
            p, wall, px, py, pz, maskf,
            wgam[:, 3 * w], wgam[:, 3 * w + 1], wgam[:, 3 * w + 2],
            None if cs_list is None else cs_list[w])
        out_f.append(f)
        out_t.append(t)
    return jnp.stack(out_f), jnp.stack(out_t)


def _wall_reactions_dense(p, walls, pos, maskf, wgam, cs_list):
    """Reactions from the dense layout (pos (nx,ny,nz,C,3), wgam
    (nx,ny,nz,C,W,3))."""
    px, py, pz = pos[..., 0], pos[..., 1], pos[..., 2]
    out_f, out_t = [], []
    for w, wall in enumerate(walls):
        f, t = _reaction_from(
            p, wall, px, py, pz, maskf,
            wgam[..., w, 0], wgam[..., w, 1], wgam[..., w, 2],
            None if cs_list is None else cs_list[w])
        out_f.append(f)
        out_t.append(t)
    return jnp.stack(out_f), jnp.stack(out_t)


def _blade_torque_fns(p, walls, px, py, pz, maskf, cs_list):
    """Per-rotbox-wall closures: angular impulse about the rotation axis
    from the wall multipliers, with the contact geometry cached at the
    step's pose (θ is fixed within a DVI step, so the geometry planes are
    computed once and reused by every APGD iteration's blade-spin update).
    Returns [(wall_index, tau_fn(yn, yu, yv) -> scalar impulse), ...]."""
    fns = []
    for w, wall in enumerate(walls):
        if wall[0] != "rotbox":
            continue
        axis = wall[1]
        cs = cs_list[w][:2] if cs_list is not None else None
        nhat, gap, _ = wall_geometry(wall, px, py, pz, p.radius, cs)
        okw = maskf * (gap < p.envelope).astype(px.dtype)
        armw = p.radius + 0.5 * jnp.minimum(gap, 0.0)
        t1, t2 = _wall_tangents(nhat)
        cx, cy, cz = wall[2]
        r = (px + armw * nhat[0] - cx,
             py + armw * nhat[1] - cy,
             pz + armw * nhat[2] - cz)
        i1, i2 = [(1, 2), (2, 0), (0, 1)][axis]

        def tau(yn, yu, yv, okw=okw, nhat=nhat, t1=t1, t2=t2, r=r,
                i1=i1, i2=i2):
            # reaction ON the blade = +(γ impulses) along the row directions
            f = [okw * (yn * nhat[i] + yu * t1[i] + yv * t2[i])
                 for i in range(3)]
            return jnp.sum(r[i1] * f[i2] - r[i2] * f[i1])

        fns.append((w, tau))
    return fns


# --------------------------------------------------------------------------
# drivers
# --------------------------------------------------------------------------

def make_nsc_pencil_advance(p: NSCPencilParams, grid: GridSpec, walls,
                            capacity: int = 8, backend: str = "pallas",
                            Bxy: int = 1, interpret: bool = False,
                            partners: int = 12):
    """Build ``advance(pos, vel, omega, n_steps) -> (pos, vel, omega, info)``.

    One DVI step = re-bin → ``n_iter`` APGD iterations on the multiplier
    lattice (cold start) → velocity update → explicit position update —
    the lattice equivalent of ``ChSystem::AdvanceDynamics``
    (/root/reference/src/chrono/physics/ChSystem.cpp:1581).

    Backends: "pallas" (dense pair lattice), "partner" (per-body partner
    slots, duplicated multipliers — ops/pallas/nsc_partner_kernel), "half"
    (single-sided multipliers on the forward half stencil with a rolling
    reaction window — ops/pallas/nsc_half_kernel, the fast one), "xla"
    (dense roll-based reference).
    """
    nx, ny, nz = grid.dims
    if any(grid.periodic):
        raise ValueError("nsc pencil supports non-periodic boxes")
    nxy = nx * ny
    nxy_pad = ((nxy + Bxy - 1) // Bxy) * Bxy
    nzp = ((nz + 1 + 127) // 128) * 128
    phys = p.phys_tuple()
    W = len(walls)
    lat = 27 * 3 * capacity
    gvec = jnp.asarray(p.gravity, jnp.float32)

    if backend in ("partner", "half"):
        from chrono_tpu.ops.pallas.nsc_partner_kernel import (
            detect_partners, codes_to_pencils,
            nsc_partner_sweep_u_pallas, nsc_partner_sweep_g_pallas,
        )
        from chrono_tpu.ops.pallas.nsc_half_kernel import (
            detect_half, nsc_half_sweep_u_pallas, nsc_half_sweep_g_pallas,
        )
        if backend == "half":
            detect_fn = detect_half
            sweep_u, sweep_g = (nsc_half_sweep_u_pallas,
                                nsc_half_sweep_g_pallas)
        else:
            detect_fn = detect_partners
            sweep_u, sweep_g = (nsc_partner_sweep_u_pallas,
                                nsc_partner_sweep_g_pallas)
        P = partners
        pd = dict(phys)
        if backend == "partner" and n_rotbox(walls):
            raise ValueError("rotbox walls: use the 'half' or 'xla' backend")

        def solve(field, cs_list=None, theta=None, wspin_free=None):
            feat = field_to_pencils(field, nzp)
            codes_d, pover = detect_fn(
                p.radius, p.envelope, grid, field.pos, field.mask, P)
            solve.partner_overflow = pover
            codes = codes_to_pencils(codes_d, nzp)
            if codes.shape[0] != nxy_pad:
                pad = jnp.full((nxy_pad - codes.shape[0],) + codes.shape[1:],
                               -1.0, codes.dtype)
                codes = jnp.concatenate([codes, pad], axis=0)

            kw = dict(phys=pd, walls=walls, grid_dims=grid.dims,
                      C=capacity, P=P, Bxy=Bxy, interpret=interpret)
            dyn = wspin_free is not None

            def flat_cs(csl):
                return None if csl is None else tuple(
                    c for pair in csl if pair is not None for c in pair)

            if backend == "half" and not dyn:
                kw["cs"] = flat_cs(cs_list)

            def sweeps(st, ws, beta_pair):
                kw2 = dict(kw)
                if dyn:
                    kw2["cs"] = flat_cs(wall_cs_list(walls, theta, ws))
                gam, gprev, wgam, wgprev, beta = beta_pair
                u = sweep_u(feat, codes, gam, gprev, wgam, wgprev, beta,
                            **kw2)
                return u, kw2

            def one_iter(carry, k):
                st, ws = carry
                u, kw2 = sweeps(st, ws,
                                (st.gam, st.gprev, st.wgam, st.wgprev,
                                 st.beta))
                featU = jnp.concatenate(
                    [feat[:, :3], u[:nxy], feat[:, 9:]], axis=1)
                gnew, wnew = sweep_g(
                    featU, codes, st.gam, st.gprev, st.wgam, st.wgprev,
                    st.beta, **kw2)
                st2, dg = _momentum_update(st, gnew, wnew, p, k)
                if dyn:
                    # fused bilateral side-solve: blade spin from the fresh
                    # wall impulses (reduced-coordinate revolute joint),
                    # under-relaxed — the plain fixed-point update couples
                    # every blade contact through one scalar and diverges
                    # when many contacts load a light blade
                    taus = jnp.stack([
                        fn(wnew[:nxy, 3 * w], wnew[:nxy, 3 * w + 1],
                           wnew[:nxy, 3 * w + 2]) for w, fn in tq_fns])
                    ws = 0.5 * ws + 0.5 * (wspin_free
                                           + taus / p.blade_inertia)
                return (st2, ws), dg

            if dyn:
                tq_fns = _blade_torque_fns(
                    p, walls, feat[:nxy, 0], feat[:nxy, 1], feat[:nxy, 2],
                    feat[:nxy, 9], cs_list)

            st0 = APGDState(
                gam=jnp.zeros((nxy_pad, 3 * P, capacity, nzp), jnp.float32),
                gprev=jnp.zeros((nxy_pad, 3 * P, capacity, nzp), jnp.float32),
                wgam=jnp.zeros((nxy_pad, 3 * max(W, 1), capacity, nzp),
                               jnp.float32),
                wgprev=jnp.zeros((nxy_pad, 3 * max(W, 1), capacity, nzp),
                                 jnp.float32),
                beta=jnp.zeros((), jnp.float32),
                theta=jnp.ones((), jnp.float32))
            ws0 = wspin_free if dyn else jnp.zeros((max(R, 1),), jnp.float32)
            (st, ws), dgam = lax.scan(one_iter, (st0, ws0),
                                      jnp.arange(p.n_iter))
            u, _ = sweeps(st, ws, (st.gam, st.gam, st.wgam, st.wgam,
                                   jnp.zeros((), jnp.float32)))

            def grab(a, f0):
                return a[:nxy, f0:f0 + 3, :, :nz].transpose(
                    0, 3, 2, 1).reshape(nx, ny, nz, capacity, 3)

            reac = _wall_reactions_planes(p, walls, feat[:nxy],
                                          st.wgam[:nxy], cs_list) \
                if p.track_wall_reactions else None
            return grab(u, 0), grab(u, 3), dgam, reac, ws

    elif backend == "pallas":
        edge_table = edge_ok_xy(grid.dims)
        if n_rotbox(walls):
            raise ValueError("rotbox walls: use the 'half' or 'xla' backend")

        def solve(field, cs_list=None):
            feat = field_to_pencils(field, nzp)

            def one_iter(st: APGDState, k):
                u = nsc_sweep_u_pallas(
                    feat, edge_table, st.gam, st.gprev, st.wgam, st.wgprev,
                    st.beta, phys=phys, walls=walls, grid_dims=grid.dims,
                    C=capacity, Bxy=Bxy, interpret=interpret)
                featU = jnp.concatenate(
                    [feat[:, :3], u, feat[:, 9:]], axis=1)
                gnew, wnew = nsc_sweep_g_pallas(
                    featU, edge_table, st.gam, st.gprev, st.wgam, st.wgprev,
                    st.beta, phys=phys, walls=walls, grid_dims=grid.dims,
                    C=capacity, Bxy=Bxy, interpret=interpret)
                return _momentum_update(st, gnew, wnew, p, k)

            st0 = APGDState(
                gam=jnp.zeros((nxy_pad, lat, capacity, nzp), jnp.float32),
                gprev=jnp.zeros((nxy_pad, lat, capacity, nzp), jnp.float32),
                wgam=jnp.zeros((nxy_pad, 3 * max(W, 1), capacity, nzp),
                               jnp.float32),
                wgprev=jnp.zeros((nxy_pad, 3 * max(W, 1), capacity, nzp),
                                 jnp.float32),
                beta=jnp.zeros((), jnp.float32),
                theta=jnp.ones((), jnp.float32))
            st, dgam = lax.scan(one_iter, st0, jnp.arange(p.n_iter))
            u = nsc_sweep_u_pallas(
                feat, edge_table, st.gam, st.gam, st.wgam, st.wgam,
                jnp.zeros((), jnp.float32), phys=phys, walls=walls,
                grid_dims=grid.dims, C=capacity, Bxy=Bxy,
                interpret=interpret)

            def grab(a, f0):  # (NXY, 6, C, NZp) → (nx,ny,nz,C,3)
                return a[:, f0:f0 + 3, :, :nz].transpose(0, 3, 2, 1).reshape(
                    nx, ny, nz, capacity, 3)

            return grab(u, 0), grab(u, 3), dgam, None, None

    elif backend == "xla":

        def solve(field, cs_list=None, theta=None, wspin_free=None):
            pos, ufv, ufw, mask = field.pos, field.vel, field.omega, \
                field.mask
            dyn = wspin_free is not None
            if dyn:
                tq_fns = _blade_torque_fns(
                    p, walls, pos[..., 0], pos[..., 1], pos[..., 2],
                    mask.astype(pos.dtype), cs_list)

            def one_iter(carry, k):
                st, ws = carry
                csl = wall_cs_list(walls, theta, ws) if dyn else cs_list
                uv, uw = dense_sweep_u(p, grid, walls, pos, ufv, ufw, mask,
                                       st.gam, st.gprev, st.wgam, st.wgprev,
                                       st.beta, csl)
                gnew, wnew = dense_sweep_g(p, grid, walls, pos, uv, uw, mask,
                                           st.gam, st.gprev, st.wgam,
                                           st.wgprev, st.beta, csl)
                st2, dg = _momentum_update(st, gnew, wnew, p, k)
                if dyn:
                    taus = jnp.stack([
                        fn(wnew[..., w, 0], wnew[..., w, 1], wnew[..., w, 2])
                        for w, fn in tq_fns])
                    ws = 0.5 * ws + 0.5 * (wspin_free
                                           + taus / p.blade_inertia)
                return (st2, ws), dg

            C = capacity
            st0 = APGDState(
                gam=jnp.zeros((nx, ny, nz, 27, 3, C, C), jnp.float32),
                gprev=jnp.zeros((nx, ny, nz, 27, 3, C, C), jnp.float32),
                wgam=jnp.zeros((nx, ny, nz, C, max(W, 1), 3), jnp.float32),
                wgprev=jnp.zeros((nx, ny, nz, C, max(W, 1), 3), jnp.float32),
                beta=jnp.zeros((), jnp.float32),
                theta=jnp.ones((), jnp.float32))
            ws0 = wspin_free if dyn else jnp.zeros((max(R, 1),), jnp.float32)
            (st, ws), dgam = lax.scan(one_iter, (st0, ws0),
                                      jnp.arange(p.n_iter))
            csl = wall_cs_list(walls, theta, ws) if dyn else cs_list
            uv, uw = dense_sweep_u(p, grid, walls, pos, ufv, ufw, mask,
                                   st.gam, st.gam, st.wgam, st.wgam,
                                   jnp.zeros((), jnp.float32), csl)
            reac = _wall_reactions_dense(p, walls, pos, mask.astype(
                pos.dtype), st.wgam, cs_list) \
                if p.track_wall_reactions else None
            return uv, uw, dgam, reac, ws
    else:
        raise ValueError(f"unknown backend {backend!r}")

    spins = jnp.asarray([w[4] for w in walls if w[0] == "rotbox"],
                        jnp.float32)
    R = n_rotbox(walls)
    dyn_mode = p.blade_inertia > 0.0
    if dyn_mode and not R:
        raise ValueError("blade_inertia set but no rotbox walls")
    if dyn_mode and backend not in ("half", "xla"):
        raise ValueError("dynamic blades: use the 'half' or 'xla' backend")

    def step(pos, vel, omega, theta, wspin):
        ufree = vel + p.dt * gvec
        cs_list = wall_cs_list(walls, theta) if R else None
        field = to_cells(grid, capacity, pos, ufree, omega)
        if dyn_mode:
            wspin_free = wspin + p.dt * p.blade_torque / p.blade_inertia
            uv_f, uw_f, dgam, reac, ws = solve(field, cs_list, theta,
                                               wspin_free)
            theta2 = theta + p.dt * ws
        else:
            uv_f, uw_f, dgam, reac, _ = solve(field, cs_list)
            ws = wspin
            theta2 = theta + p.dt * spins
        vel2, om2 = from_cells(field, uv_f, uw_f)
        pos2 = pos + p.dt * vel2
        # partner-budget saturation is an overflow, not a silent pair drop
        # (P=3 at the blade scene measurably changed the blade torque —
        # the budget must be assert-guarded like cell capacity)
        ov = field.overflow
        pov = getattr(solve, "partner_overflow", None)
        if pov is not None:
            ov = jnp.maximum(ov, pov.astype(ov.dtype))
        return pos2, vel2, om2, theta2, ws, ov, dgam, reac

    step_jit = jax.jit(step)

    def advance(pos, vel, omega, n_steps: int, theta0=None, wspin0=None):
        ovf = jnp.zeros((), jnp.int32)
        dgam, reac = None, None
        theta = (jnp.zeros((R,), jnp.float32)
                 if theta0 is None else jnp.asarray(theta0, jnp.float32))
        wspin = (spins if wspin0 is None
                 else jnp.asarray(wspin0, jnp.float32))
        for _ in range(n_steps):
            pos, vel, omega, theta, wspin, ov, dgam, reac = step_jit(
                pos, vel, omega, theta, wspin)
            ovf = jnp.maximum(ovf, ov)
        extras = ()
        if p.track_residual:
            extras += (dgam,)               # last step's ‖Δγ‖ series
        if p.track_wall_reactions:
            extras += (reac,)               # last step's (force, torque)
        if dyn_mode:
            extras += (wspin,)              # blade angular velocities
        return (pos, vel, omega, ovf) + extras

    return advance


# dense-lattice wall γ layout differs between backends (the dense backend
# keeps (..., C, W, 3) for convenience); only the pencil/Pallas layout is
# performance-relevant.
