"""The granular DEM system: state, stepping, and the user-facing wrapper.

Capability-equivalent of the reference's ``ChSystemDem``
(/root/reference/src/chrono_dem/physics/ChSystemDem.h — create particles, set
material/friction/rolling modes, add analytic BCs, ``AdvanceSimulation``,
checkpoint), re-architected for TPU: the whole advance loop — periodic neighbor
rebuild (with friction-history migration), force evaluation, integration — is a
single jitted program under nested ``lax.scan``; a million particles never
leave the device between host calls.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.collision.cell_list import GridSpec, cell_occupancy_max
from chrono_tpu.dem.params import DEMParams, DEMMaterial, suggest_step_size
from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries
from chrono_tpu.dem.neighbors import (
    NeighborList, build_neighbor_list, migrate_history,
)
from chrono_tpu.dem.forces import particle_forces, wall_forces


@pytree_dataclass
class DEMState:
    """Full dynamic state; a valid checkpoint by itself (friction history
    included, like the reference's checkpoint files — ChSystemDem.h:311)."""

    pos: Array          # (N, 3)
    vel: Array          # (N, 3)
    omega: Array        # (N, 3) world frame
    nbr: NeighborList
    tan_disp: Array     # (N, K, 3) pair friction history
    bc_tan_disp: Array  # (N, B, 3) wall friction history
    time: Array         # ()
    acc_old: Array = None    # (N,3) previous accelerations (Chung only)
    alpha_old: Array = None
    roll_disp: Array = None  # (N,K,3) rolling-spring history (elastic_plastic)
    bc_roll_disp: Array = None  # (N,B,3) wall rolling history

    @property
    def n(self) -> int:
        return self.pos.shape[0]


def _n_walls(bcs: DEMBoundaries) -> int:
    n = 0
    for part in (bcs.planes, bcs.cylinders, bcs.spheres, bcs.cones,
                 bcs.wheels):
        if part is not None:
            n += jax.tree_util.tree_leaves(part)[0].shape[0]
    return n


def make_dem_state(params: DEMParams, bcs: DEMBoundaries, pos, vel=None,
                   omega=None, dtype=jnp.float32) -> DEMState:
    pos = jnp.asarray(pos, dtype)
    n = pos.shape[0]
    K = params.max_neighbors
    return DEMState(
        pos=pos,
        vel=jnp.zeros((n, 3), dtype) if vel is None else jnp.asarray(vel, dtype),
        omega=jnp.zeros((n, 3), dtype) if omega is None else jnp.asarray(omega, dtype),
        nbr=NeighborList(idx=jnp.full((n, K), -1, jnp.int32),
                         valid=jnp.zeros((n, K), bool),
                         overflow=jnp.zeros((), jnp.int32)),
        tan_disp=jnp.zeros((n, K, 3), dtype),
        bc_tan_disp=jnp.zeros((n, _n_walls(bcs), 3), dtype),
        time=jnp.zeros((), dtype),
        acc_old=(jnp.zeros((n, 3), dtype)
                 if params.integrator == "chung" else None),
        alpha_old=(jnp.zeros((n, 3), dtype)
                   if params.integrator == "chung" else None),
        roll_disp=(jnp.zeros((n, K, 3), dtype)
                   if params.rolling_mode == "elastic_plastic" else None),
        bc_roll_disp=(jnp.zeros((n, _n_walls(bcs), 3), dtype)
                      if params.rolling_mode == "elastic_plastic" else None),
    )


def rebuild_neighbors(params: DEMParams, grid: GridSpec,
                      state: DEMState) -> DEMState:
    cutoff = 2.0 * float(params_radius_static(params)) * (1.0 + params.skin)
    new_nbr = build_neighbor_list(grid, state.pos, cutoff,
                                  params.max_per_cell, params.max_neighbors)
    new_hist = migrate_history(state.nbr, state.tan_disp, new_nbr)
    new_roll = (migrate_history(state.nbr, state.roll_disp, new_nbr)
                if state.roll_disp is not None else None)
    state = state.replace(nbr=new_nbr, tan_disp=new_hist)
    if new_roll is not None:
        state = state.replace(roll_disp=new_roll)
    return state


def params_radius_static(params: DEMParams) -> float:
    # radius participates in the static cutoff; accept python float or 0-d array
    r = params.radius
    try:
        return float(r)
    except TypeError:  # traced — fall back to runtime value (cutoff stays traced)
        return r


def dem_substep(params: DEMParams, bcs: DEMBoundaries,
                state: DEMState, return_reactions: bool = False) -> DEMState:
    """One force+integrate step with the current neighbor list.

    With ``return_reactions=True`` returns ``(state, (bc_force, bc_torque0))``
    — per-wall reaction force and torque about the origin (the reference's
    GetBCReactionForces observation), which moving-obstacle couplings
    (GranularTerrain wheels) feed back to the MBS."""
    if params.rolling_mode == "elastic_plastic":
        f_pp, tau_pp, xi_pp, xi_roll = particle_forces(
            params, state.pos, state.vel, state.omega,
            state.nbr.idx, state.nbr.valid, state.tan_disp, state.roll_disp)
    else:
        f_pp, tau_pp, xi_pp = particle_forces(
            params, state.pos, state.vel, state.omega,
            state.nbr.idx, state.nbr.valid, state.tan_disp)
        xi_roll = None
    if params.rolling_mode == "elastic_plastic":
        f_w, tau_w, xi_w, react, xi_w_roll = wall_forces(
            params, bcs, state.pos, state.vel, state.omega,
            state.bc_tan_disp, state.bc_roll_disp)
    else:
        f_w, tau_w, xi_w, react = wall_forces(
            params, bcs, state.pos, state.vel, state.omega,
            state.bc_tan_disp)
        xi_w_roll = None

    inv_m = 1.0 / params.mass
    inv_I = 1.0 / params.inertia
    acc = (f_pp + f_w) * inv_m + params.gravity[None, :]
    alpha = (tau_pp + tau_w) * inv_I
    h = params.dt

    if params.integrator == "forward_euler":
        pos = state.pos + h * state.vel
        vel = state.vel + h * acc
        omega = state.omega + h * alpha
    elif params.integrator == "centered_difference":
        # leapfrog/velocity-semi-implicit: kick then drift (the reference's
        # CENTERED_DIFFERENCE, ChDemDefines.h:42)
        vel = state.vel + h * acc
        omega = state.omega + h * alpha
        pos = state.pos + h * vel
    elif params.integrator == "extended_taylor":
        # 2nd-order Taylor position, Euler velocity (the reference's
        # EXTENDED_TAYLOR, ChDemSMC.cuh:1312 "falls through to Euler" for v)
        pos = state.pos + h * state.vel + 0.5 * h * h * acc
        vel = state.vel + h * acc
        omega = state.omega + h * alpha
    elif params.integrator == "chung":
        # Chung–Lee 2nd-order two-step scheme (ChDemSMC.cuh:1261-1272):
        # v += h(3/2 a − 1/2 a_old); x += h v_old + h²(28/27 a + (1/2−28/27) a_old)
        gam, gam_h = 1.5, -0.5
        beta = 28.0 / 27.0
        beta_h = 0.5 - beta
        a_old = state.acc_old
        al_old = state.alpha_old
        vel = state.vel + h * (gam * acc + gam_h * a_old)
        omega = state.omega + h * (gam * alpha + gam_h * al_old)
        pos = state.pos + h * state.vel + h * h * (beta * acc
                                                   + beta_h * a_old)
    else:
        raise ValueError(f"unknown integrator {params.integrator!r}")

    new = state.replace(pos=pos, vel=vel, omega=omega,
                        tan_disp=xi_pp, bc_tan_disp=xi_w,
                        time=state.time + h)
    if params.integrator == "chung":
        new = new.replace(acc_old=acc, alpha_old=alpha)
    if xi_roll is not None:
        new = new.replace(roll_disp=xi_roll, bc_roll_disp=xi_w_roll)
    if return_reactions:
        return new, react
    return new


def make_advance_fn(params: DEMParams, bcs: DEMBoundaries, grid: GridSpec):
    """Build a jitted ``advance(state, n_cycles) -> state`` function.

    One cycle = neighbor rebuild + ``rebuild_every`` substeps (the reference's
    ``num_proximity_search_steps`` pattern from FSI applied to DEM).  Total
    simulated time per call: ``n_cycles · rebuild_every · dt``.
    """

    def one_cycle(state: DEMState, _):
        state = rebuild_neighbors(params, grid, state)
        def inner(st, __):
            return dem_substep(params, bcs, st), None
        state, _ = lax.scan(inner, state, None, length=params.rebuild_every)
        return state, state.nbr.overflow

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: DEMState, n_cycles: int):
        state, overflows = lax.scan(one_cycle, state, None, length=n_cycles)
        return state, overflows.max()

    return advance


class DEMSystem:
    """Host-side convenience wrapper (the ergonomic ChSystemDem analogue).

    Example::

        sys = DEMSystem(radius=0.01, density=2500, box=((0,0,0),(1,1,1)))
        sys.set_material(youngs=5e7, restitution=0.5, mu_s=0.5)
        sys.create_particles(points)           # (N,3) array
        sys.advance(0.5)                       # simulate 0.5 s
        pos = sys.positions
    """

    def __init__(self, radius, density=2500.0, box=((0, 0, 0), (1, 1, 1)),
                 dt=None, max_neighbors=16, max_per_cell=8, rebuild_every=8,
                 skin=0.2, integrator="centered_difference",
                 friction_mode="multi_step", rolling_mode="none",
                 force_model="mat_based",
                 gravity=(0, 0, -9.81), dtype=jnp.float32):
        self.dtype = dtype
        mass = density * 4.0 / 3.0 * math.pi * radius**3
        self._mat = dict(youngs=1e7, poisson=0.3, restitution=0.5,
                         mu_s=0.5, mu_r=0.0, mu_sp=0.0, adhesion=0.0)
        self._wall_mat = dict(self._mat)
        self._radius = float(radius)
        self._mass = float(mass)
        self._gravity = gravity
        self._box = (np.asarray(box[0], float), np.asarray(box[1], float))
        self._static = dict(max_neighbors=max_neighbors,
                            max_per_cell=max_per_cell,
                            rebuild_every=rebuild_every, skin=skin,
                            integrator=integrator,
                            friction_mode=friction_mode,
                            rolling_mode=rolling_mode,
                            force_model=force_model)
        self._dt = dt
        self._extra_bcs = dict(planes=None, cylinders=None, spheres=None,
                               cones=None)
        self.state: Optional[DEMState] = None
        self._advance = None

    def set_material(self, **kw):
        self._mat.update(kw)

    def set_wall_material(self, **kw):
        self._wall_mat.update(kw)

    def retune(self, material=None, wall_material=None, **static_kw):
        """Re-derive params (and, if statics changed, the compiled advance)
        without discarding particle state — the role of the reference's
        post-checkpoint setters (SetStaticFrictionCoeff_SPH2SPH etc. in
        utest_DEM_pyramid.cpp before Initialize())."""
        if material:
            self._mat.update(material)
        if wall_material:
            self._wall_mat.update(wall_material)
        self._static.update(static_kw)
        state = self.state
        self._build()
        if state is not None:
            # wall-history buffers are sized (N, n_walls, 3); resize (zeros)
            # if the boundary set changed — a configuration event, same as
            # the reference resetting contact maps on Initialize()
            from chrono_tpu.dem.bc import DEMBoundaries  # noqa: F401
            n = state.pos.shape[0]
            nw = self.params and _n_walls(self.bcs)
            if state.bc_tan_disp.shape[1] != nw:
                state = state.replace(
                    bc_tan_disp=jnp.zeros((n, nw, 3), self.dtype))
                if state.bc_roll_disp is not None:
                    state = state.replace(
                        bc_roll_disp=jnp.zeros((n, nw, 3), self.dtype))
            if (self._static.get("rolling_mode") == "elastic_plastic"
                    and state.roll_disp is None):
                state = state.replace(
                    roll_disp=jnp.zeros_like(state.tan_disp),
                    bc_roll_disp=jnp.zeros((n, nw, 3), self.dtype))
            if (self._static.get("rolling_mode") != "elastic_plastic"
                    and state.bc_roll_disp is not None
                    and state.bc_roll_disp.shape[1] != nw):
                state = state.replace(bc_roll_disp=None)
            self.state = state

    def set_boundaries(self, planes=None, cylinders=None, spheres=None,
                       cones=None):
        self._extra_bcs = dict(planes=planes, cylinders=cylinders,
                               spheres=spheres, cones=cones)

    def _build(self):
        dt = self._dt
        mat = DEMMaterial(**{k: jnp.asarray(v, self.dtype)
                             for k, v in self._mat.items()})
        wall = DEMMaterial(**{k: jnp.asarray(v, self.dtype)
                              for k, v in self._wall_mat.items()})
        params = DEMParams(
            radius=jnp.asarray(self._radius, self.dtype),
            mass=jnp.asarray(self._mass, self.dtype),
            material=mat, wall_material=wall,
            gravity=jnp.asarray(self._gravity, self.dtype),
            dt=jnp.asarray(1e-5 if dt is None else dt, self.dtype),
            **self._static,
        )
        if dt is None:
            params = params.replace(
                dt=jnp.asarray(suggest_step_size(params), self.dtype))
        lo, hi = self._box
        cell = 2.0 * self._radius * (1.0 + self._static["skin"])
        # one guard layer on each side (see cell_list.neighbor_candidates)
        dims = tuple(int(np.ceil((hi[i] - lo[i]) / cell)) + 2 for i in range(3))
        grid = GridSpec(origin=tuple(lo - cell), cell_size=cell, dims=dims)

        box_bc = box_boundaries(lo, hi, self.dtype)
        planes = box_bc
        if self._extra_bcs["planes"] is not None:
            ep = self._extra_bcs["planes"]
            planes = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), box_bc, ep)
        bcs = DEMBoundaries(planes=planes,
                            cylinders=self._extra_bcs["cylinders"],
                            spheres=self._extra_bcs["spheres"],
                            cones=self._extra_bcs["cones"])
        self.params, self.bcs, self.grid = params, bcs, grid
        self._advance = make_advance_fn(params, bcs, grid)

    def create_particles(self, points, vel=None):
        self._build()
        self.state = make_dem_state(self.params, self.bcs, points, vel,
                                    dtype=self.dtype)

    @property
    def dt(self) -> float:
        return float(self.params.dt)

    @property
    def positions(self):
        return np.asarray(self.state.pos)

    @property
    def velocities(self):
        return np.asarray(self.state.vel)

    def advance(self, duration: float):
        """Simulate ``duration`` seconds (rounded to whole rebuild cycles)."""
        cycle_dt = float(self.params.dt) * self._static["rebuild_every"]
        n_cycles = max(1, int(round(duration / cycle_dt)))
        self.state, overflow = self._advance(self.state, n_cycles)
        if int(overflow) > 0:
            raise RuntimeError(
                f"neighbor-list overflow: {int(overflow)} neighbors dropped; "
                f"increase max_neighbors (occupancy check: "
                f"{int(cell_occupancy_max(self.grid, self.state.pos))}/cell)")
        return self.state

    def kinetic_energy(self) -> float:
        v2 = float(jnp.sum(self.state.vel**2))
        w2 = float(jnp.sum(self.state.omega**2))
        return 0.5 * self._mass * v2 + 0.5 * float(self.params.inertia) * w2
