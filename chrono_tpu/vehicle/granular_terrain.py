"""Granular (DEM) terrain patch coupled to a multibody vehicle.

The GranularTerrain role of the reference
(/root/reference/src/chrono_vehicle/terrain/GranularTerrain.h — a particle
patch the vehicle's wheels interact with, built on the data-parallel
many-body path) rebuilt TPU-native: the bed is the chrono_tpu DEM system
(Hertz–Mindlin, history friction), wheels enter as analytic moving-cylinder
boundary conditions (dem.bc.WheelBCs — pose/velocity leaves traced, no
recompile per step) and their reaction forces/torques are reduced inside the
same jitted program that advances the vehicle MBS.

One outer step = wheel BC kinematics from body states → neighbor rebuild →
``n_substeps`` DEM substeps with per-substep reaction accumulation → mean
wheel loads → one implicit-linearized MBS step over the outer interval.
Structure mirrors fsi.crm_terrain (the CRM flavor of the same coupling).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics.body import BodyState
from chrono_tpu.physics.system import (
    Model, SolverSettings, step_euler_implicit_linearized,
)
from chrono_tpu.dem.params import DEMParams
from chrono_tpu.dem.bc import DEMBoundaries, WheelBCs, box_boundaries
from chrono_tpu.dem.system import (
    DEMState, make_dem_state, rebuild_neighbors, dem_substep,
)


def make_granular_terrain_state(params: DEMParams, size, depth,
                                wheel_radius, wheel_width, n_wheels,
                                carve_fn=None, dtype=jnp.float32):
    """Box-bed granular patch with open top + wheel BC slots.

    ``size``: (Lx, Ly); ``depth``: bed depth (z from 0).  ``carve_fn(pts) →
    keep`` removes particles (pre-sunk wheels).  Returns
    ``(DEMState, GridSpec, DEMBoundaries)`` — the boundaries already contain
    ``n_wheels`` wheel slots (poses are overwritten every outer step) so the
    wall-friction history is sized once.
    """
    from chrono_tpu.utils.samplers import hcp_sample_box

    r = float(params.radius)
    Lx, Ly = float(size[0]), float(size[1])
    H = float(depth)
    pts = hcp_sample_box((0.0, 0.0, 0.0), (Lx, Ly, H), r * 1.005)
    if carve_fn is not None:
        pts = pts[np.asarray(carve_fn(pts), bool)]

    walls = box_boundaries((0.0, 0.0, 0.0), (Lx, Ly, H + 40 * r), dtype)
    # drop the top (−z) plane: open bed.  box_boundaries emits [+x,+y,+z
    # (floor/lo) then −x,−y,−z (hi)]; the top is the last row.
    import jax.tree_util as jtu
    walls = jtu.tree_map(lambda x: x[:5], walls)
    B = int(n_wheels)
    wheels = WheelBCs(
        center=jnp.full((B, 3), 1e6, dtype), axis=jnp.tile(
            jnp.asarray([[0.0, 1.0, 0.0]], dtype), (B, 1)),
        radius=jnp.full((B,), float(wheel_radius), dtype),
        half_width=jnp.full((B,), float(wheel_width) / 2, dtype),
        vel=jnp.zeros((B, 3), dtype), omega=jnp.zeros((B, 3), dtype))
    bcs = DEMBoundaries(planes=walls, wheels=wheels)
    state = make_dem_state(params, bcs, pts, dtype=dtype)

    cutoff = 2 * r * (1.0 + params.skin)
    margin = 4 * r
    zmax = H + wheel_radius * 2 + 20 * r
    dims = (int(np.ceil((Lx + 2 * margin) / cutoff)),
            int(np.ceil((Ly + 2 * margin) / cutoff)),
            int(np.ceil((zmax + 2 * margin) / cutoff)))
    grid = GridSpec(origin=(-margin, -margin, -margin), cell_size=cutoff,
                    dims=dims, periodic=(False, False, False))
    return state, grid, bcs


@pytree_dataclass
class GranularFSIState:
    bodies: BodyState
    terrain: DEMState
    time: jnp.ndarray


def granular_step(model: Model, params: DEMParams, bcs: DEMBoundaries,
                  grid: GridSpec, state: GranularFSIState, n_substeps: int,
                  wheel_bodies,
                  mbs_settings: SolverSettings = SolverSettings(
                      solver="direct"),
                  f_ext_fn=None):
    """One coupled outer step.  ``wheel_bodies``: (B,) body indices whose
    poses drive the wheel BCs (order = WheelBCs rows = LAST B wall slots).
    Returns (state, overflow, info)."""
    bodies, terrain = state.bodies, state.terrain
    wb = jnp.asarray(wheel_bodies)

    axis_w = Q.qrotate(bodies.q[wb], jnp.asarray([0.0, 1.0, 0.0]))
    wheels = bcs.wheels.replace(
        center=bodies.x[wb], axis=axis_w, vel=bodies.v[wb],
        omega=Q.qrotate(bodies.q[wb], bodies.w[wb]))
    bcs_t = bcs.replace(wheels=wheels)
    B = wheels.center.shape[0]

    terrain = rebuild_neighbors(params, grid, terrain)

    def inner(carry, _):
        st, acc_f, acc_t = carry
        st, (rf, rt0) = dem_substep(params, bcs_t, st,
                                    return_reactions=True)
        return (st, acc_f + rf[-B:], acc_t + rt0[-B:]), None

    zero = jnp.zeros((B, 3), terrain.pos.dtype)
    (terrain, sum_f, sum_t0), _ = lax.scan(
        inner, (terrain, zero, zero), None, length=n_substeps)
    f_wheel = sum_f / n_substeps
    # torque about each wheel center: τ_c = τ_0 − c × F
    tau_wheel = sum_t0 / n_substeps - jnp.cross(wheels.center, f_wheel)

    f_b = jnp.zeros((model.n_bodies, 3)).at[wb].add(f_wheel)
    tau_b = jnp.zeros((model.n_bodies, 3)).at[wb].add(
        Q.qrotate_inv(bodies.q[wb], tau_wheel))

    h_outer = params.dt * n_substeps
    if f_ext_fn is not None:
        f_drv, tau_drv = f_ext_fn(state.time, bodies)
        f_b, tau_b = f_b + f_drv, tau_b + tau_drv
    bodies, info = step_euler_implicit_linearized(
        model, bodies, state.time, h_outer, mbs_settings,
        f_ext=f_b, tau_ext=tau_b)

    return (GranularFSIState(bodies=bodies, terrain=terrain,
                             time=state.time + h_outer),
            terrain.nbr.overflow, info)


def make_granular_advance_fn(model: Model, params: DEMParams,
                             bcs: DEMBoundaries, grid: GridSpec,
                             n_substeps: int, wheel_bodies,
                             mbs_settings: SolverSettings = SolverSettings(
                                 solver="direct"),
                             f_ext_fn=None):
    """Jitted ``advance(state, n_outer) -> (state, overflow)``."""

    def outer(carry, _):
        st, ovf = carry
        st, o, _ = granular_step(model, params, bcs, grid, st, n_substeps,
                                 wheel_bodies, mbs_settings, f_ext_fn)
        return (st, jnp.maximum(ovf, o)), None

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: GranularFSIState, n_outer: int):
        (state, ovf), _ = lax.scan(
            outer, (state, jnp.zeros((), jnp.int32)), None, length=n_outer)
        return state, ovf

    return advance
