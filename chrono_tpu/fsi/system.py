"""Coupled fluid–solid interaction system.

Counterpart of the reference's ``ChFsiSystem::DoStepDynamics``
(/root/reference/src/chrono_fsi/ChFsiSystem.cpp:264-303: MBS advanced on a CPU
thread concurrently with the GPU fluid, then explicit force/state exchange).
On TPU there is no CPU/GPU split to hide — the MBS is a few hundred DOFs — so
the entire coupled step is ONE jitted program:

    update rigid BCE markers from body states → fluid substeps (markers move
    kinematically) → BCE force/torque reduction → MBS step with fluid loads.

Force coupling remains explicit once per outer step, like the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

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
from chrono_tpu.fsi.sph.state import SPHParams, SPHState, RIGID_BCE
from chrono_tpu.fsi.sph.system import rebuild_sph_neighbors, sph_substep
from chrono_tpu.fsi.sph import wcsph
from chrono_tpu.fsi import bce


@pytree_dataclass
class FSIState:
    bodies: BodyState
    fluid: SPHState
    time: jnp.ndarray


def fsi_step(model: Model, params: SPHParams, grid: GridSpec,
             state: FSIState, h_fluid, n_fluid_substeps: int,
             mbs_settings: SolverSettings = SolverSettings(solver="direct"),
             scheme: str = "wcsph"):
    """One coupled outer step = ``n_fluid_substeps`` fluid steps + 1 MBS step.

    Outer step size = n_fluid_substeps · h_fluid (the reference's
    m_step_CFD/m_step_MBD ratio).  ``scheme``: "wcsph" (explicit, acoustic
    dt) or "isph" (implicit pressure projection, larger dt — reference
    IMPLICIT_SPH).
    """
    bodies, fluid = state.bodies, state.fluid

    # 1. marker kinematics from current body states
    pos, vel = bce.update_rigid_markers(
        fluid.pos, fluid.vel, fluid.kind, fluid.body_id, fluid.bce_local,
        bodies.x, bodies.q, bodies.v, bodies.w)
    fluid = fluid.replace(pos=pos, vel=vel)

    # 2. fluid advance (markers held kinematically fixed during substeps)
    fluid = rebuild_sph_neighbors(params, grid, fluid)

    if scheme == "isph":
        from chrono_tpu.fsi.sph import isph as isph_mod

        def fstep_i(carry, _):
            f, _p = carry
            f2, p2, _ = isph_mod.isph_substep(params, grid, f)
            return (f2, p2), None

        p0 = jnp.zeros((fluid.n,), fluid.pos.dtype)
        (fluid, p_last), _ = lax.scan(fstep_i, (fluid, p0), None,
                                      length=n_fluid_substeps)
        dv_dt = isph_mod.isph_solid_reaction(params, grid, fluid, p_last)
    else:
        def fstep(f, _):
            return sph_substep(params, grid, f), None

        fluid, _ = lax.scan(fstep, fluid, None, length=n_fluid_substeps)

        # fluid reaction on bodies: one RHS evaluation at the final state
        _, dv_dt = wcsph.wcsph_rhs(
            params, grid, fluid.pos, fluid.vel, fluid.rho, fluid.kind,
            fluid.nbr.idx, fluid.nbr.valid)
    f_bodies, tau_bodies_world = bce.rigid_body_forces(
        params, dv_dt, fluid.kind, fluid.body_id, fluid.pos, bodies.x,
        model.n_bodies)
    tau_local = Q.qrotate_inv(bodies.q, tau_bodies_world)

    # 4. MBS step over the outer interval with fluid loads
    h_outer = h_fluid * n_fluid_substeps
    bodies, info = step_euler_implicit_linearized(
        model, bodies, state.time, h_outer, mbs_settings,
        f_ext=f_bodies, tau_ext=tau_local)

    return FSIState(bodies=bodies, fluid=fluid,
                    time=state.time + h_outer), info


def make_fsi_advance_fn(model: Model, params: SPHParams, grid: GridSpec,
                        n_fluid_substeps: int = 1,
                        mbs_settings: SolverSettings = SolverSettings(
                            solver="direct"),
                        scheme: str = "wcsph"):
    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: FSIState, n_outer: int):
        def body(s, _):
            s, info = fsi_step(model, params, grid, s, params.dt,
                               n_fluid_substeps, mbs_settings, scheme)
            return s, None

        state, _ = lax.scan(body, state, None, length=n_outer)
        return state

    return advance
