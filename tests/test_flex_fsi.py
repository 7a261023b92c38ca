"""Flexible-shell FSI: water column resting on a clamped elastic plate.

Role of the reference's flexible BCE validation (SphBceManager.cu Flex2D
path): the plate must carry the column's weight (force balance through the
marker reduction) and bend by the thin-plate static estimate.
"""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.fsi.sph import SPHParams, make_sph_state, FLUID
from chrono_tpu.fsi.flex import (
    shell_bce_markers, make_flex_fsi_advance_fn, FlexFSIState,
    flex_marker_positions, flex_nodal_forces, FlexAttach2D,
)
from chrono_tpu.fea.shell import ShellBuilder, gravity_loads
from chrono_tpu.fsi.bce import box_wall_markers
from chrono_tpu.utils.samplers import grid_sample_box


def test_nodal_force_spread_is_consistent():
    """Virtual work: total spread nodal force = total marker force, and a
    uniform marker force field produces no director moments on a flat plate."""
    bld = ShellBuilder()
    ids = bld.add_plate((0, 0, 0), 3, 2, 0.3, 0.2, 0.01, 1e9, 0.3, 1000.0)
    mesh, q = bld.finalize()
    att, pos = shell_bce_markers(mesh, q, spacing=0.05, layers=1)
    M = att.elem.shape[0]
    f = np.zeros((M, 3))
    f[:, 2] = -2.0
    out = np.asarray(flex_nodal_forces(mesh, att, jnp.asarray(f),
                                       q.shape[0]))
    np.testing.assert_allclose(out[:, 2].sum(), -2.0 * M, rtol=1e-5)
    np.testing.assert_allclose(out[:, 0:2].sum(), 0.0, atol=1e-6)
    assert np.abs(out[:, 3:6]).max() < 1e-6   # ζ=0 sheet → no moments


def test_water_column_on_clamped_plate():
    d0 = 0.015
    Lx, Ly = 0.3, 0.09
    Hw = 0.06                                 # water depth
    t, E_, nu, rho_s = 0.01, 2e9, 0.3, 1500.0

    bld = ShellBuilder()
    ids = bld.add_plate((0, 0, 0), 6, 2, Lx, Ly, t, E_, nu, rho_s,
                        damping=0.05, fix_edge="x0")
    mesh, q0 = bld.finalize()
    att, flex_pts = shell_bce_markers(mesh, q0, spacing=d0, layers=1)

    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1000.0), mu=jnp.asarray(0.1),
        c_s=jnp.asarray(10.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(3e-4), viscosity_model="laminar",
        max_neighbors=96, max_per_cell=80, rebuild_every=4, xsph_eps=0.2)

    fluid = grid_sample_box((0, 0, d0), (Lx, Ly, d0 + Hw), d0)
    # side walls only (the plate is the floor)
    walls = []
    for lo, hi in (((-3 * d0, 0, -3 * d0), (0, Ly, Hw + 6 * d0)),
                   ((Lx, 0, -3 * d0), (Lx + 3 * d0, Ly, Hw + 6 * d0)),
                   ((0, -3 * d0, -3 * d0), (Lx, 0, Hw + 6 * d0)),
                   ((0, Ly, -3 * d0), (Lx, Ly + 3 * d0, Hw + 6 * d0))):
        walls.append(grid_sample_box(lo, hi, d0))
    walls = np.concatenate(walls)

    cell = 2.4 * 1.2 * d0
    margin = 5 * d0
    dims = (int(np.ceil((Lx + 2 * margin) / cell)) + 1,
            int(np.ceil((Ly + 2 * margin) / cell)) + 1,
            int(np.ceil((Hw + 0.1 + 2 * margin) / cell)) + 1)
    grid = GridSpec(origin=(-margin, -margin, -margin - 0.05),
                    cell_size=cell, dims=dims)

    state_f = make_sph_state(params, fluid, boundary_pts=walls,
                             flex_pts=flex_pts)
    # solid gravity as external nodal load (plate's own weight)
    n_nodes = q0.shape[0]
    f_grav = gravity_loads(mesh, n_nodes, (0, 0, -9.81))

    adv = make_flex_fsi_advance_fn(mesh, att, params, grid,
                                   n_substeps=params.rebuild_every,
                                   f_ext_solid=f_grav)
    state = FlexFSIState(fluid=state_f, q=q0, qd=jnp.zeros_like(q0),
                         qdd=jnp.zeros_like(q0), time=jnp.zeros(()))
    state = adv(state, 120)
    assert np.isfinite(np.asarray(state.q)).all()
    assert np.isfinite(np.asarray(state.fluid.pos)).all()

    tip = np.asarray(state.q)[np.asarray(ids[-1, :]), 2]
    w_tip = -tip.mean()
    # uniform-load cantilever estimate: q_load = (ρ_w H + ρ_s t) g
    q_load = (1000.0 * Hw + rho_s * t) * 9.81
    w_ref = q_load * Lx**4 * 12 / (8 * E_ * t**3)
    assert 0.3 * w_ref < w_tip < 2.5 * w_ref, (w_tip, w_ref)
    # fluid stays on the plate (no mass blow-through): fluid z above plate
    kind = np.asarray(state.fluid.kind)
    zf = np.asarray(state.fluid.pos[:, 2])[kind == FLUID]
    assert (zf > -0.06).mean() > 0.98
