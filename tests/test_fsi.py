"""FSI coupling tests: buoyancy (Archimedes) as the quantitative oracle.

Mirrors the reference's FSI rigid-body validation approach (BCE coupling via
marker force reduction — SphBceManager) with an analytic fixture: a floating
block whose equilibrium draft follows Archimedes' principle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.physics import SystemBuilder, SolverSettings
from chrono_tpu.fsi.sph import SPHParams, make_sph_state, suggest_sph_dt
from chrono_tpu.fsi.system import FSIState, make_fsi_advance_fn
from chrono_tpu.fsi import bce
from chrono_tpu.utils.samplers import grid_sample_box


def floating_block_setup(rho_solid=500.0):
    """A box (half the density of water) floating in a periodic-xy tank."""
    d0 = 0.02
    H = 0.3           # water depth
    W = 0.24          # tank width (periodic x,y)
    side = 0.08       # cube side
    rho0 = 1000.0

    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(rho0), mu=jnp.asarray(0.5),
        c_s=jnp.asarray(15.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), viscosity_model="laminar",
        max_neighbors=96, max_per_cell=80, rebuild_every=1,
        integrator="symplectic", xsph_eps=0.2,
    )
    params = params.replace(dt=jnp.asarray(suggest_sph_dt(params)))

    # MBS: one free rigid cube starting partially submerged near equilibrium
    m = rho_solid * side**3
    I = m * side**2 / 6.0
    b = SystemBuilder()
    draft = side * rho_solid / rho0
    z0 = H - draft + side / 2          # equilibrium: draft depth submerged
    cube = b.add_body(mass=m, inertia=(I, I, I), pos=(W / 2, W / 2, z0))
    model, bodies = b.finalize()

    # fluid block with a cavity where the cube sits
    fluid = grid_sample_box((0, 0, 0), (W, W, H), d0)
    cube_lo = np.array([W / 2 - side / 2, W / 2 - side / 2, z0 - side / 2])
    cube_hi = cube_lo + side
    pad = 0.5 * d0
    inside = np.all((fluid > cube_lo - pad) & (fluid < cube_hi + pad), axis=1)
    fluid = fluid[~inside]

    floor = grid_sample_box((0, 0, -3 * d0), (W, W, 0), d0)
    markers = bce.box_body_markers((side / 2,) * 3, d0, layers=3)
    body_ids = np.zeros(len(markers), int)  # cube is body 0

    state_f = make_sph_state(params, fluid, boundary_pts=floor,
                             rigid_pts=markers + np.array([W / 2, W / 2, z0]),
                             rigid_body_ids=body_ids, rigid_local=markers)
    # hydrostatic initial density
    z_all = state_f.pos[:, 2]
    g_eos = float(params.eos_gamma)
    B = float(params.c_s) ** 2 * rho0 / g_eos
    p_h = rho0 * 9.81 * jnp.clip(H - z_all, 0.0, None)
    state_f = state_f.replace(
        rho=jnp.where(state_f.kind == 0,
                      rho0 * (1.0 + p_h / B) ** (1.0 / g_eos), state_f.rho))

    nxc = 3
    cell = W / nxc
    grid = GridSpec(origin=(0.0, 0.0, -4 * d0), cell_size=cell,
                    dims=(nxc, nxc, int(np.ceil((2 * H) / cell)) + 1),
                    periodic=(True, True, False))
    return model, params, grid, FSIState(
        bodies=bodies, fluid=state_f, time=jnp.zeros(())), z0, H, side


class TestBuoyancy:
    def test_floating_equilibrium(self):
        model, params, grid, state, z0, H, side = floating_block_setup()
        adv = make_fsi_advance_fn(model, params, grid, n_fluid_substeps=2)
        t_sim = 0.4
        n_outer = int(t_sim / (2 * float(params.dt)))
        state = adv(state, n_outer)
        z = float(state.bodies.x[0, 2])
        vz = float(state.bodies.v[0, 2])
        # block should stay near its Archimedes equilibrium height: allow half
        # a particle spacing of drift plus residual bobbing
        assert abs(z - z0) < 0.025, f"floating height drifted: {z} vs {z0}"
        assert abs(vz) < 0.25, f"still moving fast: vz={vz}"
        # fluid must stay sane
        f = np.asarray(state.fluid.kind) == 0
        assert np.asarray(state.fluid.pos[:, 2])[f].max() < 2 * H

    def test_heavy_block_sinks(self):
        model, params, grid, state, z0, H, side = floating_block_setup(
            rho_solid=3000.0)
        adv = make_fsi_advance_fn(model, params, grid, n_fluid_substeps=2)
        n_outer = int(0.25 / (2 * float(params.dt)))
        z_start = float(state.bodies.x[0, 2])
        state = adv(state, n_outer)
        z = float(state.bodies.x[0, 2])
        assert z < z_start - 0.03, f"heavy block failed to sink: {z_start}->{z}"


class TestBCEMarkers:
    def test_marker_kinematics(self):
        from chrono_tpu.core import quaternion as Q
        from chrono_tpu.fsi.bce import update_rigid_markers
        # body spinning about z: marker velocity = ω × r
        body_x = jnp.asarray([[0.0, 0.0, 0.0]])
        body_q = Q.qidentity((1,))
        body_v = jnp.asarray([[0.0, 0.0, 0.0]])
        body_w = jnp.asarray([[0.0, 0.0, 2.0]])
        local = jnp.asarray([[1.0, 0.0, 0.0]])
        pos, vel = update_rigid_markers(
            jnp.zeros((1, 3)), jnp.zeros((1, 3)),
            jnp.asarray([2], jnp.int32), jnp.asarray([0], jnp.int32),
            local, body_x, body_q, body_v, body_w)
        np.testing.assert_allclose(np.asarray(pos[0]), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(vel[0]), [0, 2, 0], atol=1e-6)

    def test_generators_no_nan(self):
        for pts in [bce.sphere_body_markers(0.1, 0.02),
                    bce.box_body_markers((0.1, 0.1, 0.1), 0.02),
                    bce.cylinder_body_markers(0.1, 0.2, 0.02),
                    bce.box_wall_markers((0, 0, 0), (1, 1, 0.5), 0.05)]:
            assert len(pts) > 0 and np.isfinite(pts).all()


def test_heightmap_scene_builder():
    """Heightmap construction (ChFsiProblemSPH.h:351): BCE hugs the surface
    from below, fluid fills a uniform depth above it."""
    import numpy as np
    from chrono_tpu.fsi.bce import heightmap_markers

    nx, ny, dx = 21, 11, 0.1
    xs = np.arange(nx) * dx
    H = 0.2 + 0.1 * np.sin(2 * np.pi * xs / 2.0)[:, None] * np.ones((1, ny))
    bce, fluid = heightmap_markers(H, (0.0, 0.0), dx, spacing=0.05,
                                   layers=3, depth=0.3)
    assert bce.shape[1] == 3 and fluid.shape[1] == 3
    # every BCE marker sits below the local surface; every fluid above it
    def surf(p):
        return np.interp(p[:, 0], xs, H[:, 0])
    assert (bce[:, 2] < surf(bce) + 1e-9).all()
    assert (fluid[:, 2] > surf(fluid) - 1e-9).all()
    assert (fluid[:, 2] < surf(fluid) + 0.3 + 1e-9).all()
    # fluid fill is ~uniform depth: count per column is constant
    key = np.round(fluid[:, :2] / 0.05).astype(int)
    _, counts = np.unique(key, axis=0, return_counts=True)
    assert counts.min() == counts.max() == 6


def test_cylindrical_container_hydrostatic():
    """ChFsiProblemCylindrical role: water column in a cylindrical container
    stays inside the wall and reaches hydrostatic density stratification."""
    from chrono_tpu.fsi.bce import (cylinder_container_markers,
                                    cylinder_fluid_fill)
    from chrono_tpu.fsi.sph.system import make_sph_advance_fn

    d0 = 0.02
    R, depth = 0.12, 0.13
    rho0 = 1000.0
    walls = cylinder_container_markers(R, 0.3, d0)
    fluid = cylinder_fluid_fill(R, depth, d0)
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(rho0), mu=jnp.asarray(0.5),
        c_s=jnp.asarray(15.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), viscosity_model="laminar",
        max_neighbors=96, max_per_cell=80, rebuild_every=2,
        integrator="symplectic", xsph_eps=0.2)
    params = params.replace(dt=jnp.asarray(suggest_sph_dt(params)))
    state = make_sph_state(params, fluid, boundary_pts=walls)
    ext = R + 4 * d0
    cell = 2.4 * d0
    nxy = int(np.ceil(2 * ext / cell))
    grid = GridSpec(origin=(-ext, -ext, -4 * d0), cell_size=cell,
                    dims=(nxy, nxy, int(np.ceil(0.45 / cell))))
    advance = make_sph_advance_fn(params, grid)
    state, ovf = advance(state, 220)
    assert int(ovf) == 0
    nf = len(fluid)
    pos = np.asarray(state.pos[:nf])
    assert np.isfinite(pos).all()
    # fluid stayed inside the container (wall holds)
    rr = np.hypot(pos[:, 0], pos[:, 1])
    assert rr.max() < R + 0.5 * d0
    assert pos[:, 2].min() > -1.5 * d0
    assert pos[:, 2].max() < depth + 4 * d0
    # hydrostatic stratification: bottom density exceeds top (Tait EOS)
    rho = np.asarray(state.rho[:nf])
    zb = pos[:, 2] < 3 * d0
    zt = pos[:, 2] > depth - 3 * d0
    drho = float(np.median(rho[zb]) - np.median(rho[zt]))
    # Δρ ≈ ρ0 g h / c² = 1000·9.81·0.10/225 ≈ 4.4 kg/m³
    assert 2.0 < drho < 12.0, drho
