"""CRM terrain: rigid-wheel coupling, active domains, moving patch.

Mirrors the reference's vehicle-on-CRM path (CRMTerrain.h +
demo_VEH_CRMTerrain_WheeledVehicle.cpp): BCE wheel markers in elastoplastic
SPH terrain, activity boxes around the FSI solids, patch relocation.
"""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.fsi.sph.state import SPHParams, FLUID, RIGID_BCE
from chrono_tpu.fsi.sph.crm import CRMParams
from chrono_tpu.fsi.crm_terrain import (
    make_crm_terrain_state, wheel_bce_markers, CRMFSIState,
    make_crm_fsi_advance_fn,
)
from chrono_tpu.fsi.active import ActiveDomainSpec, relocate_patch_x
from chrono_tpu.physics.builder import SystemBuilder


def _params(d0=0.03, dt=1e-4):
    return SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1700.0), mu=jnp.asarray(0.0),
        c_s=jnp.asarray(40.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(dt), alpha_visc=jnp.asarray(0.1),
        kernel="cubic", max_neighbors=96, max_per_cell=64, rebuild_every=4,
    )


def _crm():
    return CRMParams(youngs=jnp.asarray(2e6), poisson=jnp.asarray(0.3),
                     friction_angle=jnp.asarray(0.7),
                     cohesion=jnp.asarray(0.0))


def _wheel_on_bed(active=None, n_outer=150):
    """Rigid wheel at its approximate static sinkage in a carved crater,
    under gravity + drive torque (the reference's wheel-on-CRM scenario,
    demo_VEH_CRMTerrain_WheeledVehicle.cpp scaled down)."""
    params, crm = _params(), _crm()
    d0 = float(params.d0)
    bed = (0.6, 0.3)
    depth = 0.12
    r_wheel, w_wheel = 0.1, 0.12
    mass = 15.0
    sink0 = 0.02

    wheel_local = wheel_bce_markers(r_wheel, w_wheel, d0)
    # BCE surface = marker layer + d0/2 (wall convention); surface touch is
    # depth + r + d0/2; start pre-sunk by sink0 in a carved crater with a
    # full-d0 center clearance so the boundary penalty starts exactly at
    # onset (smaller clearance fires it at ~kN level instantly)
    x0 = np.array([0.2, bed[1] / 2, depth + r_wheel + 0.5 * d0 - sink0])

    def carve(pts):
        dxz = pts[:, [0, 2]] - x0[[0, 2]]
        in_r = np.linalg.norm(dxz, axis=1) < (r_wheel + d0)
        in_y = np.abs(pts[:, 1] - x0[1]) < (w_wheel / 2 + d0)
        return ~(in_r & in_y)

    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    wheel = bld.add_body(mass=mass, inertia=(0.08, 0.12, 0.08), pos=x0)
    model, bodies = bld.finalize()

    terrain, grid = make_crm_terrain_state(
        params, crm, bed, depth,
        rigid_pts=wheel_local + x0, rigid_body_ids=[wheel] * len(wheel_local),
        rigid_local=wheel_local, carve_fn=carve)

    def drive(t, b):
        f = jnp.zeros((model.n_bodies, 3))
        tau = jnp.zeros((model.n_bodies, 3))
        # let it settle, then drive
        tau = tau.at[wheel, 1].set(jnp.where(t > 0.05, 5.0, 0.0))
        return f, tau

    adv = make_crm_fsi_advance_fn(model, params, crm, grid,
                                  n_substeps=params.rebuild_every,
                                  wheel_bodies=[wheel], active=active,
                                  f_ext_fn=drive)
    state = CRMFSIState(bodies=bodies, terrain=terrain,
                        time=jnp.zeros(()))
    state, ovf = adv(state, n_outer)
    return state, int(ovf), model, x0, (r_wheel, depth, d0, sink0)


def test_wheel_sinkage_and_rolling():
    state, ovf, model, x0, (r_wheel, depth, d0, sink0) = _wheel_on_bed()
    assert ovf == 0
    xw = np.asarray(state.bodies.x[1])
    assert np.isfinite(xw).all()
    # the wheel stays sunk INTO the bed (sinkage > 0), supported well above
    # the floor — no launch, no punch-through
    sink = (x0[2] + sink0) - xw[2]
    assert sink > 0.2 * sink0, f"launched out of the bed: {sink:.4f}"
    assert xw[2] > depth / 2, f"fell through bed: z={xw[2]:.3f}"
    # drive torque spins it about +y and it does not slide backward
    assert np.asarray(state.bodies.w[1])[1] > 0.05
    assert xw[0] > x0[0] - 5e-3


def test_active_domain_parity_and_frozen():
    """Active-domain run matches the full run for the wheel trajectory; far
    granular markers stay literally frozen."""
    full, ovf_f, *_ = _wheel_on_bed(active=None, n_outer=25)
    spec = ActiveDomainSpec(box=jnp.asarray([0.22, 0.22, 0.3]),
                            margin=jnp.asarray([0.1, 0.1, 0.1]),
                            capacity=5120)
    act, ovf_a, *_ = _wheel_on_bed(active=spec, n_outer=25)
    assert ovf_f == 0 and ovf_a == 0

    xw_f = np.asarray(full.bodies.x[1])
    xw_a = np.asarray(act.bodies.x[1])
    assert np.abs(xw_f - xw_a).max() < 5e-4, (xw_f, xw_a)

    # markers beyond the extended box must not have moved at all
    kind = np.asarray(act.terrain.kind)
    pa = np.asarray(act.terrain.pos)
    far = (kind == FLUID) & (np.abs(pa[:, 0] - xw_a[0]) > 0.34)
    if far.any():
        va = np.asarray(act.terrain.vel)[far]
        assert np.abs(va).max() == 0.0


def test_moving_patch_relocation():
    params, crm = _params(), _crm()
    terrain, grid = make_crm_terrain_state(params, crm, (0.9, 0.36), 0.12)
    x_front = jnp.asarray(1.0)
    moved, n_moved = relocate_patch_x(terrain, x_front, patch_length=0.6,
                                      surface_z=0.12, params=params, crm=crm)
    kind = np.asarray(terrain.kind)
    gran = kind == FLUID
    x_old = np.asarray(terrain.pos[:, 0])
    x_new = np.asarray(moved.pos[:, 0])
    should_move = gran & (x_old < 0.4)
    assert int(n_moved) == should_move.sum()
    np.testing.assert_allclose(x_new[should_move], x_old[should_move] + 0.6,
                               rtol=1e-6)
    # relocated markers arrive at rest with lithostatic stress
    assert np.abs(np.asarray(moved.vel)[should_move]).max() == 0.0
    tz = np.asarray(moved.tau_d[:, 2])[should_move]
    assert (tz <= 1e-6).all()


def test_heightmap_bed_construction():
    """Heightmap-shaped CRM bed (ChFsiProblemCartesian Construct(heightmap)):
    granular fill follows the surface function and lithostatic stress is
    measured from the LOCAL surface."""
    params, crm = _params(), _crm()

    def surf(x, y):
        return 0.06 + 0.05 * np.sin(2 * np.pi * x / 0.9)

    terrain, grid = make_crm_terrain_state(params, crm, (0.9, 0.3), 0.12,
                                           surface_fn=surf)
    kind = np.asarray(terrain.kind)
    pos = np.asarray(terrain.pos)[kind == FLUID]
    zs = surf(pos[:, 0], pos[:, 1])
    assert (pos[:, 2] < zs).all()
    # somewhere the bed is taller than 0.06 and somewhere shorter
    assert pos[:, 2].max() > 0.08 and (zs.min() < 0.03)
    # lithostatic σ_zz ≈ −ρ g (surface − z) locally
    tzz = np.asarray(terrain.tau_d[:, 2])[kind == FLUID]
    ref = -1700.0 * 9.81 * (zs - pos[:, 2])
    np.testing.assert_allclose(tzz, ref, rtol=1e-4, atol=1.0)


def test_persistent_pencil_parity():
    """Persistent-pencil vehicle advance (terrain stays binned across outer
    steps, BCE kinematics + body-force reduction in-plane) matches the
    per-outer pencil pipeline at rebuild_outer=1 and stays on-trajectory at
    rebuild_outer=3 (bounded binning staleness)."""
    from chrono_tpu.fsi.crm_terrain import (
        crm_fsi_step, make_crm_fsi_advance_persistent,
    )
    from chrono_tpu.fsi.sph.crm_pencil import make_crm_substeps_pencil

    params, crm = _params(), _crm()
    d0 = float(params.d0)
    bed = (0.45, 0.24)
    depth = 0.12
    r_wheel, w_wheel = 0.08, 0.09
    sink0 = 0.02
    wheel_local = wheel_bce_markers(r_wheel, w_wheel, d0)
    x0 = np.array([0.18, bed[1] / 2, depth + r_wheel + 0.5 * d0 - sink0])

    def carve(pts):
        dxz = pts[:, [0, 2]] - x0[[0, 2]]
        in_r = np.linalg.norm(dxz, axis=1) < (r_wheel + d0)
        in_y = np.abs(pts[:, 1] - x0[1]) < (w_wheel / 2 + d0)
        return ~(in_r & in_y)

    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    wheel = bld.add_body(mass=10.0, inertia=(0.05, 0.08, 0.05), pos=x0)
    model, bodies = bld.finalize()
    terrain, grid = make_crm_terrain_state(
        params, crm, bed, depth,
        rigid_pts=wheel_local + x0, rigid_body_ids=[wheel] * len(wheel_local),
        rigid_local=wheel_local, carve_fn=carve)

    def drive(t, b):
        f = jnp.zeros((model.n_bodies, 3))
        tau = jnp.zeros((model.n_bodies, 3))
        tau = tau.at[wheel, 1].set(3.0)
        return f, tau

    n_sub, n_outer = 2, 4
    subs = make_crm_substeps_pencil(params, crm, grid, capacity=32, Bxy=2,
                                    interpret=True)
    state0 = CRMFSIState(bodies=bodies, terrain=terrain, time=jnp.zeros(()))

    # eager interpret execution: jitting these interpret-mode graphs costs
    # minutes of XLA CPU compile for a correctness-only test
    with jax.disable_jit():
        ref = state0
        ovf_ref = 0
        for _ in range(n_outer):
            ref, ov, _ = crm_fsi_step(model, params, crm, grid, ref, n_sub,
                                      [wheel], f_ext_fn=drive,
                                      substeps_fn=subs)
            ovf_ref = max(ovf_ref, int(ov))
        assert ovf_ref == 0

        adv1 = make_crm_fsi_advance_persistent(
            model, params, crm, grid, n_substeps=n_sub, wheel_bodies=[wheel],
            f_ext_fn=drive, pencil_capacity=32, pencil_Bxy=2,
            rebuild_outer=1, interpret=True)
        got1, ov1 = adv1(state0, n_outer)
        assert int(ov1) == 0
        np.testing.assert_allclose(np.asarray(got1.bodies.x),
                                   np.asarray(ref.bodies.x),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got1.bodies.v),
                                   np.asarray(ref.bodies.v),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got1.terrain.pos),
                                   np.asarray(ref.terrain.pos),
                                   rtol=1e-6, atol=1e-7)

        adv3 = make_crm_fsi_advance_persistent(
            model, params, crm, grid, n_substeps=n_sub, wheel_bodies=[wheel],
            f_ext_fn=drive, pencil_capacity=32, pencil_Bxy=2,
            rebuild_outer=3, interpret=True, dv_mode="last")
        got3, ov3 = adv3(state0, n_outer)
        assert int(ov3) == 0
        # staleness-bounded (rebuild cadence + last-substep dv): same
        # trajectory within a loose tolerance
        dx = np.abs(np.asarray(got3.bodies.x) - np.asarray(ref.bodies.x))
        assert dx.max() < 2e-3, dx
        assert np.isfinite(np.asarray(got3.terrain.pos)).all()
