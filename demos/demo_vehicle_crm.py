"""Capstone demo: 4-wheel vehicle on CRM deformable terrain.

The flagship coupling of the reference
(demo_VEH_CRMTerrain_WheeledVehicle.cpp:171-204 — vehicle registered with the
FSI problem, wheels as BCE solids, active domains around the wheels), rebuilt
TPU-native: chassis + four geometric double-wishbone corners (real control
arms/joints), wheels as BCE cylinders inside elastoplastic CRM soil, rear
drive torque, everything advanced by ONE jitted coupled program per outer
step with gather-compacted active domains.

Prints per-interval sinkage / slip / speed and the end-to-end RTF
(BASELINE.md config #5 metric).  CPU-sized; the same program compiles for
TPU unchanged.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

if __name__ == "__main__":          # benchmark imports pick the backend
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from chrono_tpu.fsi.sph.state import SPHParams
from chrono_tpu.fsi.sph.crm import CRMParams
from chrono_tpu.fsi.crm_terrain import (
    make_crm_terrain_state, wheel_bce_markers, CRMFSIState,
    make_crm_fsi_advance_fn, make_crm_fsi_advance_persistent,
)
from chrono_tpu.fsi.active import ActiveDomainSpec
from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.vehicle.suspension import (
    WishboneHardpoints, add_double_wishbone_corner,
)


def build_vehicle(bld: SystemBuilder, pos0, wheelbase=1.2, track=0.7,
                  chassis_mass=60.0):
    chassis = bld.add_body(mass=chassis_mass, inertia=(20.0, 40.0, 50.0),
                           pos=pos0)
    hp = WishboneHardpoints(
        spindle=(0.0, 0.0, 0.0),
        uca_front=(0.10, -0.28, 0.16), uca_rear=(-0.10, -0.28, 0.16),
        uca_ball=(0.0, -0.06, 0.18),
        lca_front=(0.12, -0.30, -0.10), lca_rear=(-0.12, -0.30, -0.10),
        lca_ball=(0.0, -0.04, -0.12),
        spring_chassis=(0.0, -0.22, 0.30), spring_lca=(0.0, -0.12, -0.10),
        tierod_chassis=(0.15, -0.28, 0.0), tierod_upright=(0.14, -0.06, 0.0),
        masses=dict(uca=1.5, lca=2.0, upright=4.0, wheel=8.0),
        inertias=dict(uca=(0.01, 0.01, 0.02), lca=(0.01, 0.01, 0.02),
                      upright=(0.05, 0.05, 0.05), wheel=(0.10, 0.16, 0.10)),
        spring_k=120e3, spring_c=6e3)
    corners = {}
    for name, dx, side in (("FL", +wheelbase / 2, +1),
                           ("FR", +wheelbase / 2, -1),
                           ("RL", -wheelbase / 2, +1),
                           ("RR", -wheelbase / 2, -1)):
        origin = np.asarray(pos0) + np.array([dx, side * track / 2, -0.15])
        corners[name] = add_double_wishbone_corner(bld, chassis, origin, hp,
                                                   side=side)
    return chassis, corners


def main(n_intervals=25, outer_per_interval=40, engine=None):
    d0 = 0.05
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1700.0), mu=jnp.asarray(0.0),
        c_s=jnp.asarray(40.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), alpha_visc=jnp.asarray(0.3),
        kernel="cubic", max_neighbors=96, max_per_cell=64, rebuild_every=4)
    # firm cohesive loam: cohesion resists the excavation spiral a spinning
    # wheel causes on a pure-friction bed and bounds the rut depth
    crm = CRMParams(youngs=jnp.asarray(4e6), poisson=jnp.asarray(0.3),
                    friction_angle=jnp.asarray(0.9),
                    cohesion=jnp.asarray(2000.0))

    bed = (2.0, 1.2)
    depth = 0.15
    r_wheel, w_wheel = 0.16, 0.12
    sink0 = 0.02
    z_chassis = depth + r_wheel + 0.5 * d0 - sink0 + 0.15
    pos0 = (0.6, bed[1] / 2, z_chassis)

    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    chassis, corners = build_vehicle(bld, pos0)
    model, bodies = bld.finalize()
    wheels = [corners[k].wheel for k in ("FL", "FR", "RL", "RR")]

    # BCE markers for all four wheels
    wl = wheel_bce_markers(r_wheel, w_wheel, d0)
    rigid_pts, rigid_ids, rigid_loc = [], [], []
    wheel_pos = np.asarray(bodies.x)[wheels]
    for w, xw in zip(wheels, wheel_pos):
        rigid_pts.append(wl + xw)
        rigid_ids += [w] * len(wl)
        rigid_loc.append(wl)

    def carve(pts):
        keep = np.ones(len(pts), bool)
        for xw in wheel_pos:
            dxz = pts[:, [0, 2]] - xw[[0, 2]]
            in_r = np.linalg.norm(dxz, axis=1) < (r_wheel + d0)
            in_y = np.abs(pts[:, 1] - xw[1]) < (w_wheel / 2 + d0)
            keep &= ~(in_r & in_y)
        return keep

    # air=12·d0 headroom: wheel ruts splash millimetres, and empty z-cells
    # cost lanes linearly in the flat-lane engine (and only skipped rows in
    # the flat2 engine); margin=3.5·d0 covers the 3 wall BCE layers + skin
    import os as _os
    layout = _os.environ.get("CRM_LAYOUT", "flat2")
    terrain, grid = make_crm_terrain_state(
        params, crm, bed, depth,
        rigid_pts=np.concatenate(rigid_pts), rigid_body_ids=rigid_ids,
        rigid_local=np.concatenate(rigid_loc), carve_fn=carve, air=12.0,
        margin=(3.5 if layout == "flat2" else 6.0))
    n_markers = terrain.pos.shape[0]

    def drive(t, b):
        f = jnp.zeros((model.n_bodies, 3))
        tau = jnp.zeros((model.n_bodies, 3))
        torque = jnp.where(t > 0.15, 14.0, 0.0)   # AWD: gentle, no digging
        for c in corners.values():
            tau = tau.at[c.wheel, 1].add(torque)
        return f, tau

    # at this compact demo scale the four activity boxes cover most of the
    # bed, so compaction saves nothing — the active path (tested in
    # tests/test_crm_terrain.py) pays off on long beds; size the buffer
    # generously or disable via CLI
    use_active = "--active" in sys.argv
    active = ActiveDomainSpec(box=jnp.asarray([0.35, 0.25, 0.4]),
                              margin=jnp.asarray([0.12, 0.12, 0.12]),
                              capacity=16384) if use_active else None
    if engine is None:
        import jax as _jax
        engine = "persistent" if _jax.default_backend() != "cpu" \
            else "gather"
    import os
    # C=24 was measured 1.4x faster but overflows (wheel-rim BCE + bed
    # lattice stack 27 markers/cell at contact) — the per-interval ovf
    # print guards any experiment with CRM_CAPACITY
    cap = int(os.environ.get("CRM_CAPACITY", "32"))
    if engine == "persistent":
        # terrain stays binned across outer steps; bin/unbin amortized.
        # CRM_SUBSTEPS overrides the substeps/outer (diagnostic: the RTF
        # slope vs substeps separates sweep cost from per-outer fixed cost)
        rebuild_outer = int(os.environ.get("CRM_REBUILD_OUTER", "5"))
        n_sub = int(os.environ.get("CRM_SUBSTEPS", params.rebuild_every))
        # clip_z: wheel-rim BCE above bed surface + kernel support + heave
        # margin can't touch soil within a rebuild — drop them from the
        # binning (flat2 layout: empties the upper z rows entirely)
        clip_z = (depth + 2.0 * 1.2 * d0 + 2 * d0   # + support 2h + heave
                  if layout == "flat2" else None)
        # whole-outer fused kernel (one pallas call per outer step): the
        # default on the flat2 layout; CRM_WHOLE_OUTER=0 reproduces the
        # r4 per-sweep engine
        whole = (layout == "flat2"
                 and os.environ.get("CRM_WHOLE_OUTER", "1") == "1")
        adv = make_crm_fsi_advance_persistent(
            model, params, crm, grid, n_substeps=n_sub,
            wheel_bodies=wheels, f_ext_fn=drive, pencil_capacity=cap,
            rebuild_outer=rebuild_outer, layout=layout,
            dv_mode=os.environ.get("CRM_DV_MODE", "last"), clip_z=clip_z,
            whole_outer=whole)
    else:
        adv = make_crm_fsi_advance_fn(model, params, crm, grid,
                                      n_substeps=params.rebuild_every,
                                      wheel_bodies=wheels, active=active,
                                      f_ext_fn=drive, engine=engine,
                                      pencil_capacity=cap)
    state = CRMFSIState(bodies=bodies, terrain=terrain, time=jnp.zeros(()))

    print(f"vehicle-on-CRM: {n_markers} markers, {model.n_bodies} bodies, "
          f"dt={float(params.dt):.0e}, engine={engine}")
    x_start = float(state.bodies.x[chassis, 0])
    t0 = time.perf_counter()
    t_warm = t_sim_warm = None
    for k in range(n_intervals):
        state, ovf = adv(state, outer_per_interval)
        if k == 0:
            # steady-state clock starts after the compiled first interval
            jax.block_until_ready(state.bodies.x)
            t_warm, t_sim_warm = time.perf_counter(), float(state.time)
        xc = np.asarray(state.bodies.x[chassis])
        vc = np.asarray(state.bodies.v[chassis])
        wr = float(state.bodies.w[corners["RL"].wheel, 1])
        v_x = vc[0]
        slip = 1.0 - v_x / max(wr * r_wheel, 1e-6) if wr > 0.1 else 0.0
        zw = float(np.asarray(state.bodies.x)[wheels, 2].mean())
        sink_w = (depth + r_wheel + 0.5 * d0 - sink0) - zw   # true wheel rut
        print(f"t={float(state.time):5.2f}s ovf={int(ovf)} x={xc[0]:.3f} "
              f"v={v_x:5.2f} m/s rut={sink_w * 1000 + sink0 * 1000:5.1f} mm "
              f"slip={slip:5.2f} ω_RL={wr:5.2f}", flush=True)
    wall = time.perf_counter() - t0
    t_sim = float(state.time)
    rtf = wall / t_sim
    if n_intervals > 1 and t_warm is not None:
        wall_ss = time.perf_counter() - t_warm
        sim_ss = t_sim - t_sim_warm
        rtf = wall_ss / sim_ss
        print(f"steady-state RTF = {rtf:.1f} "
              f"(wall {wall_ss:.0f}s / sim {sim_ss:.2f}s, first interval "
              f"excluded)")
    print(f"RTF = {wall / t_sim:.1f} (wall {wall:.0f}s / sim {t_sim:.2f}s), "
          f"distance = {float(state.bodies.x[chassis, 0]) - x_start:.2f} m")
    return dict(rtf=rtf, wall_s=wall, sim_s=t_sim, markers=n_markers,
                bodies=model.n_bodies,
                distance=float(state.bodies.x[chassis, 0]) - x_start)


if __name__ == "__main__":
    main()
