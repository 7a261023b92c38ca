"""Per-phase probe for the capstone (config #5) CRM pipeline on TPU.

Builds the demo scene, then times: one substep kernel (M+G sweeps), the
forces sweep, the bin/unbin, and a full outer chunk — to locate the RTF
budget before optimizing.  Run on the real chip:  python tools/probe_crm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *a, n=20, warm=2):
    for _ in range(warm):
        r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    from demos import demo_vehicle_crm as D
    from chrono_tpu.fsi.sph.state import SPHParams
    from chrono_tpu.fsi.sph.crm import CRMParams
    from chrono_tpu.fsi.crm_terrain import (
        make_crm_terrain_state, wheel_bce_markers, CRMFSIState,
    )
    from chrono_tpu.fsi.sph.crm_pencil import make_crm_pencil_engine
    from chrono_tpu.physics.builder import SystemBuilder

    d0 = 0.05
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1700.0), mu=jnp.asarray(0.0),
        c_s=jnp.asarray(40.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), alpha_visc=jnp.asarray(0.3),
        kernel="cubic", max_neighbors=96, max_per_cell=64, rebuild_every=4)
    crm = CRMParams(youngs=jnp.asarray(4e6), poisson=jnp.asarray(0.3),
                    friction_angle=jnp.asarray(0.9),
                    cohesion=jnp.asarray(2000.0))
    bed = (2.0, 1.2)
    depth = 0.15
    r_wheel, w_wheel = 0.16, 0.12
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    chassis, corners = D.build_vehicle(bld, (0.6, bed[1] / 2, 0.45))
    model, bodies = bld.finalize()
    wheels = [corners[k].wheel for k in ("FL", "FR", "RL", "RR")]
    wl = wheel_bce_markers(r_wheel, w_wheel, d0)
    rigid_pts, rigid_ids, rigid_loc = [], [], []
    wheel_pos = np.asarray(bodies.x)[wheels]
    for w, xw in zip(wheels, wheel_pos):
        rigid_pts.append(wl + xw)
        rigid_ids += [w] * len(wl)
        rigid_loc.append(wl)
    terrain, grid = make_crm_terrain_state(
        params, crm, bed, depth,
        rigid_pts=np.concatenate(rigid_pts), rigid_body_ids=rigid_ids,
        rigid_local=np.concatenate(rigid_loc), air=12.0,
        margin=float(os.environ.get("CRM_MARGIN", "3.5")
                     if os.environ.get("CRM_LAYOUT") == "flat2" else "6.0"))
    print(f"markers={terrain.pos.shape[0]} grid={grid.dims}")

    cap = int(os.environ.get("CRM_CAPACITY", "32"))
    layout = os.environ.get("CRM_LAYOUT", "auto")
    if layout == "flat2":
        from chrono_tpu.fsi.sph.crm_pencil import make_crm_dual_engine
        CA = int(os.environ.get("CRM_CA", (cap * 3) // 4))
        eng = make_crm_dual_engine(params, crm, grid, CA=CA, CB=cap - CA,
                                   Bxy=int(os.environ.get("CRM_BXY", "1")))
        print(f"layout=flat2 aperm={eng['aperm']} CA={CA} CB={cap - CA}")
        feat, _, perm, ovf = jax.jit(lambda st: eng["bin"](st))(terrain)
        fA, fB = feat
        rowB = np.asarray(jnp.max(fB[:, -1], axis=(1, 2)))
        rowA = np.asarray(jnp.max(fA[:, -1], axis=(1, 2)))
        print("overflow:", int(ovf), "A:", fA.shape, "B:", fB.shape)
        print("rowA occupancy:", rowA.astype(int).tolist())
        print("rowB occupancy:", rowB.astype(int).tolist())
        nB = float(jnp.sum(fB[:, -1]))
        print(f"B markers: {nB:.0f} / {terrain.pos.shape[0]}")
    else:
        eng = make_crm_pencil_engine(params, crm, grid, capacity=cap, Bxy=4)
        print(f"layout={eng['layout']} aperm={eng['aperm']} C={cap}")
        feat, _, perm, ovf = jax.jit(lambda st: eng["bin"](st))(terrain)
        print("overflow:", int(ovf), "feat:", feat.shape,
              f"{feat.size * 4 / 1e6:.1f} MB")

    sub = jax.jit(eng["substep"])
    t_sub = timeit(sub, feat)
    t_frc = timeit(jax.jit(eng["forces"]), feat)
    t_acc = timeit(jax.jit(eng["substep_acc"]), feat)
    t_bin = timeit(jax.jit(lambda st: eng["bin"](st)[0]), terrain)
    print(f"substep (M+G sweeps): {t_sub:.2f} ms")
    print(f"forces-only sweep:    {t_frc:.2f} ms")
    print(f"substep+acc:          {t_acc:.2f} ms")
    print(f"bin (sort+scatter):   {t_bin:.2f} ms")
    # MBS step cost
    from chrono_tpu.physics.system import (
        SolverSettings, step_euler_implicit_linearized,
    )
    st_mbs = jax.jit(lambda b: step_euler_implicit_linearized(
        model, b, jnp.zeros(()), 4e-4, SolverSettings(solver="direct"))[0])
    t_mbs = timeit(st_mbs, bodies)
    print(f"MBS implicit step:    {t_mbs:.2f} ms")
    per_outer = 3 * t_sub + t_acc + t_mbs + t_bin / 5
    print(f"-> est/outer (4 substeps, dv=last, rebuild 5): "
          f"{per_outer:.1f} ms  => RTF ~ {per_outer / 0.4:.1f}")


if __name__ == "__main__":
    main()
