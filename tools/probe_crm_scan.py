"""Isolate the capstone substep-scan cost: time jit(scan(substep, K)) for
several K on the real chip.  If cost/K grows with K, the scan structure
(carry relayout / scheduling) is the problem, not the kernels."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    from demos import demo_vehicle_crm as D
    from chrono_tpu.fsi.sph.state import SPHParams
    from chrono_tpu.fsi.sph.crm import CRMParams
    from chrono_tpu.fsi.crm_terrain import (
        make_crm_terrain_state, wheel_bce_markers,
    )
    from chrono_tpu.fsi.sph.crm_pencil import make_crm_dual_engine
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
    bld = SystemBuilder()
    bld.set_gravity((0, 0, -9.81))
    chassis, corners = D.build_vehicle(bld, (0.6, 0.6, 0.45))
    model, bodies = bld.finalize()
    wheels = [corners[k].wheel for k in ("FL", "FR", "RL", "RR")]
    wl = wheel_bce_markers(0.16, 0.12, d0)
    rigid_pts, rigid_ids, rigid_loc = [], [], []
    for w, xw in zip(wheels, np.asarray(bodies.x)[wheels]):
        rigid_pts.append(wl + xw)
        rigid_ids += [w] * len(wl)
        rigid_loc.append(wl)
    terrain, grid = make_crm_terrain_state(
        params, crm, (2.0, 1.2), 0.15,
        rigid_pts=np.concatenate(rigid_pts), rigid_body_ids=rigid_ids,
        rigid_local=np.concatenate(rigid_loc), air=12.0, margin=3.5)
    eng = make_crm_dual_engine(params, crm, grid, CA=24, CB=8, Bxy=1)
    feat, _, perm, ovf = jax.jit(lambda st: eng["bin"](st))(terrain)
    print("overflow:", int(ovf))

    def scan_K(K):
        @jax.jit
        def f(ft):
            def inner(x, _):
                return eng["substep"](x), None
            out, _ = lax.scan(inner, ft, None, length=K)
            return out

        r = f(feat)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(feat)
        jax.block_until_ready(r)
        dt_ = (time.perf_counter() - t0) / 5
        print(f"K={K:3d}: {dt_ * 1e3:8.2f} ms total, "
              f"{dt_ / K * 1e3:6.2f} ms/substep", flush=True)

    for K in (2, 4, 8, 16):
        scan_K(K)


if __name__ == "__main__":
    main()
