"""SPH dam break demo: a water column collapses in a tank; PLY frames out.

Counterpart of the reference's FSI dam-break demos
(/root/reference/src/demos/fsi/demo_FSI_DamBreak.cpp).  Runs the WCSPH
module on whatever backend is available (pencil Pallas engine on TPU, the
gather backend on CPU) and writes a PLY point-cloud sequence colored by
pressure for ParaView/Blender.

Usage: python demos/demo_sph_dam_break.py [--n 8000] [--frames 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "out", "sph_dam"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.fsi.sph.state import FLUID, tait_pressure
    from chrono_tpu.fsi.sph.system import (
        SPHParams, make_sph_state, make_sph_advance_fn, suggest_sph_dt,
    )
    from chrono_tpu.utils.samplers import grid_sample_box
    from chrono_tpu.io.export import write_ply_points

    d0 = 0.01
    W = (2.0 * args.n) ** (1 / 3) * d0
    H, L = W, 2.0 * W
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1000.0), mu=jnp.asarray(1e-3),
        c_s=jnp.asarray(10.0 * np.sqrt(2 * 9.81 * H)),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(1e-4),
        max_neighbors=96, max_per_cell=64, rebuild_every=4,
        integrator="symplectic", viscosity_model="artificial")
    params = params.replace(dt=jnp.asarray(suggest_sph_dt(params)))
    fluid = grid_sample_box((0, 0, 0), (W / 2, W, H), d0)
    walls = np.concatenate([
        grid_sample_box((-3 * d0, -3 * d0, -(k + 1) * d0),
                        (L + 3 * d0, W + 3 * d0, -(k + 1) * d0), d0)
        for k in range(3)])
    cell = 2.0 * float(params.h)
    grid = GridSpec(origin=(-4 * d0, -4 * d0, -4 * d0), cell_size=cell,
                    dims=(int(np.ceil((L + 8 * d0) / cell)),
                          int(np.ceil((W + 8 * d0) / cell)),
                          int(np.ceil((1.6 * H + 8 * d0) / cell))))
    state = make_sph_state(params, fluid, boundary_pts=walls)
    adv = make_sph_advance_fn(params, grid)

    os.makedirs(args.out, exist_ok=True)
    cyc_per_frame = max(1, int(0.01 / (float(params.dt) * params.rebuild_every)))
    print(f"n_fluid={fluid.shape[0]} dt={float(params.dt):.2e} "
          f"backend={jax.default_backend()}")
    for f in range(args.frames):
        state, ovf = adv(state, cyc_per_frame)
        assert int(ovf) == 0
        kind = np.asarray(state.kind)
        pos = np.asarray(state.pos)[kind == FLUID]
        p = np.asarray(tait_pressure(params, state.rho))[kind == FLUID]
        path = os.path.join(args.out, f"frame_{f:04d}.ply")
        write_ply_points(path, pos, values=p)
        print(f"frame {f}: t={float(state.time):.3f}s "
              f"x_front={pos[:, 0].max():.3f} → {path}")


if __name__ == "__main__":
    main()
