"""Slider-crank mechanism driven at constant speed; writes the slider
trajectory as CSV (the reference's demo_MBS_crank role)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from chrono_tpu.core import functions as F
from chrono_tpu.physics import SystemBuilder, SolverSettings, simulate
from chrono_tpu.io import CSVWriter


def main():
    r, l = 0.5, 2.0
    b = SystemBuilder()
    ground = b.add_ground()
    crank = b.add_body(mass=1.0, inertia=(0.1,) * 3, pos=(r / 2, 0, 0))
    rod = b.add_body(mass=1.0, inertia=(0.1,) * 3, pos=(r + l / 2, 0, 0))
    slider = b.add_body(mass=1.0, inertia=(0.1,) * 3, pos=(r + l, 0, 0))
    b.add_motor_rotation_speed(ground, crank, world_pos=(0, 0, 0),
                               world_axis=(0, 1, 0),
                               profile=F.FConst(c=jnp.asarray(2.0)))
    b.add_joint("spherical", crank, rod, world_pos=(r, 0, 0))
    b.add_joint("universal", rod, slider, world_pos=(r + l, 0, 0),
                world_axis=(1, 0, 0))
    b.add_joint("prismatic", ground, slider, world_pos=(r + l, 0, 0),
                world_axis=(1, 0, 0))
    model, state = b.finalize()

    h, n = 1e-3, 3000
    final, (xs, qs) = simulate(model, state, h, n,
                               SolverSettings(solver="direct"))
    w = CSVWriter("out/slider_crank.csv", ["t", "slider_x"])
    X = np.asarray(xs)
    for k in range(0, n, 10):
        w.append((k + 1) * h, X[k, 3, 0])
    w.write()
    print(f"slider x range: [{X[:,3,0].min():.3f}, {X[:,3,0].max():.3f}] "
          f"(expect [{l - r:.3f}, {l + r:.3f}]) -> out/slider_crank.csv")


if __name__ == "__main__":
    main()
