"""Granular dam break: a settled block released across the floor; exports a
PLY frame sequence (the reference's DEM demo role)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from chrono_tpu.dem import DEMSystem
from chrono_tpu.utils.samplers import hcp_sample_box
from chrono_tpu.io import export_particle_sequence


def main():
    radius = 0.01
    sys_ = DEMSystem(radius=radius, density=2500,
                     box=((0, 0, 0), (1.2, 0.2, 0.4)),
                     rebuild_every=8, max_neighbors=16)
    sys_.set_material(youngs=1e7, restitution=0.4, mu_s=0.5)
    sys_.set_wall_material(youngs=1e7, restitution=0.4, mu_s=0.5)
    pts = hcp_sample_box((0.005, 0.005, 0.005), (0.3, 0.195, 0.3), radius * 1.01)
    sys_.create_particles(pts)
    print(f"{len(pts)} particles, dt={sys_.dt:.2e}")

    frames = []
    for k in range(12):
        sys_.advance(0.05)
        frames.append((float(sys_.state.time), sys_.positions.copy()))
        front = sys_.positions[:, 0].max()
        print(f"t={frames[-1][0]:.2f}s front x={front:.3f} "
              f"KE={sys_.kinetic_energy():.3f} J")
    export_particle_sequence("out/dam_break", frames)
    print("frames -> out/dam_break/*.ply")


if __name__ == "__main__":
    main()
