"""Headline benchmark: granular DEM throughput (particle-steps/sec).

Matches BASELINE.md config #3 (granular settling/dam-break, Hertz–Mindlin SMC,
1M+ spheres — the reference's chrono_dem workload, measured there on NVIDIA
GPUs).  Runs on whatever jax.default_backend() provides (the driver runs it on
the real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / BASELINE_PSTEPS where BASELINE_PSTEPS is the
assumed A100 chrono_dem throughput at 1M particles (2e8 particle-steps/s,
typical of published chrono::gpu figures; BASELINE.json has no in-repo number).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PSTEPS = 2.0e8


def _tpu_alive(timeout_s: int = 180) -> bool:
    """Probe the TPU backend in a subprocess (a dead tunnel hangs forever)."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    n_target = int(os.environ.get("BENCH_N", 1_000_000))
    if os.environ.get("BENCH_FORCE_CPU") or not _tpu_alive():
        n_target = min(n_target, int(os.environ.get("BENCH_N", 50_000)))
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from chrono_tpu.dem import DEMSystem
    from chrono_tpu.utils.samplers import grid_sample_box

    radius = 0.005
    spacing = 2.1 * 2 * radius / 2  # loose grid: 2.1 r center spacing? no:
    spacing = 2.1 * radius
    # box sized to hold n_target particles in a settled bed ~half full
    n_side = int(np.ceil(n_target ** (1 / 3)))
    box_w = n_side * spacing * 1.02
    box_h = box_w * 2.0
    sys_ = DEMSystem(
        radius=radius, density=2500,
        box=((0, 0, 0), (box_w, box_w, box_h)),
        max_neighbors=12, max_per_cell=8, rebuild_every=10, skin=0.3,
        friction_mode="multi_step",
    )
    sys_.set_material(youngs=1e7, poisson=0.3, restitution=0.5, mu_s=0.5)
    sys_.set_wall_material(youngs=1e7, poisson=0.3, restitution=0.5, mu_s=0.5)

    pts = grid_sample_box((radius, radius, radius),
                          (box_w - radius, box_w - radius, box_h - radius),
                          spacing, jitter=0.03, seed=0)[:n_target]
    n = len(pts)
    sys_.create_particles(pts)

    # warmup: compile + one cycle
    sys_.advance(sys_.dt * sys_._static["rebuild_every"])
    sys_.state.pos.block_until_ready()

    n_cycles = int(os.environ.get("BENCH_CYCLES", 20))
    steps = n_cycles * sys_._static["rebuild_every"]
    t0 = time.perf_counter()
    state, _ = sys_._advance(sys_.state, n_cycles)
    state.pos.block_until_ready()
    dt_wall = time.perf_counter() - t0

    psteps = n * steps / dt_wall
    out = {
        "metric": f"DEM particle-steps/sec (Hertz-Mindlin SMC, N={n}, "
                  f"{jax.default_backend()})",
        "value": round(psteps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(psteps / BASELINE_PSTEPS, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
