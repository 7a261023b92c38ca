"""Secondary benchmark suite — BASELINE.md configs beyond the headline.

The driver runs ``bench.py`` (config #3, granular DEM).  This suite measures
the remaining north-star configs on whatever backend is alive and prints one
JSON line per config (results recorded in BENCH.md):

  mbs    #1  slider-crank + double pendulum, Euler-implicit-linearized DVI
             (reference: btest_CH_pendulums/ChBenchmark sim loops)   → ms/step
  mixer  #2  NSC box of spheres under a rotating stirrer, APGD
             (reference: btest_CH_mixerNSC)   → DVI iterations/sec + RTF
  sph    #4  WCSPH dam break with boundary markers
             (reference: btest_FSI-SPH benchmarks)   → particle-steps/sec

Usage: python bench_suite.py [mbs|mixer|sph|all]   (env: SUITE_N, SUITE_CPU)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _tpu_alive(timeout_s: int = 240) -> bool:
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def bench_mbs():
    """Config #1: slider-crank + double pendulum, one jitted scan."""
    import jax
    import jax.numpy as jnp
    from chrono_tpu.physics.builder import SystemBuilder
    from chrono_tpu.physics.system import SolverSettings, simulate

    bld = SystemBuilder()
    g = bld.add_ground()
    # double pendulum
    p1 = bld.add_body(mass=1.0, pos=(0.5, 0, 0))
    p2 = bld.add_body(mass=1.0, pos=(1.0, 0, 0))
    bld.add_joint("revolute", g, p1, world_pos=(0, 0, 0),
                  world_axis=(0, 1, 0))
    bld.add_joint("revolute", p1, p2, world_pos=(0.5, 0, 0),
                  world_axis=(0, 1, 0))
    # slider-crank
    crank = bld.add_body(mass=2.0, inertia=(0.1, 0.1, 0.1), pos=(0, 2, 0))
    rod = bld.add_body(mass=1.0, pos=(0.3, 2, 0))
    slider = bld.add_body(mass=0.5, pos=(0.6, 2, 0))
    bld.add_joint("revolute", g, crank, world_pos=(0, 2, 0),
                  world_axis=(0, 1, 0))
    bld.add_joint("spherical", crank, rod, world_pos=(0.15, 2, 0))
    bld.add_joint("spherical", rod, slider, world_pos=(0.6, 2, 0))
    bld.add_joint("prismatic", g, slider, world_pos=(0.6, 2, 0),
                  world_axis=(1, 0, 0))
    model, state = bld.finalize()

    h, n = 1e-3, 2000
    # latency configuration: jitted carry-donating scan, no trajectory
    # stacking (save_every=0) — the metric is ms/step of dynamics
    st, _ = simulate(model, state, h, n, SolverSettings(solver="direct"),
                     save_every=0)
    st.x.block_until_ready()
    t0 = time.perf_counter()
    st, _ = simulate(model, state, h, n, SolverSettings(solver="direct"),
                     save_every=0)
    st.x.block_until_ready()
    dt = time.perf_counter() - t0
    assert bool(jnp.isfinite(st.x).all())
    return dict(metric="MBS ms/step (slider-crank + double pendulum, DVI)",
                value=round(dt / n * 1e3, 4), unit="ms/step",
                rtf=round(dt / (n * h), 3),
                backend=jax.default_backend())


def bench_mixer(n_spheres=None):
    """Config #2: NSC spheres stirred in a box; APGD mixed VI solve."""
    import jax
    import jax.numpy as jnp
    from chrono_tpu.physics.builder import SystemBuilder
    from chrono_tpu.physics.system import SolverSettings
    from chrono_tpu.collision import (
        GridSpec, SphereShapes, BoxShapes, CollisionModel, nsc_step,
    )
    from chrono_tpu.core.functions import FConst
    from chrono_tpu.utils.samplers import grid_sample_box

    n_target = n_spheres or int(os.environ.get("SUITE_N", 10_000))
    radius = 0.03
    spacing = 2.2 * radius
    box = 0.08 + spacing * int(np.ceil(n_target ** (1 / 3)) + 1)

    bld = SystemBuilder()
    ground = bld.add_ground()
    mass = 0.2
    pts = grid_sample_box((0.07, 0.07, 0.07),
                          (box - 0.07, box - 0.07, 4 * box),
                          spacing, jitter=0.05, seed=2)[:n_target]
    first = None
    for p in pts:
        b = bld.add_body(mass=mass, inertia=(2e-4,) * 3, pos=p)
        first = b if first is None else first
    stirrer = bld.add_body(mass=20.0, inertia=(0.5, 0.5, 0.5),
                           pos=(box / 2, box / 2, 1.5 * radius))
    bld.add_motor_rotation_speed(ground, stirrer,
                                 (box / 2, box / 2, 1.5 * radius), (0, 0, 1),
                                 FConst(2.0))
    model, state = bld.finalize()
    n = len(pts)

    bodies = jnp.arange(first, first + n)
    spheres = SphereShapes(
        body=bodies, offset=jnp.zeros((n, 3)),
        radius=jnp.full((n,), radius),
        mu=jnp.full((n,), 0.4))
    # walls as boxes on ground + stirrer paddle
    t_w = 0.05
    half = box / 2
    wall_def = [
        ((half, half, -t_w / 2), (half, half, t_w / 2)),            # floor
        ((-t_w / 2, half, 2 * box), (t_w / 2, half + t_w, 2 * box)),
        ((box + t_w / 2, half, 2 * box), (t_w / 2, half + t_w, 2 * box)),
        ((half, -t_w / 2, 2 * box), (half + t_w, t_w / 2, 2 * box)),
        ((half, box + t_w / 2, 2 * box), (half + t_w, t_w / 2, 2 * box)),
    ]
    bpos = jnp.asarray([w[0] for w in wall_def])
    bhalf = jnp.asarray([w[1] for w in wall_def])
    boxes = BoxShapes(
        body=jnp.concatenate([jnp.zeros((5,), jnp.int32),
                              jnp.asarray([stirrer], jnp.int32)]),
        pos=jnp.concatenate([bpos, jnp.asarray([[0.3 * half, 0.0, 0.0]])]),
        rot=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (6, 1)),
        half=jnp.concatenate([bhalf, jnp.asarray(
            [[0.3 * half, 0.02, 2 * radius]])]),
        mu=jnp.full((6,), 0.4))
    cell = 2.2 * 2 * radius
    grid = GridSpec(origin=(-t_w, -t_w, -t_w), cell_size=cell,
                    dims=(int(np.ceil((box + 2 * t_w) / cell)),) * 2
                    + (int(np.ceil(5 * box / cell)),))
    coll = CollisionModel(spheres=spheres, boxes=boxes, grid=grid,
                          max_per_cell=16,
                          max_contacts=int(float(os.environ.get("SUITE_MAXC", 12)) * n))
    settings = SolverSettings(solver="apgd", max_iter=50, tol=1e-4,
                              stab_factor=0.2, max_recovery_speed=0.5,
                              valence_bound=int(os.environ.get(
                                  "SUITE_VALENCE", 32)))

    h = 2e-3
    import functools

    # chunked scans (default 10 steps/dispatch): a scan of 100 NSC steps
    # faults the TPU device at N=10k and relayouts the carried buffers
    # (same scan-carry disease the DEM bench hit — see BENCH.md), while
    # one dispatch per step pays a tunnel round trip per step on the
    # remote-TPU setup.  K=10 amortizes RTT without triggering either.
    K = int(os.environ.get("SUITE_CHUNK", 10))

    @functools.partial(jax.jit, static_argnums=3)
    def chunk(state, t, gamma, k):
        def body(carry, _):
            st, tt, g = carry
            st, contacts, info = nsc_step(model, coll, st, tt, h,
                                          settings, gamma_warm=g)
            return (st, tt + h, info.joint_reactions * h), (
                info.iterations, contacts.count)
        (st, tt, g), (its, ncs) = jax.lax.scan(body, (state, t, gamma),
                                               None, length=k)
        return st, tt, g, its, ncs

    gamma0 = jnp.zeros((coll.max_contacts * 3 + _bilateral_rows(model),))
    st, t, gam = state, 0.0, gamma0
    n_settle = int(os.environ.get("SUITE_SETTLE", 150))
    for _ in range(max(1, n_settle // K)):               # settle + warm
        st, t, gam, its, ncs = chunk(st, t, gam, K)
    st.x.block_until_ready()
    n_meas = 50
    its_l, ncs_l = [], []
    t0 = time.perf_counter()
    for _ in range(max(1, n_meas // K)):
        st, t, gam, its, ncs = chunk(st, t, gam, K)
        its_l.append(np.asarray(its))
        ncs_l.append(np.asarray(ncs))
    st.x.block_until_ready()
    dt = time.perf_counter() - t0
    n_meas = K * max(1, n_meas // K)
    iters = float(np.mean(its_l))
    contacts = float(np.mean(ncs_l))
    assert bool(jnp.isfinite(st.x).all())
    return dict(metric="NSC mixer DVI iterations/sec (APGD)",
                value=round(iters * n_meas / dt, 1), unit="iters/s",
                ms_per_step=round(dt / n_meas * 1e3, 2),
                rtf=round(dt / (n_meas * 2e-3), 2),
                mean_contacts=int(contacts), n_spheres=n,
                apgd_iters_per_step=round(iters, 1),
                backend=__import__("jax").default_backend())


def bench_mixer_pencil(n_spheres=None):
    """Config #2 on the TPU-native engine: rotating-drum NSC granular flow,
    APGD on the pencil multiplier lattice (chrono_tpu.solver.nsc_pencil).

    The scene is the analytic-wall equivalent of the reference's mixerNSC
    (btest_CH_mixerNSC): a spinning drum (friction-driven tumbling) instead
    of a box+paddle, since the pencil engine's movers are analytic walls.
    Gravity is set perpendicular to the drum's z-axis so the long axis fills
    the lane dimension.  Reports DVI iterations/sec (the BASELINE metric).
    """
    import jax
    import jax.numpy as jnp
    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.solver.nsc_pencil import (
        NSCPencilParams, make_nsc_pencil_advance,
    )

    n_target = n_spheres or int(os.environ.get("SUITE_N", 10_000))
    radius = 0.03
    fill = 0.55                      # drum volume fraction filled (settled)
    vol = n_target * (4.0 / 3.0) * np.pi * radius ** 3 / 0.58 / fill
    aspect = float(os.environ.get("SUITE_DRUM_ASPECT", 4.0))  # L / R
    R = (vol / (np.pi * aspect)) ** (1 / 3)
    L = aspect * R
    cell = 2.1 * radius
    nx = int(np.ceil(2 * (R + cell) / cell))
    nz = int(np.ceil(L / cell))
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=cell,
                    dims=(nx, nx, nz))
    c = nx * cell / 2
    spin = 2.0
    walls = (
        ("cyl", 2, (c, c, 0.0), R, spin, 0.5),
        ("plane", (0.0, 0.0, 1.0), 0.0, (0.0, 0.0, 0.0), 0.3),
        ("plane", (0.0, 0.0, -1.0), -L, (0.0, 0.0, 0.0), 0.3),
    )
    p = NSCPencilParams(radius=radius, mass=0.2, mu=0.4,
                        gravity=(-9.81, 0.0, 0.0),   # ⊥ drum axis (z)
                        dt=2e-3, n_iter=int(os.environ.get("SUITE_IT", 50)),
                        envelope=0.1 * radius, omega=0.3)

    # settle a blocky fill in the lower (−x) half of the drum
    rng = np.random.default_rng(4)
    pts = []
    s = 2.02 * radius
    for ix in np.arange(c - R + radius, c + R, s):
        for iy in np.arange(c - R + radius, c + R, s):
            for iz in np.arange(radius * 1.5, L - radius, s):
                if (ix - c) ** 2 + (iy - c) ** 2 < (R - radius) ** 2 \
                        and ix < c + 0.2 * R:
                    pts.append((ix, iy, iz))
    pts = np.asarray(pts)[:n_target]
    pts += rng.uniform(-0.005, 0.005, pts.shape) * radius
    n = len(pts)

    engine = os.environ.get("SUITE_NSC_ENGINE", "half")
    # single-sided storage halves the per-body partner budget
    adv = make_nsc_pencil_advance(p, grid, walls, backend=engine,
                                  partners=int(os.environ.get(
                                      "SUITE_PARTNERS",
                                      8 if engine == "half" else 12)),
                                  Bxy=int(os.environ.get("SUITE_BXY", 1)))
    pos = jnp.asarray(pts, jnp.float32)
    vel = jnp.zeros((n, 3), jnp.float32)
    om = jnp.zeros((n, 3), jnp.float32)
    # settle + warm the compile
    pos, vel, om, ovf = adv(pos, vel, om, 25)
    pos.block_until_ready()
    assert int(ovf) == 0, f"cell overflow {int(ovf)}"
    steps = int(os.environ.get("SUITE_STEPS", 25))
    t0 = time.perf_counter()
    pos, vel, om, ovf = adv(pos, vel, om, steps)
    pos.block_until_ready()
    dt = time.perf_counter() - t0
    assert int(ovf) == 0
    assert bool(np.isfinite(np.asarray(pos)).all())

    # count actual contacts once (pairs, each counted once) for the record
    from chrono_tpu.dem.cell_dense import to_cells
    field = to_cells(grid, 8, pos, vel, om)
    npairs = _count_pairs(field, grid, radius, p.envelope)
    return dict(metric=f"NSC drum DVI iterations/sec ({engine} APGD)",
                value=round(p.n_iter * steps / dt, 1), unit="iters/s",
                ms_per_step=round(dt / steps * 1e3, 2),
                rtf=round(dt / (steps * p.dt), 2),
                contacts=int(npairs), n_spheres=n,
                iters_per_step=p.n_iter,
                grid=f"{nx}x{nx}x{nz}",
                backend=jax.default_backend())


def bench_mixer_blade(n_spheres=None):
    """Config #2, the reference's ACTUAL bladed-mixer scene: a box tank with
    a rotating box paddle (btest_CH_mixerNSC.cpp:74-108 — floor, 4 walls, a
    10×5×1 blade at π/3 rad/s driven by an ideal speed motor).  The blade is
    a traced-pose ``rotbox`` wall in the half-stencil Pallas DVI engine; the
    ideal motor makes its motion exactly prescribed, and the motor torque is
    read back from the contact impulses (track_wall_reactions).

    TPU-informed geometry: gravity along −x so the tank's long axis fills
    the 128-lane z dim (SUITE_TANK_ASPECT, default 4 — the aspect-8-drum
    move); proportions otherwise follow the reference (blade sweep ≈ half
    the tank width, blade reaches the floor, submerged in the bed).
    """
    import jax
    import jax.numpy as jnp
    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.solver.nsc_pencil import (
        NSCPencilParams, make_nsc_pencil_advance,
    )

    n_target = n_spheres or int(os.environ.get("SUITE_N", 40_000))
    radius = 0.03
    aspect = float(os.environ.get("SUITE_TANK_ASPECT", 4.0))
    vol = n_target * (4.0 / 3.0) * np.pi * radius ** 3 / 0.58
    Ly = (4.0 * vol / aspect) ** (1 / 3)    # bed depth ≈ Ly/4
    Lz = aspect * Ly
    depth = vol / (Ly * Lz)
    # cell multiplier (radii): bigger cells fill the C=8 slot tile (the
    # DEM v5 move) — worst-case crystal-pack occupancy sqrt(2)*(c/2r)^3
    # stays < 8 up to c = 3.54 r; the binning overflow assert enforces it
    # 3.5 r measured best on v5e (205.7 DVI it/s vs 29.9 at 2.1 r): the
    # 2.1 r grid ran the C=8 slot lattice at ~1.3 avg occupancy; crystal
    # pack at 3.5 r is sqrt(2)*(1.75)^3 = 7.6 < 8
    cell = float(os.environ.get("SUITE_CELL_MULT", 3.5)) * radius
    dims = (int(np.ceil(3.0 * depth / cell)),
            int(np.ceil(Ly / cell)) + 2,
            int(np.ceil(Lz / cell)) + 2)
    grid = GridSpec(origin=(0.0, -cell, -cell), cell_size=cell, dims=dims)
    cy, cz = Ly / 2, Lz / 2
    spin = np.pi / 3                        # the reference's blade speed
    blade = ("rotbox", 0, (0.6 * depth, cy, cz),
             (0.45 * Ly, 2.0 * radius, 0.7 * depth), spin, 0.4)
    walls = (
        ("plane", (1.0, 0.0, 0.0), 0.0, (0.0, 0.0, 0.0), 0.4),   # floor
        ("plane", (0.0, 1.0, 0.0), 0.0, (0.0, 0.0, 0.0), 0.3),
        ("plane", (0.0, -1.0, 0.0), -Ly, (0.0, 0.0, 0.0), 0.3),
        ("plane", (0.0, 0.0, 1.0), 0.0, (0.0, 0.0, 0.0), 0.3),
        ("plane", (0.0, 0.0, -1.0), -Lz, (0.0, 0.0, 0.0), 0.3),
        blade,
    )
    p = NSCPencilParams(radius=radius, mass=0.2, mu=0.4,
                        gravity=(-9.81, 0.0, 0.0),
                        dt=2e-3, n_iter=int(os.environ.get("SUITE_IT", 50)),
                        envelope=0.1 * radius, omega=0.3,
                        track_wall_reactions=True)

    # lattice fill of the bed, skipping the blade's initial footprint
    rng = np.random.default_rng(4)
    s = 2.02 * radius
    pts = []
    for ix in np.arange(radius * 1.2, 2.0 * depth, s):
        for iy in np.arange(radius * 1.2, Ly - radius, s):
            for iz in np.arange(radius * 1.2, Lz - radius, s):
                if abs(iy - cy) < 0.45 * Ly + 3 * radius and \
                        abs(iz - cz) < 5 * radius and \
                        ix < 1.4 * depth + radius:
                    continue               # blade footprint (θ=0: along y)
                pts.append((ix, iy, iz))
                if len(pts) >= n_target:
                    break
            if len(pts) >= n_target:
                break
        if len(pts) >= n_target:
            break
    pts = np.asarray(pts)
    pts += rng.uniform(-0.005, 0.005, pts.shape) * radius
    n = len(pts)

    engine = os.environ.get("SUITE_NSC_ENGINE", "half")
    # P=6 partner budget: saturation is assert-guarded (partner overflow
    # folds into ovf); at this scene max owned pairs/body is 4
    adv = make_nsc_pencil_advance(p, grid, walls, backend=engine,
                                  partners=int(os.environ.get(
                                      "SUITE_PARTNERS", 6)),
                                  Bxy=int(os.environ.get("SUITE_BXY", 1)))
    pos = jnp.asarray(pts, jnp.float32)
    vel = jnp.zeros((n, 3), jnp.float32)
    om = jnp.zeros((n, 3), jnp.float32)
    pos, vel, om, ovf, reac = adv(pos, vel, om, 25)
    pos.block_until_ready()
    assert int(ovf) == 0, f"cell overflow {int(ovf)}"
    steps = int(os.environ.get("SUITE_STEPS", 25))
    t0 = time.perf_counter()
    pos, vel, om, ovf, (wforce, wtorque) = adv(
        pos, vel, om, steps, theta0=np.asarray([25 * p.dt * spin]))
    pos.block_until_ready()
    dt = time.perf_counter() - t0
    assert int(ovf) == 0
    assert bool(np.isfinite(np.asarray(pos)).all())

    from chrono_tpu.dem.cell_dense import to_cells
    field = to_cells(grid, 8, pos, vel, om)
    npairs = _count_pairs(field, grid, radius, p.envelope)
    return dict(metric=f"NSC bladed mixer DVI iterations/sec ({engine})",
                value=round(p.n_iter * steps / dt, 1), unit="iters/s",
                ms_per_step=round(dt / steps * 1e3, 2),
                rtf=round(dt / (steps * p.dt), 2),
                contacts=int(npairs), n_spheres=n,
                blade_torque_x=round(float(wtorque[5, 0]), 4),
                iters_per_step=p.n_iter,
                grid="x".join(str(d) for d in dims),
                backend=jax.default_backend())


def _count_pairs(field, grid, radius, envelope):
    """Active pair-contact count (each pair once) via dense rolls."""
    import jax.numpy as jnp
    pos, mask = field.pos, field.mask.astype(jnp.float32)
    total = jnp.zeros(())
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    nx, ny, nz = grid.dims
    for (dx, dy, dz) in offs:
        npos = jnp.roll(pos, (-dx, -dy, -dz), axis=(0, 1, 2))
        nmask = jnp.roll(mask, (-dx, -dy, -dz), axis=(0, 1, 2))
        d = npos[..., None, :, :] - pos[..., :, None, :]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-18)
        ok = (mask[..., :, None] * nmask[..., None, :]
              * (dist < 2 * radius + envelope))
        if (dx, dy, dz) == (0, 0, 0):
            C = mask.shape[3]
            ok = ok * (1 - jnp.eye(C))
        # crude edge masking via validity of rolled cells
        def ok1(nn, off):
            idx = jnp.arange(nn)
            if off == -1:
                return idx > 0
            if off == 1:
                return idx < nn - 1
            return jnp.ones((nn,), bool)
        okc = (ok1(nx, dx)[:, None, None] & ok1(ny, dy)[None, :, None]
               & ok1(nz, dz)[None, None, :]).astype(jnp.float32)
        total = total + jnp.sum(ok * okc[..., None, None])
    return float(total) / 2.0


def _bilateral_rows(model):
    from chrono_tpu.physics.joints import JOINT_TYPES
    rows = sum(JOINT_TYPES[k][1] * d.n for k, d in model.joints.items())
    rows += sum(d.n for d in model.motors.values())   # 1 row per motor
    return rows


def bench_sph(n_target=None):
    """Config #4: WCSPH dam break (fluid column collapses in a box)."""
    import jax
    import jax.numpy as jnp
    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.fsi.sph.system import (
        SPHParams, make_sph_state, make_sph_advance_fn, suggest_sph_dt,
    )
    from chrono_tpu.utils.samplers import grid_sample_box

    n_target = n_target or int(os.environ.get("SUITE_N", 200_000))
    # scale the column to hit the particle budget: n = (W/d0)·(W/2d0)·(H/d0)
    d0 = 0.01
    W = (n_target * 2.0) ** (1 / 3) * d0
    H = W
    L = 2.0 * W                            # tank length
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1000.0), mu=jnp.asarray(1e-3),
        c_s=jnp.asarray(10.0 * np.sqrt(2 * 9.81 * H)),
        gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4),
        max_neighbors=96, max_per_cell=64,
        rebuild_every=int(os.environ.get("SUITE_SPH_REBUILD", 8)),
        integrator="symplectic", viscosity_model="artificial",
    )
    params = params.replace(dt=jnp.asarray(suggest_sph_dt(params)))
    # jitter breaks the exact-lattice cell-occupancy worst case (3·3·2 per
    # flat cell) so the pencil engine runs at C = 16
    fluid = grid_sample_box((0, 0, 0), (W / 2, W, H), d0,
                            jitter=0.05, seed=3)[:n_target]
    walls = []
    for k in range(3):                     # 3 boundary layers
        o = (k + 1) * d0
        walls.append(grid_sample_box((-3 * d0, -3 * d0, -o),
                                     (L + 3 * d0, W + 3 * d0, -o), d0))
    floor = np.concatenate(walls)
    # TPU-informed knobs (physics-identical):
    #   SUITE_SPH_ROT=1  — lane-filling orientation: the tank length (the
    #     longest grid axis) goes into the 128-lane z dim (the same trick as
    #     the NSC aspect-8 drum); gravity moves to -y.
    #   SUITE_SPH_CELL   — cell-size multiplier on the 2h support (bigger
    #     cells raise slot occupancy toward C, cutting padded slot-evals —
    #     the DEM v5 move); worst-case wall cells stay ≤ C (overflow assert).
    #   SUITE_SPH_C8=1 — r5 configuration: cell = 2 d0 (BELOW the 2.4 d0
    #     support — the generalized ±2-ring flat-lane kernel serves it).
    #     The d0 marker lattice is commensurate: every 2 d0 cell holds
    #     EXACTLY 8 markers (boundaries mid-gap, 0.5 d0 margin vs 0.05 d0
    #     jitter), so C = 8 runs at 100% slot fill with single-chunk
    #     sweeps — the DEM v6 configuration class, overflow-assert-guarded.
    #     Ring-2 coverage leaves 2·cell − support = 1.6 d0 of skin, so the
    #     rebuild cadence stretches to 20.
    c8 = os.environ.get("SUITE_SPH_C8", "1") != "0"
    cell = float(os.environ.get("SUITE_SPH_CELL", "1.25")) \
        * 2.0 * float(params.h)
    rot = os.environ.get("SUITE_SPH_ROT", "2")
    if c8:
        cell = 2.0 * float(params.d0)
        rot = "0"
        params = params.replace(rebuild_every=int(
            os.environ.get("SUITE_SPH_REBUILD", 20)))
    if rot == "1":
        # lane-filling: tank length L (the longest axis) into the lanes
        perm = [1, 2, 0]                   # (L, W, H) -> (W, H, L)
        fluid = fluid[:, perm]
        floor = floor[:, perm]
        params = params.replace(gravity=jnp.asarray([0.0, -9.81, 0.0]))
        ext = (W + 8 * d0, 1.6 * H + 8 * d0, L + 8 * d0)
    elif rot == "2":
        # skip-optimal: the ALWAYS-WET axis (the tank width W — the dam
        # spans it at all times) into the lanes, so the (L, height) row
        # plane carries the air and the active-row mask skips it.  Active
        # rows = wet cells / wet-lane extent, minimized by laning the axis
        # with the largest wet extent.
        perm = [0, 2, 1]                   # (L, W, H) -> (L, H, W)
        fluid = fluid[:, perm]
        floor = floor[:, perm]
        params = params.replace(gravity=jnp.asarray([0.0, -9.81, 0.0]))
        ext = (L + 8 * d0, 1.6 * H + 8 * d0, W + 8 * d0)
    else:
        # C8 z-trim: markers move < 0.03 d0 over the bench window, so the
        # 1.6 H splash headroom stays empty — trim the lane-packed height
        # to the fluid top + margin (assert-guarded, like the DEM z-trim)
        zt = (H + 12 * d0) if c8 else (1.6 * H + 8 * d0)
        ext = (L + 8 * d0, W + 8 * d0, zt)
    grid = GridSpec(origin=(-4 * d0, -4 * d0, -4 * d0), cell_size=cell,
                    dims=tuple(int(np.ceil(e / cell)) for e in ext))
    state = make_sph_state(params, fluid, boundary_pts=floor)
    n = int(fluid.shape[0])
    engine = os.environ.get("SUITE_SPH_ENGINE",
                            "gather" if jax.default_backend() == "cpu"
                            else "sym")
    if engine in ("pencil", "sym"):
        # dense-pencil Pallas sweeps (ops.pallas.sph_pencil_kernel) — the
        # only path whose memory scales to 1M markers on TPU (the gather
        # neighbor lists compile to a 107 GB allocation at N=100k).
        # Flat cells (cell_z = h): measured at 1M the 3 exact-lattice BCE
        # floor layers stack up to 18 markers in one flat cell → C = 16
        # overflows; C = 24 erases the n_dz=2 block-count advantage, so the
        # recorded config stays cubic C = 32.
        from chrono_tpu.fsi.sph.pencil import (
            make_sph_advance_pencil, PencilGrid,
        )
        if os.environ.get("SUITE_SPH_FLAT"):
            lo = np.asarray(grid.origin)
            hi = lo + np.asarray(grid.dims) * grid.cell_size
            pgrid = PencilGrid.for_box(lo, hi, float(params.h))
        else:
            pgrid = grid
        cap = int(os.environ.get("SUITE_SPH_C", 8 if c8 else 32))
        bxy = int(os.environ.get("SUITE_SPH_BXY", 1))
        layout = os.environ.get("SUITE_SPH_LAYOUT",
                                "flat" if c8 else "auto")
        adv = make_sph_advance_pencil(params, pgrid, capacity=cap, Bxy=bxy,
                                      backend=("sym" if engine == "sym"
                                               else "pencil"),
                                      layout=layout)
    else:
        adv = make_sph_advance_fn(params, grid)
    state, ovf = adv(state, 1)
    state.pos.block_until_ready()
    assert int(ovf) == 0
    cycles = int(os.environ.get("SUITE_CYCLES", 10))
    t0 = time.perf_counter()
    state, ovf = adv(state, cycles)
    state.pos.block_until_ready()
    dt = time.perf_counter() - t0
    assert int(ovf) == 0
    steps = cycles * params.rebuild_every
    assert bool(jnp.isfinite(state.pos).all())
    return dict(metric="SPH dam-break particle-steps/sec (WCSPH)",
                value=round(n * steps / dt, 1), unit="particle-steps/s",
                n_particles=n, n_steps=steps, wall_s=round(dt, 2),
                engine=engine, backend=jax.default_backend(),
                cell=round(float(cell), 5), capacity=cap
                if engine in ("pencil", "sym") else None,
                grid_dims=list(grid.dims), c8=c8,
                rebuild=int(params.rebuild_every))


def bench_crm():
    """Config #5: 4-wheel double-wishbone vehicle on CRM deformable terrain,
    one fused coupled program (the reference's
    demo_VEH_CRMTerrain_WheeledVehicle flagship).  Metric: end-to-end RTF."""
    import jax
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from demos import demo_vehicle_crm

    n_int = int(os.environ.get("SUITE_CRM_INTERVALS", 6))
    engine = os.environ.get("SUITE_CRM_ENGINE")
    out = demo_vehicle_crm.main(n_intervals=n_int, outer_per_interval=40,
                                engine=engine)
    return dict(metric="vehicle-on-CRM end-to-end RTF",
                value=round(out["rtf"], 2), unit="RTF",
                markers=out["markers"], bodies=out["bodies"],
                sim_s=round(out["sim_s"], 3),
                distance_m=round(out["distance"], 3),
                engine=engine or ("persistent"
                                  if jax.default_backend() != "cpu"
                                  else "gather"),
                capacity=int(os.environ.get("CRM_CAPACITY", 32)),
                rebuild_outer=int(os.environ.get("CRM_REBUILD_OUTER", 5)),
                backend=jax.default_backend())


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    force = os.environ.get("SUITE_BACKEND", "")      # "", cpu, tpu
    if force == "cpu" or os.environ.get("SUITE_CPU") or (
            force != "tpu" and not _tpu_alive()):
        import jax
        jax.config.update("jax_platforms", "cpu")
    fns = {"mbs": bench_mbs, "mixer": bench_mixer, "sph": bench_sph,
           "mixer_pencil": bench_mixer_pencil,
           "mixer_blade": bench_mixer_blade, "crm": bench_crm}
    names = list(fns) if which == "all" else [which]
    # SUITE_JSON_OUT: append every config line to a driver-auditable
    # artifact (BENCH_SUITE_r{N}.json) in addition to stdout
    json_out = os.environ.get("SUITE_JSON_OUT", "")
    for name in names:
        try:
            out = fns[name]()
        except Exception as e:                      # noqa: BLE001
            out = dict(error=f"{type(e).__name__}: {e}")
        out["config"] = name
        line = json.dumps(out)
        print(line, flush=True)
        if json_out:
            with open(json_out, "a") as fh:
                fh.write(line + "\n")


if __name__ == "__main__":
    main()
