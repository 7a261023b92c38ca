"""On-hardware compile gate: build EVERY shipped Pallas kernel configuration
at tiny N with interpret=False and run one real step on the TPU.

Why this exists: all Pallas parity tests run interpret-mode on CPU
(tests/conftest.py forces the cpu platform), so Mosaic *lowering* is
exercised nowhere else.  Round 3 shipped a default DEM engine that failed to
compile on hardware ("Cannot store scalars to VMEM",
ops/pallas/flatlane_kernel.py token sink) while every test stayed green.
This gate is the reference's defensive-sync discipline
(/root/reference/src/chrono_dem/gpu/ChDemSMC.cu:630 — never ship an
unexercised kernel) applied to the Mosaic compiler boundary.

Usage:
    python tools/compile_gate.py              # all cases
    python tools/compile_gate.py --fast       # headline engines only (~5 min)
    python tools/compile_gate.py --only dem-flat,nsc-half
    python tools/compile_gate.py --list

Prints one JSON line per case ({"case", "ok", "wall_s", ...}) plus a summary
line; exit code = number of failed cases (3 = TPU tunnel down).

Covered kernels (ops/pallas/):
    flatlane_kernel + dem_flat_kernel   -> dem-flat        [fast]
    dem_sym_kernel                      -> dem-sym
    dem_pencil_kernel                   -> dem-pencil
    sph_sym_kernel (flat + pencil lane) -> sph-sym-flat [fast], sph-sym-pencil
    sph_pencil_kernel                   -> sph-pencil
    crm_sym_kernel (flat + pencil lane) -> crm-flat [fast], crm-pencil
    flatlane_dual_kernel (two-tier)     -> crm-dual        [fast]
    nsc_pencil_kernel                   -> nsc-pallas
    nsc_half_kernel                     -> nsc-half        [fast]
    nsc_partner_kernel                  -> nsc-partner
    dem_cell_kernel: EXCLUDED by design — interpret-only backend (unaligned
    dynamic slices; see its module docstring), never selected on hardware.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# path-independent: the gate may be invoked from any cwd (driver, cron)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (_REPO + os.pathsep
                            + os.environ.get("PYTHONPATH", ""))


def _tpu_alive(timeout_s=240, attempts=4):
    """Best-effort liveness probe with backoff.  A false negative here must
    NOT block the gate (it trains people to --skip-probe): the caller treats
    a failed probe as a warning and runs the cases anyway — each case runs
    in its own subprocess with its own timeout, so a truly dead tunnel
    still fails cleanly, just slower."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))")
    for k in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(min(30, 5 * (k + 1)))
    return False


# ---------------- tiny scenes ----------------

def _dem_case(backend):
    import jax.numpy as jnp
    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.dem.params import DEMParams, DEMMaterial
    from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries
    from chrono_tpu.dem.cell_dense import make_cell_dense_advance

    rng = np.random.default_rng(7)
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.13, dims=(5, 4, 3))
    n = 120
    pos = np.stack([rng.uniform(0.07, 5 * 0.13 - 0.07, n),
                    rng.uniform(0.07, 4 * 0.13 - 0.07, n),
                    rng.uniform(0.07, 3 * 0.13 - 0.07, n)],
                   axis=1).astype(np.float32)
    params = DEMParams(
        radius=jnp.asarray(0.05), mass=jnp.asarray(1.0),
        material=DEMMaterial(), wall_material=DEMMaterial(),
        gravity=jnp.asarray([0.0, 0.0, -9.81]), dt=jnp.asarray(2e-5),
        friction_mode="single_step", rebuild_every=4,
    )
    bcs = DEMBoundaries(planes=box_boundaries(
        (0, 0, 0), (5 * 0.13, 4 * 0.13, 3 * 0.13)))
    adv = make_cell_dense_advance(params, bcs, grid, backend=backend,
                                  capacity=16, pallas_block=2,
                                  pallas_interpret=False)
    z = jnp.zeros((n, 3))
    p, v, om, ovf = adv(jnp.asarray(pos), z, z, 2)
    assert int(ovf) == 0
    assert np.isfinite(np.asarray(p)).all() and np.isfinite(np.asarray(v)).all()


def _sph_case(backend, layout):
    import jax.numpy as jnp
    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.fsi.sph.system import (
        SPHParams, make_sph_state, suggest_sph_dt)
    from chrono_tpu.fsi.sph.pencil import make_sph_advance_pencil
    from chrono_tpu.utils.samplers import grid_sample_box

    d0 = 0.02
    W, H, L = 0.12, 0.12, 0.24
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1000.0), mu=jnp.asarray(1e-3),
        c_s=jnp.asarray(10.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), max_neighbors=96, max_per_cell=64,
        rebuild_every=2, integrator="symplectic",
    )
    params = params.replace(dt=jnp.asarray(suggest_sph_dt(params)))
    fluid = grid_sample_box((0, 0, 0), (W / 2, W, H), d0)
    floors = [grid_sample_box((-3 * d0, -3 * d0, -(k + 1) * d0),
                              (L + 3 * d0, W + 3 * d0, -(k + 1) * d0), d0)
              for k in range(3)]
    state = make_sph_state(params, fluid, boundary_pts=np.concatenate(floors))
    cell = 2.0 * float(params.h)
    grid = GridSpec(origin=(-4 * d0, -4 * d0, -5 * d0), cell_size=cell,
                    dims=(int(np.ceil((L + 8 * d0) / cell)),
                          int(np.ceil((W + 8 * d0) / cell)),
                          int(np.ceil((2 * H + 9 * d0) / cell))))
    kw = dict(capacity=32, interpret=False, backend=backend)
    if backend == "sym":
        kw["layout"] = layout
    adv = make_sph_advance_pencil(params, grid, **kw)
    got, ovf = adv(state, 2)
    assert int(ovf) == 0
    assert np.isfinite(np.asarray(got.pos)).all()


def _crm_case(layout):
    import jax.numpy as jnp
    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.fsi.sph.system import SPHParams, make_sph_state
    from chrono_tpu.fsi.sph.crm import (
        CRMParams, make_crm_state, lithostatic_init)
    from chrono_tpu.fsi.sph.crm_pencil import make_crm_substeps_pencil
    from chrono_tpu.utils.samplers import grid_sample_box

    d0 = 0.01
    width, H = 0.08, 0.08
    params = SPHParams(
        d0=jnp.asarray(d0), h=jnp.asarray(1.2 * d0),
        rho0=jnp.asarray(1600.0), mu=jnp.asarray(0.0),
        c_s=jnp.asarray(30.0), gravity=jnp.asarray([0.0, 0.0, -9.81]),
        dt=jnp.asarray(1e-4), alpha_visc=jnp.asarray(0.1),
        max_neighbors=96, max_per_cell=80, rebuild_every=4,
    )
    crm = CRMParams(youngs=jnp.asarray(2e6), poisson=jnp.asarray(0.3),
                    friction_angle=jnp.asarray(0.7),
                    cohesion=jnp.asarray(0.0))
    col = grid_sample_box((0.05, 0.02, 0.0),
                          (0.05 + width, 0.02 + width, H), d0)
    floor = grid_sample_box((0.02, 0.0, -3 * d0), (0.2, 0.12, 0.0), d0)
    st = make_crm_state(make_sph_state(params, col, boundary_pts=floor))
    st = lithostatic_init(st, params, crm, surface_z=H)
    cs = 2.5 * 1.2 * d0
    grid = GridSpec(origin=(0.0, -0.02, -5 * d0), cell_size=cs,
                    dims=(int(np.ceil(0.24 / cs)), int(np.ceil(0.17 / cs)),
                          int(np.ceil((1.5 * H + 8 * d0) / cs))))
    if layout == "dual":
        from chrono_tpu.fsi.sph.crm_pencil import make_crm_substeps_dual
        subs = make_crm_substeps_dual(params, crm, grid, CA=8, CB=24,
                                      Bxy=2, interpret=False)
    else:
        subs = make_crm_substeps_pencil(params, crm, grid, capacity=32,
                                        Bxy=2, interpret=False,
                                        layout=layout)
    got, dv, ovf = subs(st, 1)
    assert int(ovf) == 0
    assert np.isfinite(np.asarray(got.pos)).all()


def _nsc_case(backend, dynamic=False):
    import jax.numpy as jnp
    from chrono_tpu.collision.cell_list import GridSpec
    from chrono_tpu.solver.nsc_pencil import (
        NSCPencilParams, make_nsc_pencil_advance)

    R = 0.05
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=2.1 * R, dims=(4, 4, 4))
    walls = (("plane", (0.0, 0.0, 1.0), 0.0, (0.0, 0.0, 0.0), 0.4),)
    kw = {}
    if dynamic:
        # dynamic rotbox blade: 3-scalar SMEM block (pose + traced spin)
        # and the blade-compliance row diagonal — a distinct Mosaic config
        walls = walls + (
            ("rotbox", 2, (0.42, 0.42, R), (2.0 * R, 0.7 * R, R), 0.0, 0.3),)
        kw = dict(blade_inertia=0.05, blade_torque=1.0)
    p = NSCPencilParams(radius=R, mass=0.5, mu=0.3, dt=1e-3, n_iter=20,
                        envelope=0.002 * R, **kw)
    adv = make_nsc_pencil_advance(p, grid, walls, backend=backend,
                                  interpret=False)
    pos = jnp.asarray([[0.2, 0.2, R], [0.2, 0.2, 3.0 * R],
                       [0.31, 0.2, R]])
    z = jnp.zeros((3, 3))
    out = adv(pos, z, z, 5)
    pos, vel, om, ovf = out[:4]
    assert int(ovf) == 0
    assert np.isfinite(np.asarray(pos)).all()


CASES = {
    # name -> (callable, in fast tier?)
    "dem-flat": (lambda: _dem_case("flat"), True),
    "dem-sym": (lambda: _dem_case("sym"), False),
    "dem-pencil": (lambda: _dem_case("pencil"), False),
    "sph-sym-flat": (lambda: _sph_case("sym", "flat"), True),
    "sph-sym-pencil": (lambda: _sph_case("sym", "pencil"), False),
    "sph-pencil": (lambda: _sph_case("pencil", None), False),
    "crm-flat": (lambda: _crm_case("flat"), True),
    "crm-pencil": (lambda: _crm_case("pencil"), False),
    "crm-dual": (lambda: _crm_case("dual"), True),
    "nsc-pallas": (lambda: _nsc_case("pallas"), False),
    "nsc-half": (lambda: _nsc_case("half"), True),
    "nsc-half-dyn": (lambda: _nsc_case("half", dynamic=True), True),
    "nsc-partner": (lambda: _nsc_case("partner"), False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--fast", action="store_true",
                    help="headline engines only (default DEM/SPH/CRM/NSC)")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()

    if args.list:
        for k, (_, fast) in CASES.items():
            print(f"{k}{' [fast]' if fast else ''}")
        return 0

    names = ([s for s in args.only.split(",") if s] if args.only
             else [k for k, (_, fast) in CASES.items()
                   if fast or not args.fast])
    unknown = [n for n in names if n not in CASES]
    if unknown:
        print(f"unknown cases: {unknown}", file=sys.stderr)
        return 2

    if not args.skip_probe and not _tpu_alive():
        # non-fatal (the probe has false-negatived on a live chip): warn
        # and continue — per-case subprocess timeouts catch a dead tunnel
        print(json.dumps({"gate": "compile", "ok": None,
                          "warning": "liveness probe failed; running cases "
                                     "anyway (per-case timeouts apply)"}),
              flush=True)

    import jax
    plat = jax.devices()[0].platform
    if plat == "cpu":
        print(json.dumps({"gate": "compile", "ok": False,
                          "error": "running on CPU — gate needs hardware"}))
        return 3

    failed = 0
    for name in names:
        fn, _ = CASES[name]
        t0 = time.time()
        try:
            fn()
            print(json.dumps({"case": name, "ok": True,
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failed += 1
            print(json.dumps({"case": name, "ok": False,
                              "wall_s": round(time.time() - t0, 1),
                              "error": f"{type(e).__name__}: {e}"[:500]}),
                  flush=True)
    print(json.dumps({"gate": "compile", "platform": plat,
                      "cases": len(names), "failed": failed,
                      "ok": failed == 0}))
    return failed


if __name__ == "__main__":
    sys.exit(main())
