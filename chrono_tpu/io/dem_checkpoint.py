"""Loader for the reference chrono_dem checkpoint format.

Parses the ASCII checkpoint files written by ``ChSystemDem::WriteCheckpointFile``
(/root/reference/src/chrono_dem/physics/ChSystemDem.cpp, format consumed by the
constructor-from-checkpoint used in utest_DEM_pyramid.cpp) and builds a
:class:`chrono_tpu.dem.system.DEMSystem` with matching physics:

* the raw user stiffness/damping coefficients (K_n/G_n/K_t/G_t) map onto the
  ``force_model="user"`` path (ChDemSMC.cuh:629-637 semantics);
* friction / rolling modes and the time integrator map by enum order
  (ChDemDefines.h:42-49);
* particle positions / velocities / angular velocities / fixity come from the
  ``CsvParticles`` block.

The friction-history block (``HstHistory``) is parsed but not imported: the
partner indices reference the previous run's contact-map slots, which the
first neighbor rebuild regenerates; for settled states the tangential springs
re-wind within a few steps (same approximation the reference accepts when
friction history is absent from older checkpoints).
"""

from __future__ import annotations

import numpy as np

_FRICTION = {0: "frictionless", 1: "single_step", 2: "multi_step"}
_ROLLING = {0: "none", 1: "schwartz", 2: "elastic_plastic"}
_INTEGRATOR = {0: "forward_euler", 1: "chung", 2: "centered_difference",
               3: "extended_taylor"}


def parse_dem_checkpoint(path: str) -> dict:
    """Parse the checkpoint into {params: dict, particles: structured dict}."""
    params: dict = {}
    rows = []
    header = None
    section = "head"
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            if line == "CsvParticles":
                section = "csv"
                continue
            if line == "HstHistory":
                section = "hst"
                continue
            if section == "head":
                if line in ("ChSystemGpu", "ChSystemDem", "ParamsEnd"):
                    continue
                if ":" in line:
                    k, v = line.split(":", 1)
                    params[k.strip()] = v.strip()
            elif section == "csv":
                if header is None:
                    header = [c.strip() for c in line.split(",")]
                    continue
                rows.append([float(c) for c in line.split(",")])
            # hst: skipped (see module docstring)
    data = np.asarray(rows, np.float64)
    cols = {name: data[:, i] for i, name in enumerate(header)}
    return dict(params=params, particles=cols)


def dem_system_from_checkpoint(path: str, box=None, **system_kw):
    """Build a DEMSystem + state from a reference checkpoint.

    Returns ``(sys, fixed)`` where ``fixed`` is the (N,) bool fixity vector
    recorded in the checkpoint (chrono_tpu DEM treats all particles as free;
    callers emulate fixity by zeroing velocities or, as the reference's
    pyramid test does, explicitly un-fix everything).
    """
    from chrono_tpu.dem.system import DEMSystem

    ck = parse_dem_checkpoint(path)
    p = ck["params"]
    radius = float(p["radius"])
    density = float(p["density"])
    g = [float(x) for x in p["G"].split()]
    dt = float(p["fixedStepSize"])
    if box is None:
        bs = [float(x) for x in p["boxSize"].split()]
        box = (tuple(-0.5 * b for b in bs), tuple(0.5 * b for b in bs))

    sys = DEMSystem(
        radius=radius, density=density, box=box, dt=dt, gravity=tuple(g),
        integrator=_INTEGRATOR[int(p.get("timeIntegrator", 2))],
        friction_mode=_FRICTION[int(p.get("frictionMode", 2))],
        rolling_mode=_ROLLING[int(p.get("rollingMode", 0))],
        force_model="user",
        **system_kw,
    )
    sys.set_material(
        kn=float(p["K_n_s2s"]), gn=float(p["G_n_s2s"]),
        kt=float(p["K_t_s2s"]), gt=float(p["G_t_s2s"]),
        mu_s=float(p.get("StaticFrictionCoeff_s2s", 0.5)),
        mu_r=float(p.get("RollingCoeff_s2s", 0.0)),
        mu_sp=float(p.get("SpinningCoeff_s2s", 0.0)),
    )
    sys.set_wall_material(
        kn=float(p["K_n_s2w"]), gn=float(p["G_n_s2w"]),
        kt=float(p["K_t_s2w"]), gt=float(p["G_t_s2w"]),
        mu_s=float(p.get("StaticFrictionCoeff_s2w", 0.5)),
        mu_r=float(p.get("RollingCoeff_s2w", 0.0)),
        mu_sp=float(p.get("SpinningCoeff_s2w", 0.0)),
    )
    c = ck["particles"]
    pts = np.stack([c["x"], c["y"], c["z"]], axis=1)
    vel = np.stack([c["vx"], c["vy"], c["vz"]], axis=1)
    sys.create_particles(pts, vel=vel)
    if "wx" in c:
        import jax.numpy as jnp
        sys.state = sys.state.replace(
            omega=jnp.asarray(np.stack([c["wx"], c["wy"], c["wz"]], axis=1),
                              sys.dtype))
    fixed = c.get("fixed", np.zeros(len(pts))).astype(bool)
    return sys, fixed
