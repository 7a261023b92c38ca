"""YAML model/simulation specification parser and runner.

Counterpart of the reference's YAML spec layer
(/root/reference/src/chrono_parsers/yaml/ChParserMbsYAML.cpp etc. and the
standalone yaml_app runners): a declarative scene+simulation description that
builds a chrono_tpu model and runs it — the framework's config-driven entry
point (``python -m chrono_tpu.run spec.yaml``).

Top-level keys: ``simulation`` (step, duration, solver, gravity), ``model``
(mbs: bodies/joints/motors/springs | dem: material+sampling), ``output``
(csv/frames).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import yaml

import jax.numpy as jnp


def load_spec(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _name_index(bodies_spec):
    return {b.get("name", f"body{i}"): i for i, b in enumerate(bodies_spec)}


def build_mbs(spec: dict):
    """model: {bodies: [...], joints: [...], motors: [...], springs: [...]}"""
    from chrono_tpu.physics import SystemBuilder
    from chrono_tpu.core import functions as F

    b = SystemBuilder()
    mspec = spec["model"]
    sim = spec.get("simulation", {})
    if "gravity" in sim:
        b.set_gravity(sim["gravity"])

    names = _name_index(mspec.get("bodies", []))
    for bd in mspec.get("bodies", []):
        b.add_body(
            mass=bd.get("mass", 1.0),
            inertia=bd.get("inertia", (1.0, 1.0, 1.0)),
            pos=bd.get("pos", (0, 0, 0)),
            rot=bd.get("rot"),
            vel=bd.get("vel", (0, 0, 0)),
            omega_local=bd.get("omega", (0, 0, 0)),
            fixed=bd.get("fixed", False),
            name=bd.get("name"),
        )

    def body_ref(v):
        return names[v] if isinstance(v, str) else int(v)

    for j in mspec.get("joints", []):
        b.add_joint(j["type"], body_ref(j["body1"]), body_ref(j["body2"]),
                    world_pos=j.get("pos", (0, 0, 0)),
                    world_axis=j.get("axis", (0, 0, 1)),
                    aux=j.get("distance", 0.0))

    def profile_of(m):
        p = m.get("profile", {"type": "const", "value": m.get("value", 0.0)})
        t = p["type"]
        if t == "const":
            return F.FConst(c=jnp.asarray(float(p["value"])))
        if t == "ramp":
            return F.FRamp(y0=jnp.asarray(float(p.get("y0", 0.0))),
                           slope=jnp.asarray(float(p["slope"])))
        if t == "sine":
            return F.FSine(amp=jnp.asarray(float(p["amplitude"])),
                           freq=jnp.asarray(float(p["frequency"])),
                           phase=jnp.asarray(float(p.get("phase", 0.0))))
        raise ValueError(f"unknown profile type {t!r}")

    for m in mspec.get("motors", []):
        kind = m["type"]
        args = (body_ref(m["body1"]), body_ref(m["body2"]),
                m.get("pos", (0, 0, 0)), m.get("axis", (0, 0, 1)),
                profile_of(m))
        add = {
            "rotation_speed": b.add_motor_rotation_speed,
            "rotation_angle": b.add_motor_rotation_angle,
            "rotation_torque": b.add_motor_rotation_torque,
            "linear_speed": b.add_motor_linear_speed,
            "linear_position": b.add_motor_linear_position,
            "linear_force": b.add_motor_linear_force,
        }[kind]
        add(*args, add_joint=m.get("add_joint", True))

    for s in mspec.get("springs", []):
        b.add_tsda(body_ref(s["body1"]), body_ref(s["body2"]),
                   pa_world=s["point1"], pb_world=s["point2"],
                   k=s.get("spring_coefficient", 0.0),
                   c=s.get("damping_coefficient", 0.0),
                   rest_length=s.get("free_length"),
                   f_actuation=s.get("actuation_force", 0.0))

    return b.finalize(), names


def build_dem(spec: dict):
    """model: {type: dem, radius, density, box, material:{...},
    particles:{sampler: grid|hcp, region: [lo, hi], ...}}"""
    from chrono_tpu.dem import DEMSystem
    from chrono_tpu.utils import samplers

    m = spec["model"]
    sim = spec.get("simulation", {})
    sys_ = DEMSystem(
        radius=m["radius"], density=m.get("density", 2500.0),
        box=(m["box"][0], m["box"][1]),
        dt=sim.get("time_step"),
        gravity=tuple(sim.get("gravity", (0, 0, -9.81))),
        friction_mode=m.get("friction_mode", "multi_step"),
        rolling_mode=m.get("rolling_mode", "none"),
    )
    mat = m.get("material", {})
    sys_.set_material(**mat)
    sys_.set_wall_material(**m.get("wall_material", mat))
    p = m.get("particles", {})
    sampler = p.get("sampler", "grid")
    region = p.get("region", m["box"])
    spacing = p.get("spacing", 2.1 * m["radius"])
    if sampler == "grid":
        pts = samplers.grid_sample_box(region[0], region[1], spacing,
                                       jitter=p.get("jitter", 0.0),
                                       seed=p.get("seed", 0))
    elif sampler == "hcp":
        pts = samplers.hcp_sample_box(region[0], region[1], m["radius"])
    elif sampler == "poisson":
        pts = samplers.poisson_disk_sample_box(region[0], region[1], spacing,
                                               seed=p.get("seed", 0))
    else:
        raise ValueError(f"unknown sampler {sampler!r}")
    sys_.create_particles(pts)
    return sys_


def run_spec(spec: dict, verbose: bool = True):
    """Execute a spec; returns final state. Writes output files if requested."""
    from chrono_tpu.physics import SolverSettings, simulate

    sim = spec.get("simulation", {})
    h = float(sim.get("time_step", 1e-3))
    t_end = float(sim.get("end_time", 1.0))
    model_type = spec["model"].get("type", "mbs")
    out_spec = spec.get("output", {})

    if model_type == "mbs":
        (model, state), names = build_mbs(spec)
        sol = sim.get("solver", {})
        settings = SolverSettings(
            solver=sol.get("type", "direct"),
            max_iter=int(sol.get("max_iterations", 100)),
            tol=float(sol.get("tolerance", 1e-6)),
        )
        n = int(round(t_end / h))
        final, (xs, qs) = simulate(model, state, h, n, settings)
        if out_spec.get("csv"):
            from chrono_tpu.io.writers import CSVWriter
            cols = ["t"] + [f"{nm}_{ax}" for nm in names for ax in "xyz"]
            w = CSVWriter(out_spec["csv"], cols)
            ts = np.arange(n) * h + h
            X = np.asarray(xs)
            for k in range(n):
                w.append(ts[k], *X[k].reshape(-1))
            w.write()
        if verbose:
            print(f"mbs: {len(names)} bodies, {n} steps -> t={t_end}")
        return final
    elif model_type == "dem":
        sys_ = build_dem(spec)
        sys_.advance(t_end)
        if out_spec.get("frames"):
            from chrono_tpu.io.writers import FrameWriter
            fw = FrameWriter(out_spec["frames"])
            fw.write_frame(float(sys_.state.time), pos=sys_.positions,
                           vel=sys_.velocities)
        if verbose:
            print(f"dem: {sys_.state.n} particles -> t={float(sys_.state.time):.3f}")
        return sys_.state
    raise ValueError(f"unknown model type {model_type!r}")


def main(argv=None):
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m chrono_tpu.run <spec.yaml>")
        return 1
    spec = load_spec(argv[0])
    run_spec(spec)
    return 0
