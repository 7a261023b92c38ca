"""Locate the small-MBS per-step latency (config #1) on the real chip.

Times a 200-step scan of the bench model with pieces monkeypatched out:
full / no-refinement / no-solve / no-assembly.  Differences give the
per-step cost of each stage inside the compiled program.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build():
    from chrono_tpu.physics.builder import SystemBuilder

    bld = SystemBuilder()
    g = bld.add_ground()
    p1 = bld.add_body(mass=1.0, pos=(0.5, 0, 0))
    p2 = bld.add_body(mass=1.0, pos=(1.0, 0, 0))
    bld.add_joint("revolute", g, p1, world_pos=(0, 0, 0),
                  world_axis=(0, 1, 0))
    bld.add_joint("revolute", p1, p2, world_pos=(0.5, 0, 0),
                  world_axis=(0, 1, 0))
    crank = bld.add_body(mass=2.0, inertia=(0.1, 0.1, 0.1), pos=(0, 2, 0))
    rod = bld.add_body(mass=1.0, pos=(0.3, 2, 0))
    slider = bld.add_body(mass=0.5, pos=(0.6, 2, 0))
    bld.add_joint("revolute", g, crank, world_pos=(0, 2, 0),
                  world_axis=(0, 1, 0))
    bld.add_joint("spherical", crank, rod, world_pos=(0.15, 2, 0))
    bld.add_joint("spherical", rod, slider, world_pos=(0.6, 2, 0))
    bld.add_joint("prismatic", g, slider, world_pos=(0.6, 2, 0),
                  world_axis=(1, 0, 0))
    return bld.finalize()


def time_scan(model, state, n=200, reps=5):
    from chrono_tpu.physics.system import SolverSettings, simulate

    st, _ = simulate(model, state, 1e-3, n, SolverSettings(solver="direct"))
    jax.block_until_ready(st.x)
    t0 = time.perf_counter()
    for _ in range(reps):
        st, _ = simulate(model, state, 1e-3, n,
                         SolverSettings(solver="direct"))
    jax.block_until_ready(st.x)
    return (time.perf_counter() - t0) / reps / n * 1e3


def main():
    import chrono_tpu.solver.direct as direct
    import chrono_tpu.physics.system as system

    model, state = build()
    print(f"full step:        {time_scan(model, state):7.3f} ms/step",
          flush=True)

    # no iterative refinement (hack the loop count via a wrapper)
    orig_solve = direct.solve_dense_schur
    import jax.scipy.linalg as jsl

    def solve_norefine(rows, props, v_free, w_free, reg=1e-9,
                       reg_fallback=3e-6):
        n_bodies = props.inv_mass.shape[0]
        D = direct.desc.dense_D(rows, n_bodies)
        minv = jnp.stack(
            [jnp.broadcast_to(props.inv_mass[:, None], (n_bodies, 3)),
             props.inv_inertia], axis=1).reshape(n_bodies * 6)
        DM = D * minv[None, :]
        N0 = DM @ D.T
        m = rows.m
        r = direct.compensated_schur_rhs(rows, v_free, w_free)
        N = N0 + (reg * jnp.maximum(jnp.trace(N0) / max(m, 1), 1.0)) \
            * jnp.eye(m, dtype=N0.dtype)
        N = jnp.where(rows.active[:, None] & rows.active[None, :], N,
                      jnp.eye(m, dtype=N.dtype))
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(N), 1e-30))
        Ns = N * s[:, None] * s[None, :]
        cho = jsl.cho_factor(Ns, lower=True)
        return s * jsl.cho_solve(cho, -(s * r))

    for mod in (direct, system):
        mod.solve_dense_schur = solve_norefine
    print(f"no refinement/cond: {time_scan(model, state):7.3f} ms/step",
          flush=True)

    def solve_zero(rows, props, v_free, w_free, reg=1e-9, reg_fallback=0.0):
        return jnp.zeros((rows.m,), v_free.dtype)

    for mod in (direct, system):
        mod.solve_dense_schur = solve_zero
    print(f"no solve at all:  {time_scan(model, state):7.3f} ms/step",
          flush=True)
    for mod in (direct, system):
        mod.solve_dense_schur = orig_solve


if __name__ == "__main__":
    main()
