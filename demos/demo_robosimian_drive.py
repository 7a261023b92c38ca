"""RoboSimian driving on rigid ground: the reference's
demo_ROBOT_RoboSimian_Rigid scenario (driving mode — limbs hold the
recorded posture, wheels roll) through the NSC contact pipeline.  Writes
the chassis trajectory as CSV."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from chrono_tpu.models.robosimian import gait_programs, create_robosimian
from chrono_tpu.collision.pipeline import nsc_step
from chrono_tpu.physics.system import SolverSettings
from chrono_tpu.io import CSVWriter

ACT = "/root/reference/data/robot/robosimian/actuation/driving_cycle.txt"


def main(t_end=1.0, h=2e-3):
    progs, posture, _ = gait_programs(ACT)
    post = posture.reshape(4, 8).copy()
    speeds = 4.0 * post[:, 7]
    post[:, 7] = 0.0
    model, state, coll, chassis, wheels = create_robosimian(
        post.reshape(-1), speeds)
    settings = SolverSettings(solver="apgd", max_iter=60, stab_factor=0.2)
    step = jax.jit(lambda s, t: nsc_step(model, coll, s, t, h, settings))

    out = CSVWriter(os.path.join(os.path.dirname(__file__), "out",
                                 "robosimian_chassis.csv"),
                    ["t", "x", "y", "z"])
    t = 0.0
    for i in range(int(t_end / h)):
        state, _, _ = step(state, t)
        t += h
        if i % 25 == 0:
            x = np.asarray(state.x[chassis])
            out.append(*[t, x[0], x[1], x[2]])
    out.write()
    x = np.asarray(state.x[chassis])
    print(f"t={t:.2f}s chassis at {np.round(x, 3)} "
          f"(advanced {x[0]:.3f} m)")


if __name__ == "__main__":
    main()
