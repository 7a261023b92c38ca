"""6-dof industrial arm pick-and-place: an operation-space trajectory is
inverse-kinematics-sampled into joint programs driving the MBS arm; writes
the commanded and simulated TCP paths as CSV (the reference's
demo_ROBOT_Industrial role)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from chrono_tpu.core import quaternion as Q
from chrono_tpu.models.industrial import (
    Arm6R, fk_6r, make_trajectory, traj_eval, create_arm_6dof,
    joint_programs_from_trajectory,
)
from chrono_tpu.physics.system import (
    SolverSettings, step_euler_implicit_linearized,
)
from chrono_tpu.io import CSVWriter


def main(T=1.5, h=2e-3):
    arm = Arm6R.make(H=0.4, L1=0.6, L2=0.5, L3=0.15)
    # three waypoints: reach out, swing across, set down
    qs = [jnp.asarray(q, jnp.float32) for q in (
        [0.0, 0.3, 1.0, 0.0, 0.7, 0.0],
        [0.9, 0.5, 1.3, 0.3, 0.9, -0.4],
        [1.4, 0.7, 1.6, 0.0, 0.9, 0.0])]
    poses = [fk_6r(arm, q) for q in qs]
    traj = make_trajectory(jnp.stack([p for p, _ in poses]),
                           jnp.stack([r for _, r in poses]),
                           total_time=T, law="poly345")
    progs = joint_programs_from_trajectory(arm, traj, n_samples=49)
    model, state, tool, tool_off = create_arm_6dof(arm, progs)
    settings = SolverSettings(solver="direct")
    step = jax.jit(lambda s, t: step_euler_implicit_linearized(
        model, s, t, h, settings)[0])

    out = CSVWriter(os.path.join(os.path.dirname(__file__), "out",
                                 "arm_tcp.csv"),
                    ["t", "x", "y", "z", "x_cmd", "y_cmd", "z_cmd"])
    # settle onto the start pose, then run the program
    for _ in range(200):
        state = step(state, 0.0)
    t = 0.0
    for i in range(int(T / h)):
        state = step(state, t)
        t += h
        if i % 10 == 0:
            p = np.asarray(state.x[tool]
                           + Q.qrotate(state.q[tool], tool_off))
            pc, _ = traj_eval(traj, jnp.asarray(t))
            out.append(*[t, *p, *np.asarray(pc)])
    out.write()
    p = np.asarray(state.x[tool] + Q.qrotate(state.q[tool], tool_off))
    pc, _ = traj_eval(traj, jnp.asarray(T))
    err = np.linalg.norm(p - np.asarray(pc))
    print(f"TCP at {np.round(p, 4)}, commanded {np.round(np.asarray(pc), 4)}"
          f", tracking error {err * 1000:.1f} mm")


if __name__ == "__main__":
    main()
