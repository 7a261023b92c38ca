"""Two-PROCESS co-simulation (MBS node + SCM terrain node over TCP):
reproduces the fused single-process trajectory — the reference's MPI co-sim
contract (ChVehicleCosimBaseNode Synchronize/Advance) without MPI."""

import subprocess
import sys
import time

import numpy as np
import pytest
import jax.numpy as jnp

PORT = 50231
N_STEPS = 60
H = 2e-3

TERRAIN_SCRIPT = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from chrono_tpu.vehicle import SCMParams, make_scm_state
from chrono_tpu.synchro.cosim import run_terrain_node_scm

scm_p = SCMParams(Kphi=jnp.asarray(2e6), n_exp=jnp.asarray(1.0),
                  friction_angle=jnp.asarray(0.8), janosi_k=jnp.asarray(0.01))
scm = make_scm_state((-1, -1), (4, 1), 0.05)
run_terrain_node_scm({PORT}, scm_p, scm, wheel_radius=0.25,
                     wheel_width=0.2, n_steps={N_STEPS})
print("terrain node done")
"""


def test_two_process_cosim_matches_fused():
    from chrono_tpu.models import create_rover, set_wheel_speeds, \
        rover_step_scm
    from chrono_tpu.vehicle import SCMParams, make_scm_state
    from chrono_tpu.synchro.cosim import MBSCosimNode

    scm_p = SCMParams(Kphi=jnp.asarray(2e6), n_exp=jnp.asarray(1.0),
                      friction_angle=jnp.asarray(0.8),
                      janosi_k=jnp.asarray(0.01))

    # fused single-process reference
    rover, state0 = create_rover()
    rover = set_wheel_speeds(rover, [4.0] * 4)
    scm = make_scm_state((-1, -1), (4, 1), 0.05)
    import jax

    @jax.jit
    def fused(st, scm, t):
        return rover_step_scm(rover, st, scm_p, scm, t, H)

    st = state0
    t = 0.0
    for _ in range(N_STEPS):
        st, scm, _ = fused(st, scm, t)
        t += H
    x_fused = np.asarray(st.x)

    # co-sim split: terrain in a separate OS process
    proc = subprocess.Popen([sys.executable, "-c", TERRAIN_SCRIPT],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        time.sleep(1.0)                    # let the server bind
        node = None
        for _ in range(30):                # retry until the listener is up
            try:
                node = MBSCosimNode(rover, state0, PORT)
                break
            except OSError:
                time.sleep(0.5)
        assert node is not None, "could not connect to the terrain node"
        t = 0.0
        for _ in range(N_STEPS):
            st_c, _ = node.step(t, H)
            t += H
        node.close()
        out, _ = proc.communicate(timeout=60)
        assert "terrain node done" in out, out[-500:]
    finally:
        if proc.poll() is None:
            proc.kill()

    x_cosim = np.asarray(st_c.x)
    # same data flow, same math → trajectories agree to float round-off
    np.testing.assert_allclose(x_cosim, x_fused, atol=1e-4)
    assert x_cosim[rover.chassis, 0] > 0.02     # actually drove forward
