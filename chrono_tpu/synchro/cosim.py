"""Out-of-process co-simulation nodes (MBS ↔ terrain).

Role of the reference's MPI co-simulation framework
(/root/reference/src/chrono_vehicle/cosim/ChVehicleCosimBaseNode.h:183-196 —
per co-sim step every node Synchronize()s by point-to-point state/force
exchange, then Advance()s its own solver; node types MBS / tire / terrain)
rebuilt on the TCP heartbeat (synchro.agents.SocketSync) instead of MPI:
each node is an ordinary OS process, so a terrain server can run on another
host (the DCN story) or next to a non-chrono_tpu simulator.

Protocol per step (terrain = server, sends first on the wire):
  MBS → terrain : {"t", "wheels": {"x","q","v","w"}}        (lists)
  terrain → MBS : {"force": (W,3), "torque_spin": (W,)}
matching the fused in-process data flow of ``rover_step_scm`` exactly, so a
co-simulated run reproduces the single-process trajectory to JSON float
round-off.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from chrono_tpu.synchro.agents import SocketSync


def run_terrain_node_scm(port, scm_params, scm_state, wheel_radius,
                         wheel_width, n_steps, host="127.0.0.1",
                         timeout=600.0):
    """Serve an SCM terrain node for ``n_steps`` co-sim steps (blocking).

    The terrain owns the soil state (the reference's
    ChVehicleCosimTerrainNode role): it receives wheel kinematics, returns
    per-wheel forces/spin torques, and keeps the plastic sinkage."""
    from chrono_tpu.vehicle.terrain import scm_wheel_forces

    @jax.jit
    def _forces(state, x, q, v, w):
        return scm_wheel_forces(scm_params, state, x, q, v, w,
                                wheel_radius=jnp.asarray(wheel_radius),
                                wheel_width=jnp.asarray(wheel_width))

    sync = SocketSync(host=host, port=port, server=True,
                      timeout=timeout)
    state = scm_state
    try:
        for _ in range(n_steps):
            msg = sync.exchange({"ready": True})
            w = msg["wheels"]
            out = _forces(
                state,
                jnp.asarray(w["x"], jnp.float32),
                jnp.asarray(w["q"], jnp.float32),
                jnp.asarray(w["v"], jnp.float32),
                jnp.asarray(w["w"], jnp.float32))
            state = out.new_state
            sync.exchange({
                "force": np.asarray(out.force).tolist(),
                "torque_spin": np.asarray(out.torque_spin).tolist(),
            })
    finally:
        sync.close()
    return state


class MBSCosimNode:
    """MBS side of the co-sim split (ChVehicleCosimWheeledMBSNode role):
    steps a rover/vehicle model with wheel forces served by a remote
    terrain node."""

    def __init__(self, rover, state, port, host="127.0.0.1", settings=None,
                 timeout=600.0):
        from chrono_tpu.physics.system import SolverSettings

        self.rover = rover
        self.state = state
        self.settings = settings or SolverSettings(solver="direct")
        self.sync = SocketSync(host=host, port=port, server=False,
                               timeout=timeout)
        self._w_idx = jnp.asarray(rover.wheels, jnp.int32)

        from chrono_tpu.physics.system import step_euler_implicit_linearized

        @jax.jit
        def _step(st, t, h, f_ext, tau_ext):
            return step_euler_implicit_linearized(
                self.rover.model, st, t, h, self.settings,
                f_ext=f_ext, tau_ext=tau_ext)

        self._step = _step

    def step(self, t, h):
        st = self.state
        w = self._w_idx
        self.sync.exchange({"t": t, "wheels": {
            "x": np.asarray(st.x[w]).tolist(),
            "q": np.asarray(st.q[w]).tolist(),
            "v": np.asarray(st.v[w]).tolist(),
            "w": np.asarray(st.w[w]).tolist(),
        }})
        rsp = self.sync.exchange({"ready": True})
        force = jnp.asarray(rsp["force"], jnp.float32)
        tq = jnp.asarray(rsp["torque_spin"], jnp.float32)
        n = self.rover.model.n_bodies
        f_ext = jnp.zeros((n, 3), st.x.dtype).at[w].add(force)
        tau_ext = jnp.zeros((n, 3), st.x.dtype).at[w].add(
            tq[:, None] * jnp.asarray([0.0, 1.0, 0.0]))
        self.state, info = self._step(st, jnp.asarray(t), jnp.asarray(h),
                                      f_ext, tau_ext)
        return self.state, info

    def close(self):
        self.sync.close()
