"""Multi-agent simulation: many vehicles in one program (and across hosts).

The TPU-native redesign of the reference's SynChrono module
(/root/reference/src/chrono_synchrono: per-rank agents exchanging state as
flatbuffer messages over MPI/DDS at a heartbeat): on TPU, agent decomposition
IS batch decomposition — a fleet of vehicles is a ``vmap``-ed vehicle step in
one XLA program, so every agent sees every other agent's state with zero
messaging, every step (the heartbeat is the step).  Cross-host scenarios (e.g.
hardware-in-the-loop) use :class:`SocketSync`, the descendant of the
reference's TCP co-simulation sockets (utils/ChSocket).
"""

from __future__ import annotations

import json
import socket
import struct
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.vehicle.wheeled import WheeledVehicle, vehicle_step
from chrono_tpu.vehicle.driver import DriverInputs


@pytree_dataclass
class AgentFleet:
    """N identical vehicles with batched states (leading axis = agent)."""

    vehicle: WheeledVehicle       # shared parameters (unbatched)
    states: object                # BodyState with (N, nb, …) leaves

    @property
    def n_agents(self) -> int:
        return self.states.x.shape[0]


def make_fleet(vehicle: WheeledVehicle, base_state, positions) -> AgentFleet:
    """Clone one vehicle at several spawn positions → a fleet."""
    positions = np.asarray(positions, np.float32)

    def place(state, offset):
        return state.replace(x=state.x + jnp.asarray(offset)[None, :])

    states = jax.vmap(place, in_axes=(None, 0))(base_state,
                                                jnp.asarray(positions))
    return AgentFleet(vehicle=vehicle, states=states)


def fleet_step(fleet: AgentFleet, inputs: DriverInputs, terrain_height_fn,
               t, h, settings=None):
    """Advance all agents one step (vmapped single-agent step).

    ``inputs`` fields are (N,) arrays — per-agent driver commands.
    Returns (new_fleet, chassis positions (N,3)) — the "state exchange" is
    just reading the returned array.
    """
    from chrono_tpu.physics.system import SolverSettings

    if settings is None:
        settings = SolverSettings(solver="direct")

    def one(state, steer, thr, brk):
        out = vehicle_step(
            fleet.vehicle, state,
            DriverInputs(steering=steer, throttle=thr, braking=brk),
            terrain_height_fn, t, h, settings)
        return out.state

    new_states = jax.vmap(one)(fleet.states, inputs.steering,
                               inputs.throttle, inputs.braking)
    chassis_x = new_states.x[:, fleet.vehicle.chassis]
    return fleet.replace(states=new_states), chassis_x


class SocketSync:
    """Length-prefixed JSON state exchange over TCP (host-level co-sim).

    Replaces the reference's ChSocketCommunication for out-of-process agents:
    each side calls ``exchange(my_state_dict)`` per heartbeat and receives the
    peer's dict; either side may be a non-chrono_tpu simulator.
    """

    def __init__(self, host="127.0.0.1", port=50007, server=False,
                 timeout=30.0):
        self.server = server
        if server:
            self._listener = socket.socket()
            self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._listener.bind((host, port))
            self._listener.listen(1)
            self._listener.settimeout(timeout)
            self.sock, _ = self._listener.accept()
        else:
            self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.settimeout(timeout)

    def _send(self, obj):
        data = json.dumps(obj).encode()
        self.sock.sendall(struct.pack(">I", len(data)) + data)

    def _recv(self):
        hdr = b""
        while len(hdr) < 4:
            hdr += self.sock.recv(4 - len(hdr))
        (n,) = struct.unpack(">I", hdr)
        buf = b""
        while len(buf) < n:
            buf += self.sock.recv(min(65536, n - len(buf)))
        return json.loads(buf.decode())

    def exchange(self, state: dict) -> dict:
        """Symmetric heartbeat: send mine, receive theirs (server sends
        first to avoid deadlock)."""
        if self.server:
            self._send(state)
            return self._recv()
        other = self._recv()
        self._send(state)
        return other

    def close(self):
        self.sock.close()
        if self.server:
            self._listener.close()


# ---------------- SCM terrain patch synchronization ----------------
#
# Role of the reference's SynSCMTerrainAgent
# (/root/reference/src/chrono_synchrono/agent/SynSCMTerrainAgent.cpp): each
# rank simulates its own vehicles on a SHARED deformable terrain; at every
# heartbeat the accumulated plastic-sinkage deltas are exchanged and merged
# so every rank sees the ruts carved by every other vehicle.  Merging takes
# the element-wise MAXIMUM of plastic sinkage — soil does not heal, and max
# is associative/commutative/idempotent, so patch merging is
# order-independent exactly like the reference's diff application.

def scm_patch_diff(state, baseline):
    """Sparse update vs the last heartbeat: (flat indices, sinkage values)
    of nodes whose plastic sinkage deepened."""
    import numpy as np

    cur = np.asarray(state.sinkage)
    base = np.asarray(baseline)
    changed = np.nonzero((cur > base + 1e-9).ravel())[0]
    return changed.tolist(), cur.ravel()[changed].tolist()


def scm_patch_merge(state, diffs):
    """Apply heartbeat diffs from other agents: max-merge plastic sinkage
    and recompute the eroded surface height."""
    import numpy as np
    import jax.numpy as jnp

    sink = np.asarray(state.sinkage).copy()
    flat = sink.ravel()
    for idx, vals in diffs:
        idx = np.asarray(idx, int)
        if idx.size:
            flat[idx] = np.maximum(flat[idx], np.asarray(vals))
    sink = flat.reshape(sink.shape)
    return state.replace(sinkage=jnp.asarray(sink, state.z0.dtype))


def sync_scm_over_socket(sock: "SocketSync", state, baseline):
    """One heartbeat: send my diff, receive the peer's, merge both ways.
    Returns (merged state, new baseline array)."""
    import numpy as np

    idx, vals = scm_patch_diff(state, baseline)
    reply = sock.exchange({"scm_idx": idx, "scm_vals": vals})
    merged = scm_patch_merge(
        state, [(reply.get("scm_idx", []), reply.get("scm_vals", []))])
    return merged, np.asarray(merged.sinkage)
