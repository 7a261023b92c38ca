"""Multi-agent fleet (vmapped agents) + socket co-sim heartbeat tests."""

import threading

import numpy as np
import jax
import jax.numpy as jnp
import functools

from chrono_tpu.synchro import make_fleet, fleet_step, SocketSync
from chrono_tpu.vehicle import build_wheeled_vehicle, flat_terrain, DriverInputs


class TestFleet:
    def test_four_vehicles_diverge(self):
        vehicle, state = build_wheeled_vehicle()
        fleet = make_fleet(vehicle, state,
                           positions=[[0, 0, 0], [0, 6, 0],
                                      [0, 12, 0], [0, 18, 0]])
        assert fleet.n_agents == 4
        terrain = flat_terrain(0.0)
        h = 1e-3
        # different throttle per agent
        inputs = DriverInputs(
            steering=jnp.asarray([0.0, 0.0, 0.1, -0.1]),
            throttle=jnp.asarray([0.3, 0.6, 0.4, 0.4]),
            braking=jnp.zeros(4))

        @functools.partial(jax.jit, static_argnums=1)
        def run(fleet, n):
            def body(carry, k):
                fl, t = carry
                fl, xs = fleet_step(fl, inputs, terrain, t, h)
                return (fl, t + h), None
            (fl, _), _ = jax.lax.scan(body, (fleet, jnp.asarray(0.0)),
                                      jnp.arange(n))
            return fl

        fleet = run(fleet, 2500)
        x = np.asarray(fleet.states.x[:, vehicle.chassis])
        # agent 1 (more throttle) ahead of agent 0
        assert x[1, 0] > x[0, 0] + 1.0
        # steered agents drifted laterally in opposite directions
        assert (x[2, 1] - 12) > 0.2 and (x[3, 1] - 18) < -0.2
        # all moved forward
        assert (x[:, 0] > 2.0).all()


class TestSocketSync:
    def test_heartbeat_roundtrip(self):
        result = {}

        def server():
            s = SocketSync(port=50917, server=True)
            other = s.exchange({"agent": "A", "pos": [1, 2, 3]})
            result["server_got"] = other
            s.close()

        th = threading.Thread(target=server)
        th.start()
        import time
        time.sleep(0.2)
        c = SocketSync(port=50917, server=False)
        got = c.exchange({"agent": "B", "pos": [4, 5, 6]})
        c.close()
        th.join()
        assert got["agent"] == "A"
        assert result["server_got"]["pos"] == [4, 5, 6]
