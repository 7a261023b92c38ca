"""ROS bridge role (synchro/ros.py): rate-scheduled handlers over
JSON-lines TCP, mirroring /root/reference/src/chrono_ros handlers."""

import time
from types import SimpleNamespace

import numpy as np
import pytest

from chrono_tpu.synchro import ros


def _state(n=2):
    return SimpleNamespace(
        x=np.arange(n * 3, dtype=float).reshape(n, 3),
        q=np.tile(np.array([1.0, 0, 0, 0]), (n, 1)),
        v=np.ones((n, 3)), w=np.zeros((n, 3)))


@pytest.mark.smoke
def test_publish_and_subscribe_roundtrip():
    bridge = ros.RosBridge()
    try:
        mgr = ros.RosManager(bridge)
        mgr.register_handler(ros.clock_handler())
        mgr.register_handler(ros.body_handler(1))
        mgr.register_handler(ros.tf_handler({"chassis": 0, "wheel": 1}))
        sub = ros.DriverInputsSubscriber()
        mgr.register_subscriber(sub)

        s, read_messages, publish = ros.connect_client(bridge.port)
        time.sleep(0.3)                      # accept loop picks the client up

        st = _state()
        mgr.update(0.0, st)
        msgs = read_messages(n=3, deadline=5.0)
        topics = {m["topic"] for m in msgs}
        assert {"/clock", "/bodies/1/state", "/tf"} <= topics
        body = next(m for m in msgs if m["topic"] == "/bodies/1/state")
        assert body["msg"]["pos"] == [3.0, 4.0, 5.0]
        tf = next(m for m in msgs if m["topic"] == "/tf")
        names = {tr["child_frame_id"] for tr in tf["msg"]["transforms"]}
        assert names == {"chassis", "wheel"}

        # inbound driver inputs (ChROSDriverInputsHandler role)
        publish("/driver_inputs", {"steering": -0.25, "throttle": 0.8})
        deadline = time.time() + 5.0
        while sub.throttle == 0.0 and time.time() < deadline:
            time.sleep(0.05)
            mgr.update(0.01, st)
        assert sub.steering == pytest.approx(-0.25)
        assert sub.throttle == pytest.approx(0.8)
        s.close()
    finally:
        bridge.close()


def test_handler_rate_scheduling():
    bridge = ros.RosBridge()
    try:
        mgr = ros.RosManager(bridge)
        mgr.register_handler(ros.Handler("/slow", 10.0,
                                         lambda t, s: {"t": t}))
        s, read_messages, _ = ros.connect_client(bridge.port)
        time.sleep(0.3)
        st = _state()
        for k in range(21):                   # t = 0 .. 0.20 s at 1 kHz sim
            mgr.update(k * 0.01, st)
        msgs = read_messages(n=10, deadline=3.0)
        ours = [m for m in msgs if m["topic"] == "/slow"]
        # 10 Hz over 0.20 s -> 3 messages (t = 0, 0.1, 0.2)
        assert len(ours) == 3
        s.close()
    finally:
        bridge.close()
