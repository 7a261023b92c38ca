"""ROS bridge role: rate-scheduled topic handlers over JSON-lines TCP.

Counterpart of the reference's chrono_ros module
(/root/reference/src/chrono_ros/ChROSManager.h — rate-scheduled handlers
publishing through an out-of-process interface;
handlers/ChROSClockHandler.h, handlers/ChROSBodyHandler.h,
handlers/ChROSTFHandler.h, handlers/vehicle/ChROSDriverInputsHandler.h,
handlers/sensor/*).

TPU hosts have no ROS 2 distribution, so the transport is the same role
the reference's own IPC mode plays (ChROSManager runs rclcpp in a
SUBPROCESS and ships handler payloads over IPC): newline-delimited JSON
messages over TCP.  A thin rclpy republisher on any ROS machine can turn
these into real ROS topics 1:1 — topic names and payload fields mirror the
reference handlers, so downstream tooling sees the same surface.

Design: handlers are pure "extract a dict from (time, state)" callables
scheduled at per-handler rates by :class:`RosManager.update` — simulation
state never blocks on the socket (non-blocking sends, best-effort drop on
slow clients, exactly the reference's QoS-by-default behavior).
"""

from __future__ import annotations

import json
import socket
import threading
import time as _time
from typing import Callable, NamedTuple

import numpy as np


def _jsonable(x):
    if isinstance(x, (np.ndarray, np.generic)):
        return np.asarray(x).tolist()
    if hasattr(x, "tolist"):      # jax arrays
        return np.asarray(x).tolist()
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    return x


class RosBridge:
    """JSON-lines TCP endpoint (the ChROSInterface role).

    Accepts any number of clients; :meth:`publish` broadcasts one message,
    :meth:`poll_inbound` drains messages clients sent (subscriptions)."""

    def __init__(self, host="127.0.0.1", port=0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self._clients: list[socket.socket] = []
        self._inbound: list[dict] = []
        self._lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._accept_loop,
                                        daemon=True)
        self._thread.start()

    def _accept_loop(self):
        self._srv.settimeout(0.1)
        bufs = {}
        while not self._stop:
            try:
                c, _ = self._srv.accept()
                c.setblocking(False)
                with self._lock:
                    self._clients.append(c)
                    bufs[c] = b""
            except socket.timeout:
                pass
            except OSError:
                return
            with self._lock:
                clients = list(self._clients)
            # prune receive buffers of dropped clients (long-running bridges
            # with client churn would otherwise accumulate them forever)
            live = set(clients)
            for dead in [c for c in bufs if c not in live]:
                bufs.pop(dead, None)
            for c in clients:
                try:
                    data = c.recv(65536)
                except (BlockingIOError, InterruptedError):
                    continue
                except OSError:
                    self._drop(c)
                    continue
                if not data:
                    continue
                bufs[c] = bufs.get(c, b"") + data
                while b"\n" in bufs[c]:
                    line, bufs[c] = bufs[c].split(b"\n", 1)
                    try:
                        msg = json.loads(line)
                    except ValueError:
                        continue
                    with self._lock:
                        self._inbound.append(msg)

    def _drop(self, c):
        with self._lock:
            if c in self._clients:
                self._clients.remove(c)
        try:
            c.close()
        except OSError:
            pass

    def publish(self, topic: str, t: float, msg: dict):
        line = (json.dumps({"topic": topic, "time": float(t),
                            "msg": _jsonable(msg)}) + "\n").encode()
        with self._lock:
            clients = list(self._clients)
        for c in clients:
            try:
                c.sendall(line)
            except (BlockingIOError, InterruptedError):
                # sendall on a non-blocking socket may have completed a
                # PARTIAL write before raising; a truncated JSON line would
                # permanently corrupt this client's newline framing. Drop
                # the slow client (consistent with best-effort QoS).
                self._drop(c)
            except OSError:
                self._drop(c)

    def poll_inbound(self) -> list[dict]:
        with self._lock:
            out, self._inbound = self._inbound, []
        return out

    def close(self):
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()


class Handler(NamedTuple):
    """One rate-scheduled publisher (ChROSHandler role)."""
    topic: str
    rate: float                                  # Hz; 0 = every update
    extract: Callable[[float, object], dict]     # (time, state) -> payload


def clock_handler(topic="/clock") -> Handler:
    """ChROSClockHandler: simulation time."""
    return Handler(topic, 0.0, lambda t, state: {"clock": float(t)})


def body_handler(body: int, topic=None) -> Handler:
    """ChROSBodyHandler: pose + twist + accel of one MBS body.  ``state``
    must expose x (N,3), q (N,4), v (N,3), w (N,3) (the MBS state layout)."""
    topic = topic or f"/bodies/{body}/state"

    def extract(t, state):
        out = {"pos": state.x[body], "quat": state.q[body],
               "lin_vel": state.v[body], "ang_vel": state.w[body]}
        if hasattr(state, "a"):
            out["lin_acc"] = state.a[body]
        return out

    return Handler(topic, 0.0, extract)


def tf_handler(bodies: dict, topic="/tf") -> Handler:
    """ChROSTFHandler: named frame tree from body poses."""

    def extract(t, state):
        return {"transforms": [
            {"child_frame_id": name,
             "translation": state.x[i], "rotation": state.q[i]}
            for name, i in bodies.items()]}

    return Handler(topic, 0.0, extract)


def vehicle_state_handler(topic="/vehicle/state") -> Handler:
    """vehicle/ChROSVehicleStateHandler role: chassis pose/speed from a
    WheeledVehicle state (chassis body 0)."""

    def extract(t, state):
        return {"pos": state.x[0], "quat": state.q[0],
                "lin_vel": state.v[0], "ang_vel": state.w[0],
                "speed": float(np.linalg.norm(np.asarray(state.v[0])))}

    return Handler(topic, 0.0, extract)


def imu_handler(imu, read_fn, topic="/imu/data") -> Handler:
    """sensor/ChROSIMUHandler role: wraps a sensors.IMUSensor read."""

    def extract(t, state):
        r = read_fn(t, state)
        return {"accel": r.accel, "gyro": r.gyro}

    return Handler(topic, 0.0, extract)


def gps_handler(read_fn, topic="/gps/data") -> Handler:
    """sensor/ChROSGPSHandler role."""

    def extract(t, state):
        r = read_fn(t, state)
        return {"lat": r.lat, "lon": r.lon, "alt": r.alt}

    return Handler(topic, 0.0, extract)


class DriverInputsSubscriber:
    """vehicle/ChROSDriverInputsHandler: steering/throttle/braking arrive
    FROM the bridge (a teleop or autonomy stack publishes them)."""

    def __init__(self, topic="/driver_inputs"):
        self.topic = topic
        self.steering = 0.0
        self.throttle = 0.0
        self.braking = 0.0

    def consume(self, msg: dict):
        m = msg.get("msg", msg)
        self.steering = float(m.get("steering", self.steering))
        self.throttle = float(m.get("throttle", self.throttle))
        self.braking = float(m.get("braking", self.braking))


class RosManager:
    """ChROSManager role: registered handlers tick at their own rates;
    inbound messages route to subscribers by topic."""

    def __init__(self, bridge: RosBridge):
        self.bridge = bridge
        self._handlers: list[Handler] = []
        self._last_pub: list[float] = []
        self._subs: dict[str, DriverInputsSubscriber] = {}

    def register_handler(self, h: Handler):
        self._handlers.append(h)
        self._last_pub.append(-np.inf)

    def register_subscriber(self, sub):
        self._subs[sub.topic] = sub

    def update(self, t: float, state) -> None:
        for msg in self.bridge.poll_inbound():
            sub = self._subs.get(msg.get("topic"))
            if sub is not None:
                sub.consume(msg)
        for k, h in enumerate(self._handlers):
            period = 0.0 if h.rate <= 0 else 1.0 / h.rate
            if t - self._last_pub[k] >= period - 1e-12:
                self.bridge.publish(h.topic, t, h.extract(t, state))
                self._last_pub[k] = t


def connect_client(port, host="127.0.0.1", timeout=5.0):
    """Test/teleop helper: returns (socket, read_messages_fn, publish_fn)."""
    s = socket.create_connection((host, port), timeout=timeout)
    s.settimeout(timeout)
    buf = [b""]

    def read_messages(n=1, deadline=5.0):
        msgs = []
        t0 = _time.time()
        while len(msgs) < n and _time.time() - t0 < deadline:
            try:
                data = s.recv(65536)
            except socket.timeout:
                continue
            if not data:
                break
            buf[0] += data
            while b"\n" in buf[0]:
                line, buf[0] = buf[0].split(b"\n", 1)
                if line.strip():
                    msgs.append(json.loads(line))
        return msgs

    def publish(topic, msg):
        s.sendall((json.dumps({"topic": topic, "msg": msg}) + "\n").encode())

    return s, read_messages, publish
