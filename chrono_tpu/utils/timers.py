"""Phase timers, RTF tracking and a hierarchical profiler.

Counterparts of the reference's step timers + ``CH_PROFILE``
(/root/reference/src/chrono/physics/ChSystem.h:505-535 GetTimer*;
utils/ChProfiler.h:133-148 hierarchical sampling profiler): host-side wall
timers around device calls (with ``block_until_ready`` so async dispatch
doesn't lie), a real-time-factor accumulator, and hooks into the JAX profiler
for on-device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimers:
    """Named accumulating wall timers + RTF (the ChSystem timer surface)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.sim_time = 0.0
        self.wall_time = 0.0

    @contextlib.contextmanager
    def phase(self, name: str, sync_result=None):
        t0 = time.perf_counter()
        yield
        if sync_result is not None:
            jax.block_until_ready(sync_result)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def add_sim_time(self, dt: float, wall: float):
        self.sim_time += dt
        self.wall_time += wall

    @property
    def rtf(self) -> float:
        """Real-time factor: wall seconds per simulated second
        (ChSystem.cpp:1668)."""
        return self.wall_time / self.sim_time if self.sim_time > 0 else 0.0

    def report(self) -> str:
        lines = [f"{'phase':<24}{'total[s]':>10}{'calls':>8}{'mean[ms]':>10}"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<24}{t:>10.3f}{c:>8}{1e3 * t / c:>10.3f}")
        if self.sim_time > 0:
            lines.append(f"RTF = {self.rtf:.2f} (wall/sim)")
        return "\n".join(lines)


class Profiler:
    """Hierarchical scoped profiler (CH_PROFILE analogue).

    Usage::

        prof = Profiler()
        with prof("advance"):
            with prof("collision"):
                ...
        print(prof.report())
    """

    def __init__(self):
        self.stack = []
        self.nodes = defaultdict(lambda: [0.0, 0])  # path -> [total, count]

    @contextlib.contextmanager
    def __call__(self, name: str):
        self.stack.append(name)
        path = "/".join(self.stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            node = self.nodes[path]
            node[0] += dt
            node[1] += 1
            self.stack.pop()

    def report(self) -> str:
        lines = []
        for path in sorted(self.nodes):
            total, count = self.nodes[path]
            depth = path.count("/")
            name = path.split("/")[-1]
            lines.append(f"{'  ' * depth}{name:<{30 - 2 * depth}}"
                         f"{total:>10.4f}s {count:>7}x")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """On-device profiling via the JAX profiler (TensorBoard trace)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
