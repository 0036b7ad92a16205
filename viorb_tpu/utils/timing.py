"""Per-stage timing instrumentation.

Replaces the reference's `Timer` gettimeofday stopwatch
(`/root/reference/include/System.h:282-313`) and the `System::GetTimeOf*`
getters. The same stage taxonomy is kept (frame construction / track /
local-BA / loop), so the shutdown report matches the reference's mean-time
tree (`Examples/ROS/ORB_VIO/src/ros_vio.cc:242-249`).

Device-time caveat: JAX dispatch is async — a stage that ends without a
`block_until_ready` measures dispatch, not compute. `Stage` therefore takes
an optional pytree to block on at exit.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class StageTimes:
    """Accumulates wall-time samples per named stage."""

    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self.samples[name].append(seconds)

    def mean_ms(self, name: str) -> float:
        s = self.samples.get(name)
        return 1e3 * sum(s) / len(s) if s else 0.0

    def last_ms(self, name: str) -> float:
        s = self.samples.get(name)
        return 1e3 * s[-1] if s else 0.0

    def count(self, name: str) -> int:
        return len(self.samples.get(name, ()))

    def report(self) -> str:
        """Mean-time tree like the reference's shutdown dump."""
        lines = ["stage                      mean ms    n"]
        for name in sorted(self.samples):
            lines.append(f"{name:<26} {self.mean_ms(name):8.3f} {self.count(name):4d}")
        return "\n".join(lines)

    def reset(self):
        self.samples.clear()
