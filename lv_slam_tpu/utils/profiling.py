"""Profiling helpers (the reference's printf timing, plus real traces).

The reference prints per-scan wall time and running means
(`scan_matching_odom_nodelet.cpp:252-258`) and chi2/time per optimization
(`graph_slam.cpp:318-328`). Equivalents here: `OdometryStats`,
`OptimizeResult.chi2_before/after`, and this module's stage timer +
`jax.profiler` trace capture for the real thing.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimer:
    """Accumulating wall-clock timer per named stage.

    NOTE: through a remote-TPU link, JAX dispatch is asynchronous and
    `block_until_ready` may not block; wall times here measure *host*
    occupancy unless the stage ends with a device fetch.
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:30s} {tot:8.3f}s total  {tot / max(n,1) * 1000:8.2f}ms/call  x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lv_slam_trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
