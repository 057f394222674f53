"""Profiling / tracing utilities — first-class, per SURVEY.md §5.

The reference has no tracing at all (divan wall-clock benches + dbg!
prints only). Here: stage timers for pipeline cadence reports and a
context manager around jax.profiler for device traces readable in
TensorBoard/perfetto.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict
from typing import Dict, List


class StageTimes:
    """Accumulates wall-clock samples per named stage."""

    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)

    def add(self, stage: str, seconds: float):
        self._samples[stage].append(seconds)

    def values(self, stage: str) -> List[float]:
        """Raw samples for one stage ([] if never recorded)."""
        return list(self._samples.get(stage, []))

    @contextlib.contextmanager
    def measure(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(stage, time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for stage, xs in self._samples.items():
            out[stage] = {
                "count": len(xs),
                "mean_ms": 1e3 * statistics.fmean(xs),
                "median_ms": 1e3 * statistics.median(xs),
                "max_ms": 1e3 * max(xs),
                "total_s": sum(xs),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':20s} {'count':>6s} {'mean':>9s} {'median':>9s} "
                 f"{'max':>9s}"]
        for stage, s in sorted(self.summary().items()):
            lines.append(
                f"{stage:20s} {s['count']:6d} {s['mean_ms']:8.2f}m "
                f"{s['median_ms']:8.2f}m {s['max_ms']:8.2f}m")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace (xplane + trace.json.gz) under log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, iters: int = 20, warmup: int = 1) -> float:
    """Steady-state seconds/call of a jitted function (blocks on leaves)."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    return (time.perf_counter() - t0) / iters
