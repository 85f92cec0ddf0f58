"""Profiling / tracing hooks.

The reference ships no tracing (SURVEY.md §5); this build adds:
  * ``trace(log_dir)`` — context manager around jax.profiler for device
    traces viewable in TensorBoard/Perfetto
  * ``stage_timer`` — lightweight wall-clock stage timing with a report,
    for host-side pipeline stages (parse, pack, DFS)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace under log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock time per named stage."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage timings:"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"  {name}: {total:.3f}s total, {total / n * 1e3:.1f} ms/call ({n} calls)")
        return "\n".join(lines)
