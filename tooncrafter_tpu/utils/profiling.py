"""Tracing / profiling surface.

The reference's observability is a per-epoch wall/memory print
(main/callbacks.py:104-133) and total-time prints (inference.py:322,344).
Here profiling is first-class (SURVEY.md §5): per-phase timers around
encode / denoise / decode, device memory snapshots, and jax.profiler traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict


class PhaseTimer:
    """Accumulates wall-time per named phase; blocks on device results so
    the numbers mean device time, not dispatch time."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        import jax

        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, fn, *args, **kwargs):
        import jax

        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_s": round(v / self.counts[k], 4)}
            for k, v in self.totals.items()
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context -> TensorBoard/Perfetto viewable."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside jitted code (shows up in profiler traces)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def memory_snapshot() -> Dict[str, float]:
    import jax

    out = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[f"device{i}_bytes_in_use"] = float(stats.get("bytes_in_use", 0))
        out[f"device{i}_peak_bytes"] = float(
            stats.get("peak_bytes_in_use", 0))
    return out
