"""Tracing / profiling (SURVEY §5: replaces e2vid/utils/timers.py and adds
what the reference lacks — device traces).

- :class:`Timer`        — accumulating section timer (cuda_timers analog);
  ``timer_summary()`` prints mean/total per section.
- :func:`trace`         — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace.
- :class:`StepTimer`    — rolling steps/sec with forced device sync via a
  scalar fetch (block_until_ready does not block through the axon relay).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

_timers: Dict[str, List[float]] = defaultdict(list)


class Timer:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        _timers[self.name].append(time.perf_counter() - self.t0)
        return False


def timer_summary() -> Dict[str, dict]:
    out = {}
    for name, vals in _timers.items():
        out[name] = {
            "calls": len(vals),
            "total_s": sum(vals),
            "mean_ms": 1e3 * sum(vals) / len(vals),
        }
    return out


def reset_timers():
    _timers.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (view with TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 50):
        self.window = window
        self._times: List[float] = []
        self._last = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return self.steps_per_sec()

    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)
