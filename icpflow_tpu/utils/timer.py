"""Section timers + jax profiler helpers.

TPU-native replacement for the reference's wall-clock context timer
(`utils_timer.py:22-69`) and CUDA-event timer (`hist_cuda/timer.py:10-86`):
a device-synchronising section timer and a thin wrapper over
``jax.profiler`` traces for real kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class SectionTimer:
    """Accumulating named-section timer with device sync at boundaries."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:30s} {t:8.3f}s  ({c} calls, "
                         f"{1000.0 * t / max(c, 1):8.2f} ms/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """``jax.profiler`` trace region; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
