"""Profiling / tracing utilities.

The reference's observability is wall-clock timers only
(reference: util/misc.py:545-562 measure_time,
util/misc.py:132-176 MetricLogger iter/data times). On TPU we add real
tracing: jax.profiler traces viewable in TensorBoard/Perfetto, plus
per-phase timers that match the reference's reported fields
("Mean load time" / "Mean infer time" / "Mean overall time",
reference: FSC_test_cross(few-shot).py:429-434).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace for the enclosed region; no-op when
    log_dir is falsy. View with TensorBoard's profile plugin."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimers:
    """Accumulate wall-clock per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def means(self) -> Dict[str, float]:
        return {
            f"Mean {k} time": self.totals[k] / max(self.counts[k], 1)
            for k in self.totals
        }


def annotate(name: str):
    """jax.profiler.TraceAnnotation wrapper for labeling trace spans."""
    import jax

    return jax.profiler.TraceAnnotation(name)
