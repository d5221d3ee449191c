"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock around generation
(``/root/reference/gen_utils.py:294,326``). Here:

  - ``stage_timer``: named wall-clock stages accumulated into a report
    (build / compile / run / decode).
  - ``trace``: context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace of the XLA program (device timeline, HLO
    op breakdown) — ``CONZIC_TRACE_DIR`` or explicit path enables it.
  - ``annotate``: ``jax.profiler.TraceAnnotation`` wrapper so host-side
    stages show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimers:
    """Accumulating named wall-clock timers."""

    def __init__(self) -> None:
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
        lines = ["stage timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"  {name}: {self.totals[name]:.3f}s over {self.counts[name]} call(s)"
            )
        return "\n".join(lines)


GLOBAL_TIMERS = StageTimers()


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace when a directory is configured."""
    trace_dir = trace_dir or os.environ.get("CONZIC_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    # only the profiler acquisition is guarded: wrapping the ``yield``
    # itself in try/except would catch exceptions THROWN INTO the
    # generator by the annotated body and yield a second time, which
    # contextlib reports as RuntimeError("generator didn't stop after
    # throw()") — masking the body's real exception
    try:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        yield
