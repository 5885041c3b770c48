"""Observability: phase timers + optional jax.profiler traces.

The reference has no in-library tracing (SURVEY.md §5) — only the examples'
wall-clock prints.  Here every solve can be wrapped in a profiler span and
phase timings are recorded on the module-level collector for tooling.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_phase_totals: dict[str, float] = defaultdict(float)
_phase_counts: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    """Record wall-clock for a named phase (cumulative)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _phase_totals[name] += dt
        _phase_counts[name] += 1


def phase_report() -> dict[str, dict[str, float]]:
    return {
        k: {"total_s": _phase_totals[k], "count": _phase_counts[k]}
        for k in sorted(_phase_totals)
    }


def reset():
    _phase_totals.clear()
    _phase_counts.clear()


@contextlib.contextmanager
def device_trace(trace_dir: str | None = None):
    """jax.profiler trace around a region; set GF2BV_TPU_TRACE_DIR or pass
    trace_dir to enable, no-op otherwise."""
    trace_dir = trace_dir or os.environ.get("GF2BV_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
