"""Profiling & tracing helpers.

The reference's observability is spdlog stopwatches around solves and
pipeline stages plus PerfInfo CSV rows (SURVEY.md §5). The TPU-era
equivalents here: a stage-timing context manager that accumulates a report,
and a thin wrapper over ``jax.profiler`` for device traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

from .log import create_logger

_logger = create_logger("utils.profiling")


class StageTimer:
    """Accumulate named stage wall times; ``report()`` renders a summary.

    Stages may be appended from worker threads (the overlapped big-scene
    schedule runs angle uploads / partition / TIFF writes concurrently with
    device stages); ``list.append`` is GIL-atomic so the record is safe, but
    ``report()`` sums raw wall times — concurrent stages DOUBLE-COUNT in the
    total and the percentages, so the report is per-stage attribution, not
    an end-to-end wall-clock breakdown. Overlapped stages are named as such
    ("... (overlapped)" / "... (wait)") by their call sites.
    """

    def __init__(self):
        self.stages: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages.append((name, dt))
            _logger.debug("%s: %.3fs", name, dt)

    def report(self) -> str:
        total = sum(t for _, t in self.stages)
        lines = [f"{name}: {t:.3f}s ({100 * t / total:.1f}%)" for name, t in self.stages]
        lines.append(f"total: {total:.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Path | str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in device traces (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
