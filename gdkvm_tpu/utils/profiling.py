"""Tracing / profiling utilities (SURVEY.md §5 tracing-profiling).

The reference has no model profiler (only Playwright CI traces); here every
train/eval step can be wrapped in jax.profiler annotations, and a run can
dump a Perfetto/TensorBoard trace directory with
``runtime.profile: true`` (viewed with tensorboard or ui.perfetto.dev).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    """Named region visible in the device trace (XLA op annotations)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into trace_dir when set; no-op otherwise."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    """Fetch-forced step timing with compile-step exclusion.

    Pass a (small) result array to lap(): it is fetched to host, which is
    the only reliable way to wait for execution on remote-dispatch
    platforms (block_until_ready can return at dispatch-ack).

    The first `skip` laps (compilation) are excluded from the average —
    the reference-shaped metrics log otherwise reports compile time as
    throughput (seen: 0.03 steps/s at step 1 vs ~25 steady-state).
    """

    def __init__(self, skip: int = 1):
        self.skip = skip
        self._laps = 0
        self._t0 = time.perf_counter()
        self._acc = 0.0
        self._count = 0

    def lap(self, result=None) -> Optional[float]:
        """Mark a step boundary; returns the lap seconds (None if skipped)."""
        if result is not None:
            jax.device_get(result)
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        self._laps += 1
        if self._laps <= self.skip:
            return None
        self._acc += dt
        self._count += 1
        return dt

    def stats(self) -> Dict[str, float]:
        if not self._count:
            # Degenerate window (all laps were compile-skipped): report
            # nothing rather than 0.0 / Infinity — `Infinity` is not valid
            # JSON and poisons the metrics log.
            return {}
        sec = self._acc / self._count
        return {"steps_per_sec": 1.0 / sec, "sec_per_step": sec}

    def reset_window(self) -> None:
        self._acc = 0.0
        self._count = 0
        self._t0 = time.perf_counter()
