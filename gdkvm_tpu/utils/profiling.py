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
    """Window-granular, fetch-forced step timing with compile exclusion.

    Per-step host synchronization is poison on remote-dispatch platforms:
    fetching the loss every step costs a full round trip per step and
    serializes the pipeline (measured: a 36 ms device step ran at 134 ms
    end-to-end with a per-step fetch — the fetch, not compute, set the
    pace).  So laps are free (just counters); execution is forced only at
    window boundaries — ``stats()`` is called right after the caller
    fetches its (small) metrics for logging, which transitively waits for
    every step dispatched in the window.  Window seconds / window laps is
    then true pipelined throughput, with one round trip amortized over the
    whole window.

    The first ``skip`` laps (compilation) ARE fetched, then excluded by
    restarting the window clock — otherwise the first window reports
    compile time as throughput (seen: 0.03 steps/s at step 1 vs ~25
    steady-state).
    """

    def __init__(self, skip: int = 1):
        self.skip = skip
        self._laps = 0
        self._window_laps = 0
        self._t0 = time.perf_counter()

    def lap(self, result=None) -> None:
        """Mark a step boundary.  ``result`` is fetched ONLY during the
        first ``skip`` (compile) laps, to absorb compilation into the
        excluded region; afterwards it is ignored — no per-step sync."""
        self._laps += 1
        if self._laps <= self.skip:
            if result is not None:
                jax.device_get(result)
            self._t0 = time.perf_counter()
            return
        self._window_laps += 1

    def stats(self) -> Dict[str, float]:
        """Window throughput.  Call immediately AFTER fetching step results
        (e.g. jax.device_get(metrics)) so the window is execution-forced."""
        if not self._window_laps:
            # Degenerate window (all laps were compile-skipped): report
            # nothing rather than 0.0 / Infinity — `Infinity` is not valid
            # JSON and poisons the metrics log.
            return {}
        sec = (time.perf_counter() - self._t0) / self._window_laps
        return {"steps_per_sec": 1.0 / sec, "sec_per_step": sec}

    def reset_window(self) -> None:
        self._window_laps = 0
        self._t0 = time.perf_counter()
