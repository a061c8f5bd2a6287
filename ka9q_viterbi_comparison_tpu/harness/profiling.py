"""Profiling and tracing utilities.

The reference's observability is a chrono Timer and raw per-iteration ns
samples (ref: src/timer.h:6-21, src/main.cpp:99-108).  On TPU the equivalents
are wall-clock phase spans around ``block_until_ready`` (harness.bench) plus
XLA device profiles; this module wraps ``jax.profiler`` so a benchmark run
can drop a TensorBoard-compatible trace next to its JSON samples.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["device_trace", "Timer", "annotate"]


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace (view with TensorBoard's profile plugin
    or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Monotonic ns timer with the reference Timer's get_delta contract
    (ref: src/timer.h:15-20): construction starts it, get_delta returns the
    elapsed span."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter_ns()

    def get_delta_ns(self) -> int:
        return time.perf_counter_ns() - self._t0

    def get_delta_s(self) -> float:
        return self.get_delta_ns() * 1e-9
