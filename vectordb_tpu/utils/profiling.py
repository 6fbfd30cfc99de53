"""Tracing / profiling hooks.

The reference's observability is wall-clock timing feeding MetricsCollector
(src/server/routes.rs:242-271). On TPU the interesting half lives on the
device, so this module adds jax.profiler integration:

  * ``trace(logdir)`` — capture a device trace (view with TensorBoard /
    xprof) around any block
  * ``annotate(name)`` — named TraceAnnotation so store/index phases show
    up inside the device trace
  * ``timed()`` — wall-clock timing helper that blocks on device results,
    so recorded latencies include real device time (async dispatch
    otherwise under-reports)
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in device traces."""
    return jax.profiler.TraceAnnotation(name)


class timed:
    """Context manager measuring wall-clock seconds, blocking on a device
    value if one is registered via ``block_on``."""

    def __init__(self):
        self.seconds = 0.0
        self._block = None

    def block_on(self, value):
        self._block = value
        return value

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._block is not None:
            jax.block_until_ready(self._block)
        self.seconds = time.perf_counter() - self._start
        return False


__all__ = ["trace", "annotate", "timed"]
